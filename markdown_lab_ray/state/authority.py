"""Host-authority crawl-budget weighting — the frontier feedback loop.

The north-star frontier is priority-ordered; this module closes the
loop: cross-host links observed in completed rounds build a host
graph, integer PageRank over it scores host authority, and hosts in
the top authority band earn a budget multiplier next round (crawl
deeper where the web itself points).  Everything here is PURE and
shared verbatim by the sequential oracle and the Ray engine — one
source of truth, like ``schedule_group`` (reference has no
counterpart; the priority-frontier idea generalizes
markdown_lab/core/scraper.py's sitemap-priority ordering).

Determinism contract: integer PageRank (the ``pagerank_integer``
arithmetic restated over string hosts), a deterministic edge cap
(lexicographic smallest-N), and an integer band rule — so both
engines derive identical budgets from identical fetch history.

Scale note: the edge set is O(distinct host pairs), capped at
``edge_cap`` and held driver-side (checkpointed per round for
resume).  At web scale swap the in-memory rank for the distributed
``crawl_host_rank`` pipeline and ship only the multiplier dict — the
band rule and budget math below stay unchanged.
"""

from __future__ import annotations

import numpy as np

from ..kernels.urls import get_domain_from_url


def extract_host_edges(page_host: str, link_urls) -> set:
    """Distinct cross-host (src, dst) edges a fetched page asserts."""
    out = set()
    for u in link_urls or ():
        if not isinstance(u, str) or not u.startswith(("http://",
                                                       "https://")):
            continue
        dst = get_domain_from_url(u)
        if dst and dst != page_host:
            out.add((page_host, dst))
    return out


def merge_edges(edges: set, new_edges: set, edge_cap: int) -> set:
    """Union with a DETERMINISTIC cap: past ``edge_cap`` keep the
    lexicographically smallest edges, so engine and oracle converge on
    the same capped graph regardless of discovery order."""
    edges = edges | new_edges
    if len(edges) > edge_cap:
        edges = set(sorted(edges)[:edge_cap])
    return edges


def local_pagerank_hosts(edges: set, n_iter: int = 2,
                         scale: int = 10 ** 6,
                         damping_pct: int = 85) -> dict:
    """Integer power-iteration PageRank over a host edge set — the
    exact ``pagerank_integer`` arithmetic (same floor divisions, same
    int64 sums; see stages/graph.py) on string nodes, single-process.
    Returns {host: rank_int}; empty edges → empty dict."""
    if not edges:
        return {}
    pairs = sorted(edges)
    src = np.array([a for a, _ in pairs])
    dst = np.array([b for _, b in pairs])
    nodes = np.unique(np.concatenate([src, dst]))
    si = np.searchsorted(nodes, src)
    di = np.searchsorted(nodes, dst)
    n = len(nodes)
    base = (scale * (100 - damping_pct)) // 100
    outdeg = np.zeros(n, np.int64)
    np.add.at(outdeg, si, 1)
    rank = np.full(n, scale, np.int64)
    for _ in range(n_iter):
        contrib = (rank[si] * damping_pct) // (100 * outdeg[si])
        inc = np.zeros(n, np.int64)
        np.add.at(inc, di, contrib)
        rank = base + inc
    return {str(h): int(r) for h, r in zip(nodes, rank)}


def authority_multipliers(ranks: dict, boost: int) -> dict:
    """Budget multiplier per host: ``boost`` for hosts in the top
    authority band (rank ≥ half the max rank — integer compare, no
    float), 1 implicitly for everyone else.  Only boosted hosts are
    returned, so the dict ships O(authoritative hosts)."""
    if boost <= 1 or not ranks:
        return {}
    mx = max(ranks.values())
    return {h: boost for h, r in ranks.items() if 2 * r >= mx}

"""The crawl-ordering specification shared by the Ray engine and the
sequential oracle.

Crawl order must be a deterministic function of (seed list, politeness
budget) — never of wall-clock completion (SURVEY.md §7.5).  The rule:

1. **Discovery** (per seed, reference ``sitemap_utils.py:309-351``):
   robots ``Sitemap:`` lines else the four well-known locations, probed
   in order; the FIRST location whose (recursive) sitemap tree yields
   URLs wins; sitemap-index children are processed depth-first, each
   child's URLs appended after its parent's own; a per-host processed
   set breaks cycles.  Row ``seq_no = seed_idx * SEED_STRIDE +
   discovery_idx``.
2. **Rounds** (BSP): each round's candidates are the previous round's
   deferred rows plus newly discovered links.
   a. intra-round dedup on ``seen_key = md5(normalize_url(loc))``,
      keeping the min ``(seq_no, loc)`` row;
   b. drop rows already fetched (URL-seen check, no marking);
   c. drop rows the host's robots rules disallow;
   d. per host: order by ``(-priority, seq_no, loc)`` with absent
      priority = 0.5 (sitemap-spec default); the first
      ``round_budget(rps, round_seconds)`` rows are scheduled, the rest
      deferred to the next round;
   e. scheduled rows are marked seen (exactly-once) and fetched.
3. **Link rows** discovered on a fetched page (per-page sorted+deduped,
   reference M3) get ``priority = None``, ``depth = parent + 1``,
   ``seq_no = LINK_SEQ_BASE + crc32(normalize_url(dst))`` — i.e. at
   equal priority, sitemap-discovered URLs order before
   link-discovered ones, and link order is content-derived, not
   completion-derived.
4. **Canonical crawl order** = scheduled rows sorted by
   ``(round, host, fetch_order)``.
"""

from __future__ import annotations

import zlib

from ..kernels.sitemap import (
    filter_frontier_rows,
    parse_sitemap_xml,
    well_known_sitemap_urls,
)
from ..kernels.urls import extract_base_url, get_domain_from_url, normalize_url, url_seen_key

SEED_STRIDE = 1_000_000
LINK_SEQ_BASE = 10 ** 15


def link_seq_no(dst_url: str) -> int:
    return LINK_SEQ_BASE + zlib.crc32(normalize_url(dst_url).encode())


def dedup_candidates(rows: list[dict]) -> list[dict]:
    """Canonical intra-round dedup: keep the min-(seq_no, loc) row per
    seen_key — ONE definition shared by the engine's batch pre-dedup,
    the host-group processor and the sequential oracle (spec rule 2a)."""
    best: dict[str, dict] = {}
    for row in rows:
        cur = best.get(row["seen_key"])
        if cur is None or (row["seq_no"], row["loc"]) < (cur["seq_no"],
                                                         cur["loc"]):
            best[row["seen_key"]] = row
    return list(best.values())


# freshness scheduling: sitemap <changefreq> → default priority when
# the row declares none (sitemap-spec default is 0.5 — faster-changing
# pages sort above it, static archives below).  Opt-in via the
# ``freshness_priority`` discover/crawl flag; shared by engine and
# oracle so order parity holds by construction.
CHANGEFREQ_PRIORITY = {"always": 0.95, "hourly": 0.9, "daily": 0.8,
                       "weekly": 0.6, "monthly": 0.4, "yearly": 0.2,
                       "never": 0.1}


def discover_seed_frontier(resolve_fn, robots_cache, seed_url: str,
                           seed_idx: int,
                           min_priority=None, include_patterns=None,
                           exclude_patterns=None, limit=None,
                           freshness_priority: bool = False) -> list[dict]:
    """Expand one seed into ordered frontier rows (reference discovery
    semantics; pure given a resolver).  ``robots_cache`` must provide
    ``rules_for(host)``."""
    host = get_domain_from_url(seed_url)
    base = extract_base_url(seed_url)
    rules = robots_cache.rules_for(host)
    locations = list(rules.sitemaps) if rules.sitemaps else \
        well_known_sitemap_urls(base)

    processed: set[str] = set()

    def process(sitemap_url: str) -> list[dict]:
        if sitemap_url in processed:
            return []
        processed.add(sitemap_url)
        status, body = resolve_fn(sitemap_url)
        if status != 200 or not body:
            return []
        rows, children = parse_sitemap_xml(body)
        for child in children:
            rows.extend(process(child))
        return rows

    discovered: list[dict] = []
    for location in locations:
        if rows := process(location):
            discovered = rows
            break

    discovered = filter_frontier_rows(discovered, min_priority,
                                      include_patterns, exclude_patterns,
                                      limit)
    out = []
    for i, row in enumerate(discovered):
        priority = row["priority"]
        if (freshness_priority and priority is None
                and row["changefreq"]):
            priority = CHANGEFREQ_PRIORITY.get(
                str(row["changefreq"]).lower())
        out.append({
            "loc": row["loc"],
            "lastmod": row["lastmod"],
            "changefreq": row["changefreq"],
            "priority": priority,
            "host": get_domain_from_url(row["loc"]),
            "depth": 0,
            "seq_no": seed_idx * SEED_STRIDE + i,
            "seen_key": url_seen_key(row["loc"]),
        })
    return out


def links_to_frontier_rows(src_depth: int, dst_urls: list[str],
                           trap_cap: int = 0) -> list[dict]:
    """Frontier candidate rows for links found on a fetched page.

    ``trap_cap > 0`` enables the crawler-trap guard: at most that many
    links PER PATH TEMPLATE (``kernels.urls.path_template`` — digit /
    long-hex runs collapsed, query values dropped) leave any single
    page, first-in-page-order wins.  A calendar widget or session-id
    generator emitting 10⁵ same-shaped links is cut to ``trap_cap`` at
    the source — locally, deterministically, before the candidate ever
    costs a shuffle row — while organically-linked URL sets (which
    accumulate ACROSS pages, one template hit per page) are untouched.
    Shared by the Ray engine and the sequential oracle, so parity holds
    by construction."""
    from ..kernels.urls import path_template

    out = []
    seen_templates: dict[str, int] = {}
    for dst in dst_urls:
        if not dst.startswith(("http://", "https://")):
            continue
        if trap_cap > 0:
            tpl = path_template(dst)
            n = seen_templates.get(tpl, 0)
            if n >= trap_cap:
                continue
            seen_templates[tpl] = n + 1
        out.append({
            "loc": dst,
            "lastmod": None,
            "changefreq": None,
            "priority": None,
            "host": get_domain_from_url(dst),
            "depth": src_depth + 1,
            "seq_no": link_seq_no(dst),
            "seen_key": url_seen_key(dst),
        })
    return out

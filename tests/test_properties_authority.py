"""Property tests for the pure host-authority kernels — the
scheduler-side state both the oracle and engine derive budgets from,
so their algebraic invariants ARE the parity guarantees."""

from hypothesis import given, settings
from hypothesis import strategies as st

from markdown_lab_ray.state.authority import (
    authority_multipliers,
    extract_host_edges,
    local_pagerank_hosts,
    merge_edges,
)

hosts = st.sampled_from([f"h{i}.example.com" for i in range(8)])
edge = st.tuples(hosts, hosts).filter(lambda e: e[0] != e[1])
edge_sets = st.frozensets(edge, max_size=30).map(set)


@settings(max_examples=100, deadline=None)
@given(edge_sets, edge_sets, st.integers(min_value=1, max_value=40))
def test_merge_edges_order_independent_and_capped(a, b, cap):
    ab = merge_edges(set(a), set(b), cap)
    ba = merge_edges(set(b), set(a), cap)
    assert ab == ba
    assert len(ab) <= cap
    # capped result is the lexicographic prefix of the union
    assert ab == set(sorted(a | b)[:cap])


@settings(max_examples=80, deadline=None)
@given(edge_sets, st.integers(min_value=1, max_value=4))
def test_pagerank_hosts_invariants(edges, n_iter):
    scale = 10 ** 6
    ranks = local_pagerank_hosts(edges, n_iter=n_iter, scale=scale)
    nodes = {h for e in edges for h in e}
    assert set(ranks) == nodes
    base = (scale * 15) // 100
    for r in ranks.values():
        assert r >= base
    if edges:
        # mass never exceeds the starting total (dangling mass leaks,
        # floor-division only loses) plus the injected base
        assert sum(ranks.values()) <= len(nodes) * scale


@settings(max_examples=100, deadline=None)
@given(st.dictionaries(hosts, st.integers(min_value=0,
                                          max_value=10 ** 9),
                       max_size=8),
       st.integers(min_value=0, max_value=5))
def test_multiplier_band_rule(ranks, boost):
    mult = authority_multipliers(ranks, boost)
    if boost <= 1 or not ranks:
        assert mult == {}
        return
    mx = max(ranks.values())
    # the top-ranked host is always boosted; members are exactly the
    # 2r >= max band; every multiplier is the boost itself
    assert set(mult) == {h for h, r in ranks.items() if 2 * r >= mx}
    assert any(ranks[h] == mx for h in mult)
    assert all(v == boost for v in mult.values())


@settings(max_examples=80, deadline=None)
@given(hosts, st.lists(st.text(max_size=30), max_size=10))
def test_extract_host_edges_never_self_or_junk(page_host, urls):
    out = extract_host_edges(page_host, urls)
    for src, dst in out:
        assert src == page_host
        assert dst != page_host
        assert dst  # never empty

"""Round-4h additions: k-core peel (dense-backbone community screen)."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd


def _edges_ds(edges):
    return rd.from_arrow(pa.table({
        "src": pa.array([u for u, _ in edges], pa.int64()),
        "dst": pa.array([v for _, v in edges], pa.int64())}))


def _nodes(ds):
    df = ds.to_pandas()
    return sorted(df["node"].tolist()) if len(df) else []


def _naive_kcore(edges, k, max_rounds):
    alive = {u for u, _ in edges} | {v for _, v in edges}
    for _ in range(max_rounds):
        deg = {}
        for u, v in edges:
            if u in alive and v in alive:
                deg[u] = deg.get(u, 0) + 1
                deg[v] = deg.get(v, 0) + 1
        new_alive = {n for n in alive if deg.get(n, 0) >= k}
        if new_alive == alive:
            break
        alive = new_alive
    return sorted(alive)


# triangle (3-clique) + pendant chain: 2-core is the triangle;
# K4 minus the chain survives a 3-peel.
_K4 = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]
_CHAIN = [(3, 4), (4, 5), (5, 6)]


@pytest.mark.parametrize("k,edges", [
    (2, _K4 + _CHAIN),
    (3, _K4 + _CHAIN),
    (4, _K4 + _CHAIN),          # empty: no node has induced degree >= 4
    (2, [(0, 1), (1, 2)]),      # path: 2-core empty
])
def test_kcore_matches_naive(ray_session, k, edges):
    from markdown_lab_ray.stages.graph import kcore_peel

    got = _nodes(kcore_peel(_edges_ds(edges), k=k, max_rounds=8))
    assert got == _naive_kcore(edges, k, 8)


def test_kcore_distributed_path_equals_small_path(ray_session):
    from markdown_lab_ray.stages.graph import kcore_peel

    rng = np.random.RandomState(7)
    edges = set()
    # dense core of 12 nodes + sparse periphery
    core = list(range(12))
    for i in core:
        for j in core:
            if i < j and rng.rand() < 0.6:
                edges.add((i, j))
    for i in range(12, 80):
        edges.add((rng.randint(0, 12), i))
    edges = sorted(edges)

    small = _nodes(kcore_peel(_edges_ds(edges), k=3, max_rounds=8))
    dist = _nodes(kcore_peel(_edges_ds(edges), k=3, max_rounds=8,
                             small_cutoff=0, n_buckets=4))
    assert dist == small == _naive_kcore(edges, 3, 8)


def test_kcore_round_cap_semantics(ray_session):
    """A long chain into a triangle peels one layer per round; a
    capped peel must stop mid-way exactly where the naive peel does."""
    from markdown_lab_ray.stages.graph import kcore_peel

    tri = [(100, 101), (101, 102), (100, 102)]
    chain = [(100, 0)] + [(i, i + 1) for i in range(0, 9)]
    edges = tri + chain
    for rounds in (1, 2, 3, 8):
        got = _nodes(kcore_peel(_edges_ds(edges), k=2,
                                max_rounds=rounds))
        assert got == _naive_kcore(edges, 2, rounds), rounds

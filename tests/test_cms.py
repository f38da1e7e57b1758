"""Count-Min sketch (stages/sketch.py): one-sided estimate guarantee,
heavy-hitter exactness vs brute force and vs the Misra-Gries path,
layout invariance, and empty/degenerate inputs."""

from collections import Counter

import numpy as np
import pyarrow as pa
import pytest


def _docs(n=300):
    """Zipf-ish corpus with a known token distribution."""
    rng = np.random.RandomState(11)
    vocab = [f"w{i:03d}" for i in range(120)]
    probs = 1.0 / np.arange(1, len(vocab) + 1)
    probs /= probs.sum()
    texts = [" ".join(rng.choice(vocab, size=rng.randint(5, 40), p=probs))
             for _ in range(n)]
    return pa.table({"text": pa.array(texts)})


def _exact_counts(table):
    from markdown_lab_ray.stages.sketch import _tokens

    return Counter(_tokens(table.column("text").to_pylist()))


def test_cms_estimate_one_sided_and_tight(ray_session):
    import ray.data as rd

    from markdown_lab_ray.stages.sketch import cms_estimate, cms_sketch

    table = _docs()
    exact = _exact_counts(table)
    cms, n_total = cms_sketch(rd.from_arrow(table).repartition(6),
                              depth=4, width=4096)
    assert n_total == sum(exact.values())
    terms = sorted(exact)
    est = cms_estimate(cms, terms)
    true = np.array([exact[t] for t in terms])
    assert (est >= true).all()  # CMS never underestimates
    # additive error ≤ ~2·e·n/width with overwhelming probability at
    # depth 4; assert a loose deterministic-for-this-seed bound
    assert (est - true).max() <= 2 * np.e * n_total / 4096 + 1


def test_cms_heavy_hitters_exact_vs_bruteforce(ray_session):
    import ray.data as rd

    from markdown_lab_ray.stages.sketch import cms_heavy_hitters

    table = _docs()
    exact = _exact_counts(table)
    n = sum(exact.values())
    k = 24
    want = sorted(((t, c) for t, c in exact.items() if c * k > n),
                  key=lambda tc: (-tc[1], tc[0]))
    got = cms_heavy_hitters(rd.from_arrow(table).repartition(5),
                            k=k).itertuples(index=False)
    assert [(r.term, r.n_term) for r in got] == want


def test_cms_matches_misra_gries_path(ray_session):
    """Two different sketches, same exact answer (both end in an exact
    recount)."""
    import ray.data as rd

    from markdown_lab_ray.stages.sketch import (
        cms_heavy_hitters,
        heavy_hitters_exact,
    )

    table = _docs(200)
    a = cms_heavy_hitters(rd.from_arrow(table).repartition(4), k=16)
    b = heavy_hitters_exact(rd.from_arrow(table).repartition(4), k=16)
    assert a.values.tolist() == b.values.tolist()


def test_cms_layout_invariant(ray_session):
    import ray.data as rd

    from markdown_lab_ray.stages.sketch import cms_heavy_hitters

    table = _docs(150)
    perm = np.random.RandomState(5).permutation(table.num_rows)
    a = cms_heavy_hitters(rd.from_arrow(table).repartition(2), k=20)
    b = cms_heavy_hitters(
        rd.from_arrow(table.take(pa.array(perm))).repartition(9), k=20)
    assert a.values.tolist() == b.values.tolist()


def test_cms_empty_and_param_guard(ray_session):
    import ray.data as rd

    from markdown_lab_ray.stages.sketch import cms_heavy_hitters

    empty = pa.table({"text": pa.array([], pa.string())})
    out = cms_heavy_hitters(rd.from_arrow(empty), k=8)
    assert len(out) == 0 and list(out.columns) == ["term", "n_term"]
    with pytest.raises(ValueError, match="topn_per_batch"):
        cms_heavy_hitters(rd.from_arrow(empty), k=100, topn_per_batch=10)

"""Distributed Bloom filter (stages/bloom.py): no false negatives,
bounded false positives, partition-invariant build, conservative
filter semantics."""

import numpy as np
import pandas as pd
import pytest


def _rd():
    import ray.data as rd
    return rd


def test_bloom_no_false_negatives_and_bounded_fp(ray_session):
    from markdown_lab_ray.stages.bloom import build_bloom

    seen = np.array([f"doc-{i}" for i in range(5000)], dtype=object)
    other = np.array([f"new-{i}" for i in range(5000)], dtype=object)
    ds = _rd().from_pandas(pd.DataFrame({"h": seen})).repartition(6)
    bf = build_bloom(ds, "h", m_bits=1 << 17, k=7)
    assert bf.contains(seen).all()                  # zero false negatives
    # theory: (1 - e^{-kn/m})^k ≈ 0.8% for n=5000, m=131072, k=7
    assert bf.contains(other).mean() < 0.05


def test_bloom_build_partition_invariant(ray_session):
    from markdown_lab_ray.stages.bloom import build_bloom

    vals = pd.DataFrame({"h": [f"v{i}" for i in range(999)]})
    a = build_bloom(_rd().from_pandas(vals).repartition(2), "h",
                    m_bits=1 << 14, k=5)
    b = build_bloom(_rd().from_pandas(vals).repartition(11), "h",
                    m_bits=1 << 14, k=5)
    assert np.array_equal(a.words, b.words)


def test_filter_unseen_drops_all_seen(ray_session):
    from markdown_lab_ray.stages.bloom import build_bloom, filter_unseen

    seen = [f"s{i}" for i in range(300)]
    new = [f"n{i}" for i in range(300)]
    bf = build_bloom(_rd().from_pandas(pd.DataFrame({"h": seen})), "h",
                     m_bits=1 << 15, k=7)
    mix = _rd().from_pandas(pd.DataFrame({"h": seen + new})).repartition(4)
    out = filter_unseen(mix, bf, "h").to_pandas()
    assert all(v.startswith("n") for v in out["h"])   # nothing seen leaks
    assert len(out) >= 285                            # ≥95% of new kept


def test_bloom_rejects_bad_params(ray_session):
    from markdown_lab_ray.stages.bloom import build_bloom

    ds = _rd().from_pandas(pd.DataFrame({"h": ["x"]}))
    with pytest.raises(ValueError):
        build_bloom(ds, "h", m_bits=100)     # not a multiple of 64
    with pytest.raises(ValueError):
        build_bloom(ds, "h", m_bits=64, k=0)

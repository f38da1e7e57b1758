"""Sampling helpers (SURVEY §2.7 O5).

The reference exposes no sampler of its own; bench subsetting and
pipeline smoke-runs want one (VERDICT r01 #10).  Thin, seeded wrapper
over ``Dataset.random_sample`` so every call site shares one default
seed and the determinism contract is tested in one place.
"""

from __future__ import annotations


def random_sample(ds, fraction: float, seed: int = 42):
    """Per-row Bernoulli sample of ``ds`` — deterministic for a given
    (dataset content, fraction, seed); streams block-by-block (no
    materialization, no shuffle)."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    return ds.random_sample(fraction, seed=seed)

"""Sampling helpers (SURVEY §2.7 O5 + training-data curation).

The reference exposes no sampler of its own; bench subsetting and
pipeline smoke-runs want one (VERDICT r01 #10).  Thin, seeded wrapper
over ``Dataset.random_sample`` so every call site shares one default
seed and the determinism contract is tested in one place.

``weighted_sample_per_key`` is the curation-grade sampler a training
pipeline needs (sample k docs per source, weighted by length/quality):
Efraimidis–Spirakis A-ES (public: "Weighted random sampling with a
reservoir", IPL 2006) made deterministic and SQL-replicable via an
md5-derived uniform, so the DuckDB oracle can reproduce it exactly.
"""

from __future__ import annotations

import hashlib

import numpy as np


def random_sample(ds, fraction: float, seed: int = 42,
                  id_col: str | None = None):
    """Per-row Bernoulli sample of ``ds``; streams block-by-block (no
    materialization, no shuffle).

    Determinism contract: with ``id_col`` set, the keep/drop decision
    is ``hash(id, seed) < fraction`` via the fixed-key siphash
    ``pd.util.hash_array`` — a pure function of row CONTENT, so block
    layout, parallelism, retries and re-runs all produce the identical
    sample (Ray's own ``Dataset.random_sample(seed=...)`` seeds per
    task and is only reproducible for one physical block layout; under
    dynamic block splitting two runs of the same pipeline can diverge,
    which is exactly the flake this path removes).  Without ``id_col``
    it falls back to Ray's sampler (content-blind, layout-dependent).
    """
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    if id_col is None:
        return ds.random_sample(fraction, seed=seed)
    import pandas as pd
    import pyarrow as pa

    threshold = np.uint64(min(int(fraction * float(2 ** 64)), 2 ** 64 - 1))

    def keep(batch: "pa.Table") -> "pa.Table":
        # Arrow in/out: only the id column leaves Arrow (numpy for the
        # siphash), the payload columns ride zero-copy through filter
        if fraction >= 1.0:
            return batch
        ids = (batch.column(id_col).combine_chunks()
               .to_numpy(zero_copy_only=False))
        h = pd.util.hash_array(ids, categorize=False)
        h = pd.util.hash_array(h + np.uint64(seed), categorize=False)
        return batch.filter(pa.array(h < threshold))

    return ds.map_batches(keep, batch_format="pyarrow")


def _aes_priority(ids, weights) -> np.ndarray:
    """A-ES priority u_i ** (1 / w_i) with u_i = md5(str(id))[:8]/2^32.

    The uniform comes from the row's id, not a process RNG, so every
    worker, retry and the SQL oracle agree:
    ``pow(('0x' || substr(md5(id::VARCHAR),1,8))::BIGINT / 2^32,
    1.0/w)``.  A 32-bit-int-derived double is exact, so base and
    exponent are bit-identical on both sides; np.power and libm pow
    may still differ in the last ulp, but priorities are used for
    ORDERING only (never emitted) and the gap between adjacent order
    statistics is ~1/n — a 1e-16 perturbation cannot flip a rank at
    any real group size.
    """
    w = np.asarray(weights, np.float64)
    if (w <= 0).any():
        raise ValueError("weights must be > 0 for A-ES sampling")
    u = np.array(
        [int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)
         for i in ids], np.float64) / np.float64(2 ** 32)
    return np.power(u, np.float64(1.0) / w)


def weighted_sample_per_key(ds, key_col: str, id_col: str,
                            weight_col: str, k: int):
    """Weighted reservoir sample WITHOUT replacement: the k rows per
    key with the largest A-ES priority (ties broken by id ascending).

    Rows with weight w are selected with the exact A-ES inclusion law,
    so a 10× longer document is ~10× likelier to make the sample —
    the standard curation primitive ("keep k docs per source, favor
    substance") at training-data scale.

    Two-level and mergeable, the same shape as ``distinct_count``:
    each batch prunes to its local top-k per key (the reservoir — a
    combiner, so the shuffle moves ≤ k rows per (key, block), never
    the corpus), then one ``groupby(key).map_groups`` takes the exact
    global top-k.  Determinism: priorities depend only on row ids, so
    block layout / retries / parallelism never change the sample.
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    import pandas as pd

    def top_k(df: "pd.DataFrame") -> "pd.DataFrame":
        if df.empty:
            return df
        df = df.assign(_prio=_aes_priority(df[id_col], df[weight_col]))
        df = df.sort_values([key_col, "_prio", id_col],
                            ascending=[True, False, True],
                            kind="mergesort")
        out = df.groupby(key_col, sort=False).head(k)
        return out.drop(columns="_prio").reset_index(drop=True)

    pruned = ds.map_batches(top_k, batch_format="pandas")
    return pruned.groupby(key_col).map_groups(top_k, batch_format="pandas")


def weighted_sample_global(ds, id_col: str, weight_col: str, k: int):
    """Corpus-level weighted reservoir sample WITHOUT replacement: the
    k rows with the largest A-ES priority overall (ties by id asc) —
    the un-keyed twin of ``weighted_sample_per_key`` for "pick k docs
    from the whole corpus, favor substance" curation.

    Same combiner shape: each batch prunes to its local top-k (≤ k
    rows per block move), then ONE driver-side merge of the ≤
    k×n_blocks pruned rows — no shuffle at all.  k is a sample size
    (thousands at most), so the driver holds O(k) rows; determinism is
    id-derived exactly as in the per-key variant."""
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    import pandas as pd

    def top_k(df: "pd.DataFrame") -> "pd.DataFrame":
        if df.empty:
            return df
        df = df.assign(_prio=_aes_priority(df[id_col], df[weight_col]))
        df = df.sort_values(["_prio", id_col], ascending=[False, True],
                            kind="mergesort").head(k)
        return df.reset_index(drop=True)

    pruned = ds.map_batches(top_k, batch_format="pandas").to_pandas()
    if pruned.empty:
        return pruned.drop(columns=[c for c in ("_prio",)
                                    if c in pruned.columns])
    return (top_k(pruned.drop(columns=["_prio"]))
            .drop(columns=["_prio"]).reset_index(drop=True))

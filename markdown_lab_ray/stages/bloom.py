"""Distributed Bloom-filter build + membership filtering.

The cross-run incremental-dedup primitive: run N builds a filter over
every text hash it has accepted; run N+1 drops already-seen documents
with one stateless ``map_batches`` pass against the broadcast filter
(no shuffle, no join) and only sends the tiny maybe-seen remainder to
an exact confirm.  This is the corpus-level sibling of the crawl's
cuckoo URL-seen shards (``state/seen.py``): the crawl needs online
inserts (actors); a corpus snapshot wants a cheap immutable artifact.

Scale shape: each input block sets bits into its OWN local bitmap
(vectorized Kirsch–Mitzenmacher double hashing), blocks stream to the
driver as bitmaps, and the driver OR-reduces — the driver holds ONE
``m_bits``-sized array (≈1.2 GiB for 10^9 keys at 1% FP), which IS the
deliverable artifact, never the keys.  Membership tests are a numpy
gather — no Python loop.

False-positive semantics are the caller's choice: ``filter_unseen``
drops maybe-seen rows conservatively (bounded FP loss, zero false
keeps); pair it with ``state/seen.py``-style exact confirmation when
loss is unacceptable.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


class BloomFilter:
    """Immutable Bloom filter over arbitrary values (hashed with the
    process-stable ``pd.util.hash_array`` siphash, so a filter built
    on one worker set is valid on any other)."""

    def __init__(self, words: np.ndarray, m_bits: int, k: int):
        self.words = words          # uint64 bit words, len = m_bits/64
        self.m_bits = m_bits
        self.k = k

    @staticmethod
    def bit_positions(values, m_bits: int, k: int) -> np.ndarray:
        """(n, k) bit indices via Kirsch–Mitzenmacher: pos_i =
        (h1 + i·h2) mod m with h2 = siphash(h1) — two vectorized hash
        passes give all k positions."""
        arr = np.asarray(values)
        h1 = pd.util.hash_array(arr, categorize=False)
        h2 = pd.util.hash_array(h1, categorize=False) | np.uint64(1)
        i = np.arange(k, dtype=np.uint64)[None, :]
        return ((h1[:, None] + i * h2[:, None])
                % np.uint64(m_bits)).astype(np.uint64)

    def contains(self, values) -> np.ndarray:
        """Vectorized membership: True = maybe present (FP possible),
        False = definitely absent (no false negatives)."""
        if len(values) == 0:
            return np.zeros(0, dtype=bool)
        pos = self.bit_positions(values, self.m_bits, self.k)
        w = self.words[(pos >> np.uint64(6))]
        bits = (w >> (pos & np.uint64(63))) & np.uint64(1)
        return bits.all(axis=1)


def build_bloom(ds, col: str, m_bits: int = 1 << 20, k: int = 7
                ) -> BloomFilter:
    """Build a Bloom filter over ``ds[col]``.  ``m_bits`` must be a
    multiple of 64.  Per-block local bitmaps OR-reduced on the driver;
    network volume is O(blocks · m_bits/8), independent of row count."""
    if m_bits % 64 != 0 or m_bits <= 0:
        raise ValueError("m_bits must be a positive multiple of 64")
    if k <= 0:
        raise ValueError("k must be positive")
    n_words = m_bits // 64

    def partial(batch: pa.Table) -> pa.Table:
        words = np.zeros(n_words, dtype=np.uint64)
        vals = batch.column(col).to_numpy(zero_copy_only=False)
        if len(vals):
            pos = BloomFilter.bit_positions(vals, m_bits, k).ravel()
            np.bitwise_or.at(words, pos >> np.uint64(6),
                             np.uint64(1) << (pos & np.uint64(63)))
        return pa.table({"words": pa.array([words.tobytes()],
                                           pa.binary())})

    acc = np.zeros(n_words, dtype=np.uint64)
    for b in (ds.map_batches(partial, batch_format="pyarrow")
              .iter_batches(batch_format="pyarrow")):
        for blob in b.column("words").to_pylist():
            acc |= np.frombuffer(blob, dtype=np.uint64)
    return BloomFilter(acc, m_bits, k)


def filter_unseen(ds, bloom: BloomFilter, col: str):
    """Keep only rows whose ``col`` is DEFINITELY not in the filter
    (conservative: the FP fraction of genuinely-new rows is dropped;
    nothing already-seen ever passes).  Stateless pass — the filter is
    broadcast once via ``ray.put``."""
    import ray

    ref = ray.put(bloom)

    def keep_new(batch: pa.Table, bref) -> pa.Table:
        bf = ray.get(bref)
        vals = batch.column(col).to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(~bf.contains(vals)))

    return ds.map_batches(keep_new, batch_format="pyarrow",
                          fn_kwargs=dict(bref=ref))

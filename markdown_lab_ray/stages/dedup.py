"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram
Jaccard, embedding-cosine near-dup.

Scale shapes (ray_guide.md "Aggregation at scale"):
- exact: hash in ``map_batches`` (vectorized md5) → ``groupby(hash)``
  keep-first — ONE keyed shuffle over short hash rows;
- MinHash-LSH: per-batch shingle→minhash signatures → explode to
  (band_id, band_key, doc_id) rows → ``groupby(band)`` emits candidate
  pairs → vectorized Jaccard verify → min-label connected components;
- SimHash: 64-bit signatures per batch; near-dup = identical band keys
  on 4×16-bit bands (Hamming ≤ 3 guaranteed caught at ≥1 band);
- embedding cosine: see similarity.py (bucketed) — here only the
  pairwise verify used by the dedup pipelines.
"""

from __future__ import annotations

import re
import zlib

import numpy as np
import pyarrow as pa

_TOKEN_RE = re.compile(r"\w+")
_MERSENNE = (1 << 61) - 1


def _shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    """crc32 hashes of word k-shingles (deterministic across processes)."""
    words = _TOKEN_RE.findall((text or "").lower())
    if len(words) < k:
        return np.array([zlib.crc32(" ".join(words).encode())], dtype=np.uint64)
    return np.unique(np.array(
        [zlib.crc32(" ".join(words[i:i + k]).encode())
         for i in range(len(words) - k + 1)], dtype=np.uint64))


class MinHasher:
    """num_perm-permutation minhash over shingle crc32s, vectorized
    (num_perm × n_shingles broadcast per doc).

    Hash family: multiply-shift ``(a*x + b) mod 2^64`` with odd ``a``
    (Dietzfelbinger et al.) — universal under numpy's native uint64
    wraparound, unlike a Mersenne-modulus scheme which would silently
    overflow before the reduction."""

    def __init__(self, num_perm: int = 64, seed: int = 42):
        rng = np.random.RandomState(seed)
        self.a = (rng.randint(1, 1 << 62, num_perm, dtype=np.uint64)
                  * np.uint64(2) + np.uint64(1))  # odd multipliers
        self.b = rng.randint(0, 1 << 62, num_perm, dtype=np.uint64)
        self.num_perm = num_perm

    def signature(self, text: str, k: int = 3) -> np.ndarray:
        sh = _shingle_hashes(text, k)
        with np.errstate(over="ignore"):  # mod-2^64 wrap is the hash
            vals = self.a[:, None] * sh[None, :] + self.b[:, None]
        return vals.min(axis=1)


def minhash_signature_batch(batch: pa.Table, text_col: str = "text",
                            id_col: str = "doc_id", num_perm: int = 64,
                            k: int = 3, seed: int = 42) -> pa.Table:
    hasher = MinHasher(num_perm, seed)
    sigs = [hasher.signature(t, k).astype(np.int64)
            for t in batch.column(text_col).to_pylist()]
    return pa.table({
        id_col: batch.column(id_col),
        "minhash": pa.array([s.tolist() for s in sigs],
                            pa.list_(pa.int64())),
    })


def band_explode_batch(batch: pa.Table, id_col: str = "doc_id",
                       n_bands: int = 16) -> pa.Table:
    """Signatures → (band_id, band_key, doc_id) rows for the LSH groupby."""
    ids, bands, keys = [], [], []
    for doc_id, sig in zip(batch.column(id_col).to_pylist(),
                           batch.column("minhash").to_pylist()):
        rows_per_band = len(sig) // n_bands
        for b in range(n_bands):
            segment = sig[b * rows_per_band:(b + 1) * rows_per_band]
            key = zlib.crc32(np.array(segment, dtype=np.int64).tobytes())
            ids.append(doc_id)
            bands.append(b)
            keys.append(key)
    return pa.table({
        "band_id": pa.array(bands, pa.int32()),
        "band_key": pa.array(keys, pa.int64()),
        id_col: pa.array(ids),
    })


def candidate_pairs_group(df, id_col: str = "doc_id"):
    """Per (band_id, band_key) group → candidate pairs (a < b).  Buckets
    are tiny in practice; a quadratic emit inside one bucket is the
    standard LSH shape."""
    import pandas as pd
    ids = sorted(df[id_col].unique())
    if len(ids) < 2:
        return pd.DataFrame({"a": [], "b": []}, dtype="int64")
    pairs = [(ids[i], ids[j]) for i in range(len(ids))
             for j in range(i + 1, len(ids))]
    return pd.DataFrame(pairs, columns=["a", "b"])


def jaccard(text_a: str, text_b: str, k: int = 3) -> float:
    sa, sb = set(_shingle_hashes(text_a, k)), set(_shingle_hashes(text_b, k))
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)


def simhash64(text: str) -> int:
    """64-bit SimHash over word unigram+bigram crc32s (signed int64)."""
    words = _TOKEN_RE.findall((text or "").lower())
    feats = words + [" ".join(p) for p in zip(words, words[1:])]
    if not feats:
        return 0
    hashes = np.array([zlib.crc32(f.encode()) ^ (zlib.crc32(f.encode(), 7) << 32)
                       for f in feats], dtype=np.uint64)
    bits = ((hashes[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1)
    counts = bits.sum(axis=0)
    value = int("".join("1" if c * 2 > len(feats) else "0"
                        for c in counts[::-1]), 2)
    return value - (1 << 64) if value >= (1 << 63) else value


def simhash_batch(batch: pa.Table, text_col: str = "text",
                  id_col: str = "doc_id") -> pa.Table:
    sigs = [simhash64(t) for t in batch.column(text_col).to_pylist()]
    out = pa.table({
        id_col: batch.column(id_col),
        "simhash": pa.array(sigs, pa.int64()),
    })
    # 4×16-bit bands: docs within Hamming distance 3 share ≥1 band
    unsigned = np.array(sigs, dtype=np.int64).astype(np.uint64)
    for band in range(4):
        vals = ((unsigned >> np.uint64(band * 16)) & np.uint64(0xFFFF))
        out = out.append_column(f"sim_band{band}",
                                pa.array(vals.astype(np.int64)))
    return out


def hamming64_arr(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    x = (a.astype(np.uint64) ^ b.astype(np.uint64))
    count = np.zeros(len(x), dtype=np.int64)
    for _ in range(64):
        count += (x & 1).astype(np.int64)
        x >>= np.uint64(1)
    return count


def simhash_near_dup_pairs(ds, text_col: str = "text",
                           id_col: str = "doc_id",
                           hamming_threshold: int = 3):
    """SimHash near-dup end-to-end: signatures → 4×16-bit band groupby
    (any pair within Hamming ≤ 3 shares ≥1 band) → candidate pairs →
    exact Hamming verify against a broadcast id→hash lookup."""
    import pandas as pd

    sigs = ds.map_batches(simhash_batch, batch_format="pyarrow",
                          fn_kwargs=dict(text_col=text_col, id_col=id_col)
                          ).materialize()  # consumed twice below
    sig_df = sigs.to_pandas()
    lookup = dict(zip(sig_df[id_col], sig_df["simhash"]))

    def explode(batch: pa.Table) -> pa.Table:
        ids, bands, keys = [], [], []
        for row in batch.to_pylist():
            for band in range(4):
                ids.append(row[id_col])
                bands.append(band)
                keys.append(row[f"sim_band{band}"])
        return pa.table({"band_id": pa.array(bands, pa.int32()),
                         "band_key": pa.array(keys, pa.int64()),
                         id_col: pa.array(ids)})

    def pairs_group(df):
        ids = sorted(df[id_col].unique())
        if len(ids) < 2:
            return pd.DataFrame({"a": pd.Series(dtype="int64"),
                                 "b": pd.Series(dtype="int64")})
        return pd.DataFrame([(ids[i], ids[j]) for i in range(len(ids))
                             for j in range(i + 1, len(ids))],
                            columns=["a", "b"])

    pairs = (sigs.map_batches(explode, batch_format="pyarrow")
             .groupby(["band_id", "band_key"])
             .map_groups(pairs_group, batch_format="pandas")
             .to_pandas())
    if pairs.empty:
        return pd.DataFrame({"a": [], "b": [], "hamming": []})
    pairs = pairs.drop_duplicates().reset_index(drop=True)
    a = np.array([lookup[x] for x in pairs["a"]], dtype=np.int64)
    b = np.array([lookup[x] for x in pairs["b"]], dtype=np.int64)
    pairs["hamming"] = hamming64_arr(a, b)
    return (pairs[pairs["hamming"] <= hamming_threshold]
            .sort_values(["a", "b"]).reset_index(drop=True))


# ---------------------------------------------------------------------------
# pipelines (Dataset → Dataset / DataFrame)
# ---------------------------------------------------------------------------

def exact_dedup_ids(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Representative (min) id per exact text: vectorized md5 →
    ``groupby(hash).aggregate(Min(id))`` — a native keyed aggregate,
    one shuffle over (hash, id) rows only (SURVEY §2.6 A5)."""
    from ray.data.aggregate import Min

    from .text import add_text_hash_batch

    hashed = ds.map_batches(
        add_text_hash_batch, batch_format="pyarrow",
        fn_kwargs=dict(text_col=text_col)
    ).select_columns(["text_md5", id_col])
    out = hashed.groupby("text_md5").aggregate(Min(id_col, alias_name=id_col))
    return out.select_columns([id_col])


def exact_dedup(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Keep the full min-id row per exact text (generic row-preserving
    variant; prefer ``exact_dedup_ids`` when only ids are needed)."""
    from .text import add_text_hash_batch

    def keep_first(df):
        return df.sort_values(id_col, kind="mergesort").head(1)

    hashed = ds.map_batches(add_text_hash_batch, batch_format="pyarrow",
                            fn_kwargs=dict(text_col=text_col))
    return (hashed.groupby("text_md5")
            .map_groups(keep_first, batch_format="pandas")
            .drop_columns(["text_md5"]))


def minhash_near_dup_pairs(ds, text_col: str = "text",
                           id_col: str = "doc_id", num_perm: int = 64,
                           n_bands: int = 16, k: int = 3,
                           jaccard_threshold: float = 0.7, seed: int = 42):
    """LSH candidate pairs verified by true shingle Jaccard.

    Returns a pandas DataFrame (a, b, jaccard) — candidate volume is
    tiny relative to the corpus; the verify re-reads only candidate
    texts via a broadcast id→text lookup (fine while candidates fit a
    node; at larger scale swap for a join against the docs table).
    """
    import pandas as pd
    import ray

    sigs = ds.map_batches(minhash_signature_batch, batch_format="pyarrow",
                          fn_kwargs=dict(text_col=text_col, id_col=id_col,
                                         num_perm=num_perm, k=k, seed=seed))
    bands = sigs.map_batches(band_explode_batch, batch_format="pyarrow",
                             fn_kwargs=dict(id_col=id_col, n_bands=n_bands))
    pairs_ds = bands.groupby(["band_id", "band_key"]).map_groups(
        candidate_pairs_group, batch_format="pandas",
        fn_kwargs=dict(id_col=id_col))
    pairs = pairs_ds.to_pandas()
    if pairs.empty:
        return pd.DataFrame({"a": [], "b": [], "jaccard": []})
    pairs = pairs.drop_duplicates().reset_index(drop=True)

    # single materialization: two separate to_pandas() runs could return
    # blocks in different orders (preserve_order is off) and misalign
    # ids with texts
    docs_df = ds.to_pandas()
    texts_ref = ray.put(dict(zip(docs_df[id_col], docs_df[text_col])))

    @ray.remote
    def verify(chunk, ref):
        lookup = ref
        return [jaccard(lookup[a], lookup[b], k) for a, b in chunk]

    chunks = np.array_split(pairs[["a", "b"]].to_numpy(), max(1, len(pairs) // 512))
    scores = []
    for res in ray.get([verify.remote(c, texts_ref) for c in chunks if len(c)]):
        scores.extend(res)
    pairs["jaccard"] = scores
    return pairs[pairs["jaccard"] >= jaccard_threshold].reset_index(drop=True)


def connected_components(pairs, ids) -> dict:
    """Min-label union-find over near-dup pairs (driver-side: the pair
    set is small; the distributed alternative is iterated min-label
    propagation via groupby)."""
    parent = {i: i for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra
    return {i: find(i) for i in ids}

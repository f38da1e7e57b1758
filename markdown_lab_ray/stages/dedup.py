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

import logging
import re
import zlib

import numpy as np
import pyarrow as pa

from .bucketing import tag_buckets_batch

logger = logging.getLogger("markdown_lab_ray.dedup")

_TOKEN_RE = re.compile(r"\w+")
_MERSENNE = (1 << 61) - 1

# Default per-bucket candidate cap: a degenerate LSH bucket (e.g. 10^6
# identical boilerplate pages landing on one band key) would otherwise
# emit C(n,2) pairs.  Capped buckets are counted by a zero-CPU stats
# actor and reported via ``logger.warning`` — no silent truncation.
DEFAULT_BUCKET_CAP = 512


class CapStats:
    """Zero-CPU counter actor: accounting for capped LSH buckets.

    Group fns call ``add`` synchronously (``ray.get``) so the totals
    are visible by the time the dataset is consumed; the pipeline
    driver then reads and logs them.  Caps are rare, so the ack adds no
    measurable latency.  Counts are advisory (a Ray task retry could
    double-count) — the pair OUTPUT is what stays exact."""

    def __init__(self):
        self.buckets = 0
        self.dropped_pairs = 0

    def add(self, dropped: int) -> None:
        self.buckets += 1
        self.dropped_pairs += int(dropped)

    def get(self):
        return self.buckets, self.dropped_pairs


def new_cap_stats():
    import ray
    return ray.remote(num_cpus=0)(CapStats).remote()


def report_caps(stats, op_name: str):
    """Read + log capped-bucket totals, then kill the stats actor.
    Returns (n_capped_buckets, n_dropped_pairs)."""
    import ray
    buckets, dropped = ray.get(stats.get.remote())
    if dropped:
        logger.warning(
            "%s: capped %d degenerate LSH bucket(s) — dropped %d candidate "
            "pair(s); raise bucket_cap or pre-collapse exact duplicates "
            "(exact_dedup_ids) if these pairs matter", op_name, buckets, dropped)
    ray.kill(stats)
    return buckets, dropped


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


_BAND_MIX = np.uint64(0x9E3779B97F4A7C15)  # odd (golden-ratio) multiplier


def band_explode_batch(batch: pa.Table, id_col: str = "doc_id",
                       n_bands: int = 16) -> pa.Table:
    """Signatures → (band_id, band_key, doc_id) rows for the LSH groupby.

    Vectorized: the list column is flattened to an (n, num_perm) array
    and each band's key is a polynomial mix of its segment values under
    native uint64 wraparound — two docs share a bucket iff their band
    segments are value-equal (modulo a ~2^-64 mix collision)."""
    n = batch.num_rows
    empty = pa.table({"band_id": pa.array([], pa.int32()),
                      "band_key": pa.array([], pa.int64()),
                      id_col: pa.array([], batch.schema.field(id_col).type)})
    if n == 0:
        return empty
    arr = batch.column("minhash").combine_chunks()
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.chunk(0)
    values = np.asarray(arr.flatten(), dtype=np.int64)
    num_perm = len(values) // n
    sig = values.reshape(n, num_perm).astype(np.uint64)
    rows_per_band = num_perm // n_bands
    ids = batch.column(id_col)
    parts = []
    with np.errstate(over="ignore"):
        for b in range(n_bands):
            seg = sig[:, b * rows_per_band:(b + 1) * rows_per_band]
            key = np.zeros(n, dtype=np.uint64)
            for i in range(rows_per_band):
                key = key * _BAND_MIX + seg[:, i] + np.uint64(1)
            parts.append(pa.table({
                "band_id": pa.array(np.full(n, b, dtype=np.int32)),
                "band_key": pa.array(key.astype(np.int64)),
                id_col: ids,
            }))
    return pa.concat_tables(parts)


def candidate_pairs_group(df, id_col: str = "doc_id",
                          bucket_cap: int | None = DEFAULT_BUCKET_CAP,
                          stats=None):
    """Per (band_id, band_key) group → candidate pairs (a < b).

    Buckets are tiny in practice; emission is capped at ``bucket_cap``
    members (first by sorted id) so a degenerate bucket of n identical
    docs costs O(cap^2), not C(n,2).  Dropped-pair volume is reported
    to the ``stats`` CapStats actor when given — never silently."""
    import pandas as pd
    ids = np.sort(df[id_col].unique())
    n = len(ids)
    if n < 2:
        return pd.DataFrame({"a": pd.Series(dtype=ids.dtype),
                             "b": pd.Series(dtype=ids.dtype)})
    if bucket_cap is not None and n > bucket_cap:
        if stats is not None:
            import ray
            ray.get(stats.add.remote(n * (n - 1) // 2
                                     - bucket_cap * (bucket_cap - 1) // 2))
        ids = ids[:bucket_cap]
        n = bucket_cap
    ii, jj = np.triu_indices(n, 1)
    return pd.DataFrame({"a": ids[ii], "b": ids[jj]})


def shingle_strings(text: str, k: int = 3) -> set:
    """Distinct word k-shingle STRINGS (not hashes) — the exact-set
    variant used where an oracle compares against SQL shingles (hash
    collisions would otherwise make the comparison probabilistic).
    Mirrors ``_shingle_hashes`` semantics: under k words → one shingle
    of all words joined (possibly the empty string)."""
    words = _TOKEN_RE.findall((text or "").lower())
    if len(words) < k:
        return {" ".join(words)}
    return {" ".join(words[i:i + k]) for i in range(len(words) - k + 1)}


def ngram_jaccard_vs_ref_batch(batch: pa.Table, ref_text: str, k: int = 3,
                               text_col: str = "text",
                               id_col: str = "doc_id") -> pa.Table:
    """Per-doc word-k-gram Jaccard similarity against one reference
    text (standalone n-gram-Jaccard near-dup scorer; the reference
    shingle set is built once per task from the broadcast text)."""
    import math

    ref = shingle_strings(ref_text, k)
    sims = []
    for text in batch.column(text_col).to_pylist():
        s = shingle_strings(text, k)
        value = len(s & ref) / len(s | ref)
        # half-AWAY-from-zero to 6 places (SQL round semantics; python
        # round() is banker's and differs on exact .5 ulp cases like
        # 2/256 = 0.0078125)
        sims.append(math.floor(value * 1e6 + 0.5) / 1e6)
    return pa.table({id_col: batch.column(id_col),
                     "jaccard_ref": pa.array(sims, pa.float64())})


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
                           hamming_threshold: int = 3,
                           bucket_cap: int | None = DEFAULT_BUCKET_CAP):
    """SimHash near-dup end-to-end: signatures → 4×16-bit band groupby
    (any pair within Hamming ≤ 3 shares ≥1 band) → per-band candidate
    pairs verified IN the band group (the 64-bit ``simhash`` rides along
    on the band rows, so there is no driver-side id→hash state) →
    cross-band dedup of the already-filtered pair set.

    Only the final near-dup pairs reach the driver — O(result), never
    O(corpus).  Degenerate buckets are capped at ``bucket_cap`` members
    with the dropped volume logged (CapStats)."""
    import pandas as pd

    stats = new_cap_stats() if bucket_cap is not None else None
    sigs = ds.map_batches(simhash_batch, batch_format="pyarrow",
                          fn_kwargs=dict(text_col=text_col, id_col=id_col))

    def explode(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        parts = []
        for band in range(4):
            parts.append(pa.table({
                "band_id": pa.array(np.full(n, band, dtype=np.int32)),
                "band_key": batch.column(f"sim_band{band}"),
                id_col: batch.column(id_col),
                "simhash": batch.column("simhash"),
            }))
        return pa.concat_tables(parts)

    def pairs_group(df):
        df = (df.drop_duplicates(subset=[id_col])
              .sort_values(id_col, kind="mergesort"))
        n = len(df)
        if n < 2:
            return pd.DataFrame({"a": pd.Series(dtype="int64"),
                                 "b": pd.Series(dtype="int64"),
                                 "hamming": pd.Series(dtype="int64")})
        if bucket_cap is not None and n > bucket_cap:
            if stats is not None:
                import ray
                ray.get(stats.add.remote(n * (n - 1) // 2
                                         - bucket_cap * (bucket_cap - 1) // 2))
            df = df.head(bucket_cap)
            n = bucket_cap
        ids = df[id_col].to_numpy()
        sims = df["simhash"].to_numpy(dtype=np.int64)
        ii, jj = np.triu_indices(n, 1)
        ham = hamming64_arr(sims[ii], sims[jj])
        keep = ham <= hamming_threshold
        return pd.DataFrame({"a": ids[ii][keep], "b": ids[jj][keep],
                             "hamming": ham[keep]})

    pairs = (sigs.map_batches(explode, batch_format="pyarrow")
             .groupby(["band_id", "band_key"])
             .map_groups(pairs_group, batch_format="pandas")
             .to_pandas())
    if stats is not None:
        report_caps(stats, "simhash_near_dup_pairs")
    if pairs.empty:
        # explicit dtypes: bare [] lists default to float64, and an
        # all-empty corpus would then produce a float edge set that
        # mismatches int64 id schemas downstream
        return pd.DataFrame({"a": pd.Series(dtype="int64"),
                             "b": pd.Series(dtype="int64"),
                             "hamming": pd.Series(dtype="int64")})
    return (pairs.drop_duplicates(subset=["a", "b"])
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


def exact_dedup(ds, text_col: str = "text", id_col: str = "doc_id",
                n_buckets: int = 64):
    """Keep the full min-id row per exact text (generic row-preserving
    variant; prefer ``exact_dedup_ids`` when only ids are needed).
    Groups by ``hash(md5) % n_buckets`` — B group tasks regardless of
    distinct-text count; the in-bucket winner pick is one vectorized
    sort + drop_duplicates."""
    from .bucketing import key_buckets
    from .text import add_text_hash_batch

    def keep_first(df):
        df = df.sort_values(["text_md5", id_col], kind="mergesort")
        return df.drop_duplicates("text_md5", keep="first")

    hashed = (ds.map_batches(add_text_hash_batch, batch_format="pyarrow",
                             fn_kwargs=dict(text_col=text_col))
              .map_batches(
        lambda df: df.assign(_hb=key_buckets(df["text_md5"].to_numpy(),
                                             n_buckets)),
        batch_format="pandas"))
    return (hashed.groupby("_hb")
            .map_groups(keep_first, batch_format="pandas")
            .drop_columns(["text_md5", "_hb"]))


def pair_bucket_ids(a: np.ndarray, b: np.ndarray,
                    n_pair_buckets: int) -> np.ndarray:
    """Process-stable bucket id per candidate pair — groups the verify
    stage by ``hash(a, b) % B`` so B bounded groups each verify many
    pairs vectorized, instead of one tiny pandas group per pair (at
    millions of candidates the per-group overhead would dominate)."""
    import pandas as pd

    ha = pd.util.hash_array(np.ascontiguousarray(a))
    hb = pd.util.hash_array(np.ascontiguousarray(b))
    with np.errstate(over="ignore"):
        mixed = ha * _BAND_MIX + hb
    return (mixed % np.uint64(n_pair_buckets)).astype(np.int32)


def minhash_near_dup_pairs(ds, text_col: str = "text",
                           id_col: str = "doc_id", num_perm: int = 64,
                           n_bands: int = 16, k: int = 3,
                           jaccard_threshold: float = 0.7, seed: int = 42,
                           bucket_cap: int | None = DEFAULT_BUCKET_CAP,
                           pre_collapse_exact: bool = False,
                           as_dataset: bool = False,
                           n_pair_buckets: int = 64):
    """LSH candidate pairs verified by true shingle Jaccard — fully
    distributed, with the candidate PAIR SET staying a Dataset
    end-to-end (no driver round-trip between banding and verify):

    1. signatures → band explode → ``groupby(band)`` candidate pairs
       (capped per bucket, CapStats-logged);
    2. cross-band pair dedup via a native keyed aggregate (the pair
       Dataset is materialized in the OBJECT STORE — it feeds three
       consumers below, never the driver);
    3. the distinct candidate ids (≤ 2·pairs ints, ≪ corpus — the same
       bound the downstream components path assumes) come off a
       ``unique()`` pass and are broadcast once via ``ray.put``; the
       docs table is semi-filtered to just those ids in one streaming
       pass — the corpus text NEVER reaches the driver;
    4. pairs explode to (a, b, pair_bucket, doc_id) rows inside
       ``map_batches``; candidate texts attach via
       ``bucketed_hash_join`` (one shuffle over candidate-scale rows);
    5. Jaccard verifies per PAIR BUCKET (``hash(a,b) % n_pair_buckets``)
       — each of the B groups verifies all its pairs in one pass,
       shingling each distinct doc once, instead of one pandas group
       per pair.

    Returns pandas (a, b, jaccard) sorted by (a, b); with
    ``as_dataset=True`` returns the verified pair Dataset instead so a
    downstream consumer (``connected_components_distributed``) can keep
    streaming — zero ``to_pandas`` anywhere on that path.

    ``pre_collapse_exact=True`` first collapses byte-identical docs to
    their min-id representative (``exact_dedup_ids``) so boilerplate
    clusters cost O(n), not C(n,2); exact-dup pairs are then reported by
    ``exact_dedup``, not here — document-level semantics change, hence
    opt-in.
    """
    import pandas as pd
    import pyarrow.compute as pc
    import ray
    import ray.data as rd
    from ray.data.aggregate import Count

    from .joins import bucketed_hash_join, bucketed_semi_join

    if pre_collapse_exact:
        # Dataset-to-Dataset semi-join: one keyed shuffle, the keep-id
        # set never touches the driver (at 10^10 docs the old
        # iter_batches+concatenate fold was O(#docs)·8B driver memory).
        keep = exact_dedup_ids(ds, text_col=text_col, id_col=id_col)
        ds = bucketed_semi_join(ds, keep, key=id_col)

    def _empty_result():
        frame = pd.DataFrame({"a": pd.Series(dtype="int64"),
                              "b": pd.Series(dtype="int64"),
                              "jaccard": pd.Series(dtype="float64")})
        return rd.from_pandas(frame) if as_dataset else frame

    stats = new_cap_stats() if bucket_cap is not None else None
    sigs = ds.map_batches(minhash_signature_batch, batch_format="pyarrow",
                          fn_kwargs=dict(text_col=text_col, id_col=id_col,
                                         num_perm=num_perm, k=k, seed=seed))
    bands = sigs.map_batches(band_explode_batch, batch_format="pyarrow",
                             fn_kwargs=dict(id_col=id_col, n_bands=n_bands))
    # cross-band dedup with a NATIVE keyed aggregate; materialize() pins
    # the (tiny, 2-int-per-row) pair set in the object store because it
    # has multiple consumers below — without it each branch would
    # re-execute the whole signature+banding pipeline
    pairs_dd = (bands.groupby(["band_id", "band_key"]).map_groups(
        candidate_pairs_group, batch_format="pandas",
        fn_kwargs=dict(id_col=id_col, bucket_cap=bucket_cap, stats=stats))
        .groupby(["a", "b"]).aggregate(Count(alias_name="__c"))
        .map_batches(lambda b: b.select(["a", "b"]),
                     batch_format="pyarrow")
        .materialize())
    if stats is not None:  # group fns have all run post-materialize
        report_caps(stats, "minhash_near_dup_pairs")
    if pairs_dd.count() == 0:
        return _empty_result()

    # distinct candidate ids off a keyed-distinct pass (native groupby
    # Count — Ray 2.49's Dataset.unique() aggregate mis-merges numpy
    # accumulators) — only the id ARRAY (≤ 2·pairs ints) touches the
    # driver, for the one-time broadcast
    cid_ds = (pairs_dd.map_batches(
        lambda b: pa.table({"cid": pa.concat_arrays(
            [b["a"].combine_chunks(), b["b"].combine_chunks()])}),
        batch_format="pyarrow")
        .groupby("cid").aggregate(Count(alias_name="__n")))
    cand_ids = np.sort(np.concatenate(
        [b["cid"].to_numpy() for b in
         cid_ds.iter_batches(batch_format="pandas", batch_size=65536)]))
    ids_ref = ray.put(cand_ids)

    def semi_filter(batch: pa.Table, ref) -> pa.Table:
        import ray as _ray
        # zero-copy read of the broadcast id set from the object store
        mask = pc.is_in(batch.column(id_col),
                        value_set=pa.array(_ray.get(ref)))
        return batch.select([id_col, text_col]).filter(mask)

    cand_docs = ds.map_batches(semi_filter, batch_format="pyarrow",
                               fn_kwargs=dict(ref=ids_ref))

    # explode pairs to (a, b, pair_bucket, doc_id) rows — in map_batches,
    # never on the driver — and join texts on doc_id
    def explode_pairs(batch: pa.Table) -> pa.Table:
        a = np.asarray(batch.column("a").combine_chunks().to_numpy(
            zero_copy_only=False))
        b = np.asarray(batch.column("b").combine_chunks().to_numpy(
            zero_copy_only=False))
        pb = pair_bucket_ids(a, b, n_pair_buckets)
        return pa.table({
            "a": np.concatenate([a, a]),
            "b": np.concatenate([b, b]),
            "pb": np.concatenate([pb, pb]),
            id_col: np.concatenate([a, b]),
        })

    exploded = pairs_dd.map_batches(explode_pairs, batch_format="pyarrow")
    joined = bucketed_hash_join(exploded, cand_docs, key=id_col,
                                n_buckets=16)

    def verify_bucket(df: pd.DataFrame) -> pd.DataFrame:
        # one group per pair BUCKET: shingle each distinct doc once,
        # then verify every pair in the bucket off the cached sets
        docs = df.drop_duplicates(subset=[id_col])
        shingles = {i: set(_shingle_hashes(t, k))
                    for i, t in zip(docs[id_col], docs[text_col])}
        out_a, out_b, out_j = [], [], []
        prs = df[["a", "b"]].drop_duplicates()
        for a_id, b_id in zip(prs["a"], prs["b"]):
            sa = shingles.get(a_id)
            sb = shingles.get(b_id)
            if sa is None or sb is None:  # id missing from the corpus
                continue
            score = len(sa & sb) / len(sa | sb)  # sets are never empty
            if score >= jaccard_threshold:
                out_a.append(a_id)
                out_b.append(b_id)
                out_j.append(score)
        return pd.DataFrame({
            "a": pd.array(np.asarray(out_a, dtype=np.int64),
                          dtype=df["a"].dtype),
            "b": pd.array(np.asarray(out_b, dtype=np.int64),
                          dtype=df["b"].dtype),
            "jaccard": pd.array(out_j, dtype="float64"),
        })

    verified = joined.groupby("pb").map_groups(verify_bucket,
                                               batch_format="pandas")
    if as_dataset:
        return verified
    out = verified.to_pandas()  # O(result): final near-dup pairs only
    if out.empty:
        return _empty_result()
    return out.sort_values(["a", "b"]).reset_index(drop=True)


def connected_components_distributed(edges_ds, ids_ds=None,
                                     max_iters: int = 64,
                                     small_cutoff: int = 2_000_000):
    """Distributed connected components over an edge Dataset (u, v) —
    alternating large-star / small-star (Kiveris et al., "Connected
    Components in MapReduce and Beyond", SoCC'14), which converges in
    O(log^2 n) rounds on any graph (union-find needs the whole edge set
    on one machine; plain min-label propagation needs O(diameter)
    rounds — a chain graph would never finish).

    Each iteration is two keyed shuffles over edge rows only.  Returns
    a Dataset (node, label) with label = component minimum; ``ids_ds``
    (single-column Dataset of node ids) adds singleton nodes to the
    output.  Use the driver-side ``connected_components`` when the pair
    set comfortably fits one machine — it's one pass, no shuffles."""
    import pandas as pd
    import pyarrow.compute as pc
    from ray.data.aggregate import Min

    from .joins import bucketed_hash_join

    schema = edges_ds.schema()
    node_t = schema.types[0] if schema is not None else pa.int64()
    empty = pa.table({"u": pa.array([], node_t), "v": pa.array([], node_t)})

    def sym(batch: pa.Table) -> pa.Table:
        return pa.table({
            "u": pa.concat_arrays([batch.column("u").combine_chunks(),
                                   batch.column("v").combine_chunks()]),
            "v": pa.concat_arrays([batch.column("v").combine_chunks(),
                                   batch.column("u").combine_chunks()]),
        })

    def orient(batch: pa.Table) -> pa.Table:
        u, v = batch.column("u"), batch.column("v")
        return pa.table({"u": pc.max_element_wise(u, v),
                         "v": pc.min_element_wise(u, v)})

    def _attach_min(edge_ds):
        """(u, v) edges + per-u neighbor minimum — the groupby is a
        NATIVE hash aggregate (not per-node map_groups: a 10^8-node
        graph would mean 10^8 tiny pandas groups) and the attach is the
        existing bucketed join; everything downstream is row-wise."""
        mins = edge_ds.groupby("u").aggregate(Min("v", alias_name="mn"))
        return bucketed_hash_join(edge_ds, mins, key="u",
                                  n_buckets=16), mins

    edge_schema = pa.schema([("u", node_t), ("v", node_t)])

    def large_star_rows(batch: pa.Table) -> pa.Table:
        # for each symmetric edge (u, v) with v > u: emit (v, m(u))
        # where m(u) = min(u, min-neighbor(u)).  The cast undoes the
        # join's pandas null-padding promotion (int64 → double).
        m = pc.min_element_wise(batch.column("u"), batch.column("mn"))
        keep = pc.greater(batch.column("v"), batch.column("u"))
        return (pa.table({"u": batch.column("v"), "v": m})
                .filter(keep).cast(edge_schema))

    def small_star_rows(batch: pa.Table) -> pa.Table:
        # oriented u > v: for each edge emit (v, m(u)) unless v == m(u)
        m = batch.column("mn")
        keep = pc.invert(pc.equal(batch.column("v"), m))
        return (pa.table({"u": batch.column("v"), "v": m})
                .filter(keep).cast(edge_schema))

    def mins_to_edges(batch: pa.Table) -> pa.Table:
        # small-star also links each node u to m(u) directly
        return pa.table({"u": batch.column("u"),
                         "v": batch.column("mn")}).cast(edge_schema)

    def checksum(ds):
        def partial(batch: pa.Table) -> pa.Table:
            hu = pd.util.hash_array(batch.column("u").to_pandas().to_numpy())
            hv = pd.util.hash_array(batch.column("v").to_pandas().to_numpy())
            with np.errstate(over="ignore"):
                s = int((hu * np.uint64(3) + hv).sum(dtype=np.uint64))
            return pa.table({"s": pa.array([s], pa.uint64()),
                             "n": pa.array([batch.num_rows], pa.int64())})
        df = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
        with np.errstate(over="ignore"):
            return (int(df["n"].sum()),
                    int(df["s"].to_numpy(dtype=np.uint64)
                        .sum(dtype=np.uint64)))

    def local_star(batch: pa.Table) -> pa.Table:
        """Per-block union-find contraction: replace the block's edges
        by its local spanning stars.  Python union-find is the per-task
        work (no vectorized form exists); it collapses each block's
        components to diameter 1, so the global loop needs ~log(#blocks)
        iterations instead of ~log(#nodes) — no driver state involved."""
        if batch.num_rows == 0:
            return empty
        parent: dict = {}

        def find(x):
            r = x
            while parent[r] != r:
                r = parent[r]
            while parent[x] != r:
                parent[x], x = r, parent[x]
            return r

        for u, v in zip(batch.column("u").to_pylist(),
                        batch.column("v").to_pylist()):
            if u not in parent:
                parent[u] = u
            if v not in parent:
                parent[v] = v
            ru, rv = find(u), find(v)
            if ru != rv:
                if rv < ru:
                    ru, rv = rv, ru
                parent[rv] = ru
        out_u = [x for x in parent if find(x) != x]
        out_v = [find(x) for x in out_u]
        return pa.table({"u": pa.array(out_u, node_t),
                         "v": pa.array(out_v, node_t)})

    edges = edges_ds.map_batches(local_star,
                                 batch_format="pyarrow").materialize()
    prev = None
    n_edges = edges.count()
    target_blocks = max(8, min(edges.num_blocks(), 64))
    converged = n_edges == 0
    if 0 < n_edges <= small_cutoff:
        # Small-input fast path: with every (already block-contracted)
        # edge in ONE block, the per-block union-find IS the global
        # contraction — its output stars point every node at its
        # component minimum, exactly the loop's fixpoint, in a single
        # task instead of ~log² n alternating-star rounds (each round
        # costs several all-to-alls; on a 500-node minhash cluster set
        # the loop spent 60 s reaching the state this computes in one).
        # The cutoff (~32 MB of int64 pairs) keeps the single task
        # comfortably inside a worker's heap; beyond it the loop is the
        # scale path, unchanged.
        edges = (edges.repartition(1)
                 .map_batches(local_star, batch_format="pyarrow",
                              batch_size=None)  # the WHOLE block, never split
                 .materialize())
        converged = True
        n_edges = 0  # skip the alternating-star loop below
    from ray.data.aggregate import Count

    def drop_count(batch: pa.Table) -> pa.Table:
        return batch.select(["u", "v"])

    for _ in range(max_iters if n_edges else 0):
        # large star (materialize the shared intermediates — both joins
        # consume their input twice via union branches; without this
        # each iteration re-executes its front half several times)
        symmed = edges.map_batches(sym, batch_format="pyarrow"
                                   ).repartition(target_blocks).materialize()
        joined, _ = _attach_min(symmed)
        large = (joined.map_batches(large_star_rows, batch_format="pyarrow")
                 .map_batches(orient, batch_format="pyarrow")
                 .repartition(target_blocks).materialize())
        # small star
        joined2, mins2 = _attach_min(large)
        # distinct edges (native hash aggregate — keeps the edge set
        # bounded and makes the fixpoint checksum well-defined; row
        # multiplicities would otherwise oscillate and never converge);
        # the repartition stops block counts compounding per iteration
        edges = (joined2.map_batches(small_star_rows, batch_format="pyarrow")
                 .union(mins2.map_batches(mins_to_edges,
                                          batch_format="pyarrow"))
                 .groupby(["u", "v"]).aggregate(Count(alias_name="__c"))
                 .map_batches(drop_count, batch_format="pyarrow")
                 .repartition(target_blocks)
                 .materialize())
        cur = checksum(edges)
        if cur == prev:
            converged = True
            break
        prev = cur
    if not converged:
        logger.warning("connected_components_distributed: no fixpoint "
                       "after %d iterations", max_iters)

    # final star edges (node → component min) + the roots themselves
    # (a component's min never appears as a source) + singletons
    def star_labels(b: pa.Table) -> pa.Table:
        u = b.column("u").combine_chunks()
        v = b.column("v").combine_chunks()
        return pa.table({"node": pa.concat_arrays([u, v]),
                         "label": pa.concat_arrays([v, v])})

    labels = edges.map_batches(star_labels, batch_format="pyarrow")
    if ids_ds is not None:
        id_name = ids_ds.schema().names[0]
        selfloops = ids_ds.map_batches(
            lambda b: pa.table({"node": b.column(id_name),
                                "label": b.column(id_name)}),
            batch_format="pyarrow")
        labels = labels.union(selfloops)
    return labels.groupby("node").aggregate(Min("label", alias_name="label"))


def connected_components(pairs, ids) -> dict:
    """Min-label union-find over near-dup pairs (driver-side: the pair
    set is small; ``connected_components_distributed`` is the scale
    path for edge sets beyond one machine)."""
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


def duplicate_span_stats(ds, n: int = 8, text_col: str = "text",
                         id_col: str = "doc_id", n_buckets: int = 32):
    """Span-level (cross-document) duplication signal — the
    exact-substring-dedup approximation on word ``n``-gram shingles
    (Lee et al., "Deduplicating Training Data Makes Language Models
    Better": repeated spans, not just repeated documents, degrade
    models).  Per document: the fraction of its ``n``-word windows
    whose shingle occurs ≥ 2 times ANYWHERE in the corpus (including
    elsewhere in the same document).

    Shape: explode (doc, shingle-md5) rows → ONE keyed Count shuffle →
    ``bucketed_hash_join`` back onto the rows → per-doc partial sums →
    tiny keyed Sum.  Shingle identity is its md5 (32-byte keys shuffle
    instead of raw spans; the same equality-by-digest contract the
    exact-dedup family uses).  Documents with < n words emit
    ``n_shingles = 0, dup_span_frac = 0``.

    Output: (doc_id, n_shingles, dup_span_frac[6 dp]).
    """
    import hashlib

    import pandas as pd
    from ray.data.aggregate import Count, Sum

    from .joins import bucketed_hash_join

    if n <= 0:
        raise ValueError("n must be positive")

    def shingle_rows(batch: pa.Table) -> pa.Table:
        ids_out, ghs = [], []
        ids = batch.column(id_col).to_pylist()
        for rid, t in zip(ids, batch.column(text_col).to_pylist()):
            words = (t or "").lower().split()
            for i in range(len(words) - n + 1):
                ids_out.append(rid)
                ghs.append(hashlib.md5(
                    " ".join(words[i:i + n]).encode()).hexdigest())
        return pa.table({id_col: pa.array(ids_out, pa.int64()),
                         "gh": pa.array(ghs, pa.string())})

    from .bucketing import key_buckets

    sh = ds.map_batches(shingle_rows, batch_format="pyarrow").materialize()

    # exact per-shingle counts via per-batch partials + ONE bucketed
    # shuffle (native groupby("gh").aggregate paid per-GROUP overhead:
    # one group per distinct shingle — the distinct_count lesson)
    def count_partial(b: pa.Table) -> pa.Table:
        u, c = np.unique(
            np.asarray(b.column("gh").to_pylist(), dtype=object),
            return_counts=True)
        return pa.table({"gh": pa.array(u, pa.string()),
                         "c": pa.array(c.astype(np.int64), pa.int64())})

    def fold_counts(g: pd.DataFrame) -> pd.DataFrame:
        return (g.groupby("gh", sort=False)["c"].sum()
                .astype("int64").reset_index())

    counts = (sh.map_batches(count_partial, batch_format="pyarrow")
              .map_batches(
                  tag_buckets_batch, batch_format="pyarrow",
                  fn_kwargs=dict(key_col="gh", n_buckets=n_buckets))
              .groupby("_b").map_groups(fold_counts,
                                        batch_format="pandas"))
    joined = bucketed_hash_join(sh, counts, key="gh",
                                n_buckets=n_buckets)

    def per_doc_partial(df: pd.DataFrame) -> pd.DataFrame:
        dup = (df["c"].to_numpy(dtype=np.int64) >= 2).astype(np.int64)
        g = (pd.DataFrame({id_col: df[id_col].to_numpy(),
                           "n_p": np.ones(len(dup), np.int64),
                           "d_p": dup})
             .groupby(id_col, sort=False).sum().reset_index())
        return g.astype({"n_p": "int64", "d_p": "int64"})

    def fold_doc(g: pd.DataFrame) -> pd.DataFrame:
        out = (g.groupby(id_col, sort=False)[["n_p", "d_p"]].sum()
               .astype("int64").reset_index()
               .rename(columns={"n_p": "n_sh", "d_p": "n_dup"}))
        return out

    stats = (joined.map_batches(per_doc_partial, batch_format="pandas")
             .map_batches(
                 tag_buckets_batch, batch_format="pyarrow",
                 fn_kwargs=dict(key_col=id_col, n_buckets=n_buckets))
             .groupby("_b").map_groups(fold_doc, batch_format="pandas"))

    all_ids = ds.map_batches(
        lambda b: pa.table({id_col: b.column(id_col)}),
        batch_format="pyarrow")
    full = bucketed_hash_join(all_ids, stats, key=id_col,
                              n_buckets=n_buckets, how="left")

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        n_sh = df["n_sh"].fillna(0).to_numpy(dtype=np.int64)
        n_dup = df["n_dup"].fillna(0).to_numpy(dtype=np.float64)
        frac = np.where(n_sh > 0, n_dup / np.maximum(n_sh, 1), 0.0)
        return pd.DataFrame({
            id_col: df[id_col].to_numpy(dtype=np.int64),
            "n_shingles": n_sh,
            "dup_span_frac": np.floor(frac * 1e6 + 0.5) / 1e6,
        })

    return full.map_batches(finish, batch_format="pandas")


_SPAN_POS_BITS = 20  # ≤ 2^20 words per document (asserted at explode)


def remove_duplicate_spans(ds, n: int = 8, text_col: str = "text",
                           id_col: str = "doc_id", n_buckets: int = 32):
    """Exact-substring deduplication as a TRANSFORM (the removal twin
    of ``duplicate_span_stats``): every word ``n``-gram window that
    occurs ≥ 2 times anywhere in the corpus is removed from every
    occurrence EXCEPT the globally-first one (min (doc_id, pos)) —
    Lee et al.'s keep-one-copy rule.  A word is dropped iff some
    removed window covers it; surviving words are re-joined with
    single spaces.

    Shape: explode (doc_id, pos, shingle-md5) rows → one keyed
    Count+Min shuffle per shingle (count + canonical first occurrence
    in the same aggregate — no second pass) → filter to duplicated
    shingles only → ``bucketed_hash_join`` back (the joined side holds
    ONLY duplicated windows, a small fraction of the corpus) →
    per-doc removed-window lists → bucketed left join onto the docs →
    vectorized per-row rebuild.  Shingle identity is md5 over the
    lowercased window (equality-by-digest, same contract as
    ``duplicate_span_stats``); removal positions index the ORIGINAL
    ``str.split()`` words, so casing/punctuation survive in kept text.

    Output: (doc_id, clean_text, n_words, n_removed_words).
    Documents with < n words pass through unchanged.
    """
    import hashlib

    import pandas as pd
    from ray.data.aggregate import Count, Min

    from .joins import bucketed_hash_join

    if n <= 0:
        raise ValueError("n must be positive")

    def shingle_rows(batch: pa.Table) -> pa.Table:
        ids_out, poss, ghs, owners = [], [], [], []
        ids = batch.column(id_col).to_pylist()
        for rid, t in zip(ids, batch.column(text_col).to_pylist()):
            words = (t or "").lower().split()
            if len(words) >= (1 << _SPAN_POS_BITS):
                raise ValueError(
                    f"document {rid} exceeds 2^{_SPAN_POS_BITS} words; "
                    "raise _SPAN_POS_BITS (owner key packs doc_id and "
                    "pos into one int64)")
            for i in range(len(words) - n + 1):
                ids_out.append(rid)
                poss.append(i)
                ghs.append(hashlib.md5(
                    " ".join(words[i:i + n]).encode()).hexdigest())
                owners.append((rid << _SPAN_POS_BITS) | i)
        return pa.table({id_col: pa.array(ids_out, pa.int64()),
                         "pos": pa.array(poss, pa.int64()),
                         "gh": pa.array(ghs, pa.string()),
                         "owner": pa.array(owners, pa.int64())})

    sh = ds.map_batches(shingle_rows, batch_format="pyarrow").materialize()
    agg = sh.groupby("gh").aggregate(Count(alias_name="c"),
                                     Min("owner", alias_name="first_owner"))

    def dup_only(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return batch.filter(pc.greater_equal(batch.column("c"), 2))

    dups = agg.map_batches(dup_only, batch_format="pyarrow")
    joined = bucketed_hash_join(sh, dups, key="gh", n_buckets=n_buckets)

    def removed_rows(df: pd.DataFrame) -> pd.DataFrame:
        keep = df["owner"].to_numpy(np.int64) != df["first_owner"].to_numpy(
            np.int64)
        return pd.DataFrame({
            id_col: df[id_col].to_numpy(np.int64)[keep],
            "pos": df["pos"].to_numpy(np.int64)[keep],
        })

    def collect_starts(df: pd.DataFrame) -> pa.Table:
        # starts travel as a comma-joined STRING, not list<int64>:
        # pandas blocks of equal-length list cells trip Ray's automatic
        # TensorArray cast inside the join's fused output buffer, and
        # object-of-list columns defeat schema inference — a scalar
        # string column does neither and shuffles compactly
        starts = ",".join(str(int(p)) for p in sorted(df["pos"]))
        return pa.table({
            id_col: pa.array([int(df[id_col].iloc[0])], pa.int64()),
            "starts": pa.array([starts], pa.string()),
        })

    removed = (joined.map_batches(removed_rows, batch_format="pandas")
               .groupby(id_col).map_groups(collect_starts,
                                           batch_format="pandas"))
    # a corpus with zero duplicated spans leaves `removed` fully empty
    # (schema unknown → the join can't plan); a sentinel row under an
    # impossible doc_id pins the schema and never matches a real doc
    import ray.data as rd
    sentinel = rd.from_arrow(pa.table({
        id_col: pa.array([-1], pa.int64()),
        "starts": pa.array([""], pa.string()),
    }))
    removed = removed.union(sentinel)
    docs = ds.map_batches(
        lambda b: b.select([id_col, text_col]), batch_format="pyarrow")
    full = bucketed_hash_join(docs, removed, key=id_col,
                              n_buckets=n_buckets, how="left")

    def rebuild(df: pd.DataFrame) -> pd.DataFrame:
        out_ids, texts, n_words_col, n_removed = [], [], [], []
        for rid, text, starts in zip(df[id_col], df[text_col],
                                     df["starts"]):
            words = (text or "").split()
            if isinstance(starts, str) and starts:
                cover = np.zeros(len(words), dtype=bool)
                for s in starts.split(","):
                    cover[int(s):int(s) + n] = True
                kept = [w for w, c in zip(words, cover) if not c]
                removed_count = int(cover.sum())
            else:  # NaN (no removed spans joined) or empty string
                kept = words
                removed_count = 0
            out_ids.append(np.int64(rid))
            texts.append(" ".join(kept))
            n_words_col.append(len(words))
            n_removed.append(removed_count)
        return pd.DataFrame({id_col: out_ids, "clean_text": texts,
                             "n_words": n_words_col,
                             "n_removed_words": n_removed})

    return full.map_batches(rebuild, batch_format="pandas")


def _hamming1_pairs_block(texts: np.ndarray, chunk: int = 256):
    """All (i, j) i<j index pairs of equal-length ``texts`` differing in
    at most one byte position — vectorized and CHUNKED so memory stays
    O(chunk × n × L) however large a band gets (time is the quadratic
    cost a degenerate band pays; the cap below bounds it)."""
    n = len(texts)
    if n < 2:
        return []
    length = len(texts[0])
    arr = np.frombuffer("".join(texts).encode("ascii"),
                        dtype=np.uint8).reshape(n, length)
    out = []
    for lo in range(0, n, chunk):
        hi = min(lo + chunk, n)
        # (hi-lo, n, L) mismatch counts against every string
        d = (arr[lo:hi, None, :] != arr[None, :, :]).sum(axis=2)
        rows, cols = np.nonzero(d <= 1)
        for r, c in zip(rows, cols):
            i = lo + int(r)
            if i < c:
                out.append((i, int(c)))
    return out


def edit1_similar_pairs(ds, text_col: str = "c_name",
                        n_buckets: int = 64,
                        bucket_cap: int = DEFAULT_BUCKET_CAP,
                        cap_stats=None):
    """Exact string-similarity self-join: all DISTINCT value pairs of
    equal length at levenshtein distance ≤ 1 (a < b) — the PassJoin
    blocking scheme (public: Li/Deng/Feng, "PASS-JOIN: a partition-
    based method for similarity joins", VLDB 2012) specialized to one
    edit.

    Completeness argument: equal-length strings at edit distance 1
    necessarily differ by ONE substitution, so they agree exactly on
    whichever half does not hold the mismatch — banding every value by
    (len, 0, first-half) and (len, 1, second-half) therefore catches
    every qualifying pair, and catches it exactly once (agreeing on
    BOTH halves would make the strings equal, which ``a < b``
    excludes), so no pair-dedup pass is needed.

    Scale shape: two slim band rows per distinct value, one bucketed
    shuffle on hash(band); inside a band the verify is chunked
    vectorized byte-hamming (O(chunk · n · L) memory).  A degenerate
    band (huge shared prefix) pays quadratic TIME, so ``bucket_cap``
    bounds it with CapStats-accounted drops — exactness-critical
    callers (the DuckDB-oracled query) raise the cap instead.  ASCII
    contract: lengths and positions are bytes (documented, like the
    heavy-hitter tokenizer); non-ASCII input raises.
    """
    import pandas as pd

    from .bucketing import key_buckets

    def bands(df: "pd.DataFrame") -> "pd.DataFrame":
        texts = df[text_col].dropna().unique()
        band_keys, vals = [], []
        for t in texts:
            half = len(t) // 2
            band_keys.append(f"{len(t)}:0:{t[:half]}")
            vals.append(t)
            band_keys.append(f"{len(t)}:1:{t[half:]}")
            vals.append(t)
        return pd.DataFrame({"_band": band_keys, "_val": vals})

    def verify(g: "pd.DataFrame") -> "pd.DataFrame":
        a_out, b_out = [], []
        for _, grp in g.groupby("_band", sort=False):
            texts = np.unique(grp["_val"].to_numpy())
            if len(texts) > bucket_cap:
                dropped = (len(texts) * (len(texts) - 1)
                           - bucket_cap * (bucket_cap - 1)) // 2
                if cap_stats is not None:
                    import ray
                    ray.get(cap_stats.add.remote(dropped))
                texts = texts[:bucket_cap]
            for i, j in _hamming1_pairs_block(texts):
                lo, hi = sorted((texts[i], texts[j]))
                a_out.append(lo)
                b_out.append(hi)
        return pd.DataFrame({"name_a": np.asarray(a_out, dtype=object),
                             "name_b": np.asarray(b_out, dtype=object)})

    banded = ds.map_batches(bands, batch_format="pandas")
    tagged = banded.map_batches(
        tag_buckets_batch, batch_format="pyarrow",
        fn_kwargs=dict(key_col="_band", n_buckets=n_buckets))
    # No distinct pass needed downstream: a qualifying pair shares
    # exactly ONE band (see completeness argument), all copies of a
    # value land in that one band group, and the in-group np.unique
    # collapses cross-batch repeats — so each pair is emitted exactly
    # once globally (asserted by test_edit1_pairs_no_duplicates).
    return tagged.groupby("_b").map_groups(verify, batch_format="pandas")


def source_dedup_yield(ds, text_col: str = "text",
                       id_col: str = "doc_id",
                       source_col: str = "source",
                       n_buckets: int = 64):
    """Per-source exact-dedup yield — the curation question "which
    sources are mostly copies of things we already have": per source,
    total documents, documents surviving keep-min-id exact dedup, and
    the survival fraction in micro-units.

    Shape: one bucketed ``hash(md5) % B`` fold picks each digest's
    min-id winner AND collapses winners to per-source partial counts
    inside the bucket (so the second shuffle carries O(B × sources)
    rows, not O(survivors)); totals ride the same per-batch combiner
    pattern; a final native groupby over the bounded source set joins
    the two.  Output: (source, n_docs, n_unique, yield_micro), sorted
    upstream by the caller.
    """
    import pandas as pd
    from ray.data.aggregate import Sum

    from .bucketing import key_buckets
    from .text import add_text_hash_batch

    hashed = (ds.map_batches(add_text_hash_batch, batch_format="pyarrow",
                             fn_kwargs=dict(text_col=text_col))
              .select_columns(["text_md5", id_col, source_col])
              .materialize())

    def winners_per_source(df: "pd.DataFrame") -> "pd.DataFrame":
        df = df.sort_values(["text_md5", id_col], kind="mergesort")
        w = df.drop_duplicates("text_md5", keep="first")
        out = (w.groupby(source_col, sort=False).size()
               .rename("n_unique").astype("int64").reset_index())
        out["n_docs"] = np.int64(0)
        return out[[source_col, "n_docs", "n_unique"]]

    surv = (hashed.map_batches(
        lambda df: df.assign(_hb=key_buckets(df["text_md5"].to_numpy(),
                                             n_buckets)),
        batch_format="pandas")
        .groupby("_hb").map_groups(winners_per_source,
                                   batch_format="pandas"))

    def totals(df: "pd.DataFrame") -> "pd.DataFrame":
        out = (df.groupby(source_col, sort=False).size()
               .rename("n_docs").astype("int64").reset_index())
        out["n_unique"] = np.int64(0)
        return out[[source_col, "n_docs", "n_unique"]]

    tot = hashed.map_batches(totals, batch_format="pandas")

    def finish(b: pa.Table) -> pa.Table:
        nd = b.column("n_docs").to_numpy(zero_copy_only=False)
        nu = b.column("n_unique").to_numpy(zero_copy_only=False)
        y = np.floor(1e6 * nu / np.maximum(nd, 1) + 0.5).astype(np.int64)
        return pa.table({source_col: b.column(source_col),
                         "n_docs": pa.array(nd, pa.int64()),
                         "n_unique": pa.array(nu, pa.int64()),
                         "yield_micro": pa.array(y, pa.int64())})

    return (surv.union(tot)
            .groupby(source_col)
            .aggregate(Sum("n_docs", alias_name="n_docs"),
                       Sum("n_unique", alias_name="n_unique"))
            .map_batches(finish, batch_format="pyarrow"))


def dup_cluster_stats(ds, text_col: str = "text", id_col: str = "doc_id",
                      source_col: str = "source", n_buckets: int = 64):
    """Per-duplicate-cluster panel: for every exact-text cluster with
    ≥ 2 copies — copy count, distinct sources it spans, min/max doc id
    (provenance spread: a cluster spanning many sources is syndicated
    boilerplate; one source repeating itself is a scraper loop).

    Shape: (md5, source, id) rows → ONE bucketed md5 fold (each
    digest entirely in one bucket) emitting only multi-copy clusters.
    Output: (text_md5, n_copies, n_sources, min_doc, max_doc).
    """
    import pandas as pd

    from .bucketing import key_buckets
    from .text import add_text_hash_batch

    hashed = (ds.map_batches(add_text_hash_batch, batch_format="pyarrow",
                             fn_kwargs=dict(text_col=text_col))
              .select_columns(["text_md5", id_col, source_col]))

    def fold(g: "pd.DataFrame") -> "pd.DataFrame":
        a = (g.groupby("text_md5", sort=False)
             .agg(n_copies=(id_col, "size"),
                  n_sources=(source_col, "nunique"),
                  min_doc=(id_col, "min"), max_doc=(id_col, "max"))
             .reset_index())
        a = a[a["n_copies"] >= 2]
        return a.astype({"n_copies": "int64", "n_sources": "int64",
                         "min_doc": "int64", "max_doc": "int64"})

    tagged = hashed.map_batches(
        tag_buckets_batch, batch_format="pyarrow",
        fn_kwargs=dict(key_col="text_md5", n_buckets=n_buckets))
    return (tagged.groupby("_b")
            .map_groups(lambda g: fold(g.drop(columns=["_b"])),
                        batch_format="pandas"))


_ASCII_WORD_RE = re.compile(r"[a-z0-9]+")


def setsim_join(ds, text_col: str = "text", id_col: str = "doc_id",
                tau_micro: int = 500000, n_buckets: int = 64,
                n_pair_buckets: int = 64, as_dataset: bool = False,
                small_cutoff: int = 2_000):
    """EXACT all-pairs set-similarity self-join: every document pair
    whose word-set Jaccard is ≥ ``tau_micro/1e6``, found via
    prefix filtering with a rarest-first global token order (the
    AllPairs/PPJoin family — Bayardo et al. WWW'07, public) — the
    exact complement of the approximate ``minhash_near_dup_pairs``
    (recall 1.0 by construction, no banding misses).

    Tokens are ASCII ``[a-z0-9]+`` runs of ``lower(text)`` (explicit
    ASCII contract so the SQL twin's ``regexp_extract_all`` tokenizes
    identically — the \\w-vs-SQL divergence trap of ADVICE r03);
    the set is the DISTINCT words per doc, as strings end-to-end (no
    hash-collision caveat anywhere).

    Prefix theorem: under ANY consistent total token order, two sets
    with overlap ≥ α share a token in their (n−α+1)-prefixes; Jaccard
    ≥ τ implies overlap ≥ ceil(τ·n) for each side, so grouping on
    prefix tokens generates every qualifying pair.  Rarest-first
    (df asc) makes prefixes land on rare tokens, collapsing the hot
    groups a random order would create on Zipfian text.

    Scale shape — token-scale rows, never the corpus cross-product:
    tokenize → ONE keyed Count (df) → df attaches back via
    ``bucketed_hash_join`` on token → per-doc-bucket vectorized prefix
    cut (cumcount < n−ceil(τn)+1) → per-token-bucket self-merge with
    the ``1e6·n_min ≥ τ_micro·n_max`` length prune → native pair
    dedup → texts attach once (``explode_pairs`` +
    ``bucketed_hash_join``, the minhash verify pattern) → per
    pair-bucket exact verify, each distinct doc tokenized once.  The
    integer gate ``1e6·inter ≥ τ_micro·union`` avoids any float
    boundary; ``jac_micro = (2e6·inter + union) // (2·union)`` is
    half-up exact.  Worst case remains Θ(true result + hot-prefix
    candidates) — inherent to exact joins; cap candidates upstream
    (e.g. pre-collapse exact dups) when the corpus is boilerplate-heavy.

    Corpora of ≤ ``small_cutoff`` docs run the whole join as ONE
    off-driver task (``repartition(1)`` + whole-block ``map_batches``,
    the per-group-overhead rule) — same result, pinned by a
    path-equality test; pass ``small_cutoff=0`` to force the
    distributed path.

    Output: (a, b, inter_n, union_n, jac_micro) with a < b, pandas
    sorted by (a, b) — or the Dataset itself with ``as_dataset=True``.
    """
    import pandas as pd
    import ray.data as rd
    from ray.data.aggregate import Count

    from .bucketing import key_buckets
    from .joins import bucketed_hash_join

    if not 0 < tau_micro <= 1_000_000:
        raise ValueError(f"tau_micro must be in (0, 1e6], got {tau_micro}")

    ds = ds.materialize()
    if 0 < ds.count() <= small_cutoff:
        def local_setsim(batch: pa.Table) -> pa.Table:
            ids, toks = [], []
            for i, t in zip(batch.column(id_col).to_pylist(),
                            batch.column(text_col).to_pylist()):
                ws = set(_ASCII_WORD_RE.findall((t or "").lower()))
                ids.extend([i] * len(ws))
                toks.extend(ws)
            tok = pd.DataFrame({"d": np.asarray(ids, np.int64),
                                "t": pd.factorize(np.asarray(
                                    toks, dtype=object))[0]})
            n = tok.groupby("d").size().rename("n")
            m = tok.merge(tok, on="t")
            m = m[m["d_x"] < m["d_y"]]
            c = (m.groupby(["d_x", "d_y"], sort=False).size()
                 .rename("inter_n").reset_index())
            c = (c.merge(n.rename("n_a"), left_on="d_x", right_index=True)
                 .merge(n.rename("n_b"), left_on="d_y", right_index=True))
            inter = c["inter_n"].to_numpy(np.int64)
            union = (c["n_a"] + c["n_b"]).to_numpy(np.int64) - inter
            keep = 1_000_000 * inter >= np.int64(tau_micro) * union
            a = c["d_x"].to_numpy(np.int64)[keep]
            b = c["d_y"].to_numpy(np.int64)[keep]
            inter, union = inter[keep], union[keep]
            order = np.lexsort((b, a))
            return pa.table({
                "a": pa.array(a[order], pa.int64()),
                "b": pa.array(b[order], pa.int64()),
                "inter_n": pa.array(inter[order], pa.int64()),
                "union_n": pa.array(union[order], pa.int64()),
                "jac_micro": pa.array(
                    ((2_000_000 * inter[order] + union[order])
                     // (2 * union[order])), pa.int64()),
            })

        out_ds = (ds.repartition(1)
                  .map_batches(local_setsim, batch_format="pyarrow",
                               batch_size=None))
        if as_dataset:
            return out_ds
        out = out_ds.to_pandas().reset_index(drop=True)
        if out.empty:  # empty to_pandas drops the schema — rebuild it
            out = pd.DataFrame({c: pd.Series(dtype="int64") for c in
                                ["a", "b", "inter_n", "union_n",
                                 "jac_micro"]})
        return out

    def tokenize(batch: pa.Table) -> pa.Table:
        ids, toks, ns = [], [], []
        for i, t in zip(batch.column(id_col).to_pylist(),
                        batch.column(text_col).to_pylist()):
            ws = sorted(set(_ASCII_WORD_RE.findall((t or "").lower())))
            ids.extend([i] * len(ws))
            toks.extend(ws)
            ns.extend([len(ws)] * len(ws))
        return pa.table({id_col: pa.array(ids, pa.int64()),
                         "tok": pa.array(toks, pa.string()),
                         "n_tok": pa.array(ns, pa.int64())})

    toks = ds.map_batches(tokenize, batch_format="pyarrow")
    dfreq = (toks.groupby("tok").aggregate(Count(alias_name="df"))
             .map_batches(lambda b: b.select(["tok", "df"]),
                          batch_format="pyarrow"))
    with_df = bucketed_hash_join(
        toks, dfreq, key="tok", n_buckets=n_buckets)

    def prefix_cut(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([id_col, "df", "tok"], kind="mergesort")
        n = g["n_tok"].to_numpy(np.int64)
        alpha = (np.int64(tau_micro) * n + 999_999) // 1_000_000
        pos = g.groupby(id_col, sort=False).cumcount().to_numpy()
        keep = pos < (n - alpha + 1)
        return g.loc[keep, ["tok", id_col, "n_tok"]]

    prefixes = (with_df.map_batches(
        lambda df: df.assign(_db=key_buckets(df[id_col].to_numpy(),
                                             n_buckets)),
        batch_format="pandas")
        .groupby("_db").map_groups(
            lambda g: prefix_cut(g.drop(columns=["_db"])),
            batch_format="pandas"))

    def candidates(g: pd.DataFrame) -> pd.DataFrame:
        m = g.merge(g, on="tok")
        m = m[m[f"{id_col}_x"] < m[f"{id_col}_y"]]
        n_lo = np.minimum(m[f"n_tok_x"].to_numpy(np.int64),
                          m[f"n_tok_y"].to_numpy(np.int64))
        n_hi = np.maximum(m[f"n_tok_x"].to_numpy(np.int64),
                          m[f"n_tok_y"].to_numpy(np.int64))
        m = m[1_000_000 * n_lo >= np.int64(tau_micro) * n_hi]
        out = m[[f"{id_col}_x", f"{id_col}_y"]].drop_duplicates()
        return (out.rename(columns={f"{id_col}_x": "a",
                                    f"{id_col}_y": "b"})
                .astype({"a": "int64", "b": "int64"}))

    pairs = (prefixes.map_batches(
        lambda df: df.assign(_tb=key_buckets(df["tok"].to_numpy(),
                                             n_buckets)),
        batch_format="pandas")
        .groupby("_tb").map_groups(
            lambda g: candidates(g.drop(columns=["_tb"])),
            batch_format="pandas")
        .groupby(["a", "b"]).aggregate(Count(alias_name="__c"))
        .map_batches(lambda b: b.select(["a", "b"]),
                     batch_format="pyarrow"))

    def _empty():
        frame = pd.DataFrame({
            "a": pd.Series(dtype="int64"), "b": pd.Series(dtype="int64"),
            "inter_n": pd.Series(dtype="int64"),
            "union_n": pd.Series(dtype="int64"),
            "jac_micro": pd.Series(dtype="int64")})
        return rd.from_pandas(frame) if as_dataset else frame

    pairs = pairs.materialize()
    if pairs.count() == 0:
        return _empty()

    def explode_pairs(batch: pa.Table) -> pa.Table:
        a = batch.column("a").combine_chunks().to_numpy(
            zero_copy_only=False)
        b = batch.column("b").combine_chunks().to_numpy(
            zero_copy_only=False)
        pb = pair_bucket_ids(a, b, n_pair_buckets)
        return pa.table({
            "a": np.concatenate([a, a]),
            "b": np.concatenate([b, b]),
            "pb": np.concatenate([pb, pb]),
            id_col: np.concatenate([a, b]),
        })

    exploded = pairs.map_batches(explode_pairs, batch_format="pyarrow")
    docs = ds.map_batches(
        lambda b: b.select([id_col, text_col]), batch_format="pyarrow")
    joined = bucketed_hash_join(exploded, docs, key=id_col, n_buckets=16)

    def verify_bucket(df: pd.DataFrame) -> pd.DataFrame:
        uniq = df.drop_duplicates(subset=[id_col])
        sets = {i: set(_ASCII_WORD_RE.findall((t or "").lower()))
                for i, t in zip(uniq[id_col], uniq[text_col])}
        rows = []
        for a_id, b_id in zip(*(df[["a", "b"]].drop_duplicates()
                                [c] for c in ("a", "b"))):
            sa, sb = sets.get(a_id), sets.get(b_id)
            if not sa or not sb:
                continue
            inter = len(sa & sb)
            union = len(sa) + len(sb) - inter
            if 1_000_000 * inter >= tau_micro * union:
                rows.append((a_id, b_id, inter, union,
                             (2_000_000 * inter + union) // (2 * union)))
        cols = ["a", "b", "inter_n", "union_n", "jac_micro"]
        return pd.DataFrame(rows, columns=cols).astype(
            {c: "int64" for c in cols})

    verified = joined.groupby("pb").map_groups(verify_bucket,
                                               batch_format="pandas")
    if as_dataset:
        return verified
    out = verified.to_pandas()  # O(result): qualifying pairs only
    if out.empty:
        return _empty()
    return out.sort_values(["a", "b"]).reset_index(drop=True)

"""Training-set preparation operators: benchmark decontamination,
sequence packing, stratified sampling, aspect-ratio bucketing.

These extend the reference's surface with the corpus-prep steps a
large-scale training pipeline runs after crawl/convert/dedup
(SURVEY.md lists dedup/quality/token-counting as the graft's
training-data family; this module is the next stage of that family).
All operators stream: the only driver-resident state is the SMALL
side of each problem (a benchmark n-gram set, O(buckets) partial
sums, a per-stratum rate table), broadcast once via ``ray.put``.
"""

from __future__ import annotations

import hashlib
from typing import Mapping, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa

from markdown_lab_ray.stages.bucketing import key_buckets as _key_buckets, tag_buckets_batch

__all__ = [
    "decontaminate",
    "pack_sequences",
    "stratified_sample",
    "aspect_bucket_batch",
    "percentile_gate",
    "tfidf_top_terms",
    "inverted_index",
    "cap_per_key",
]


# ---------------------------------------------------------------------------
# benchmark decontamination
# ---------------------------------------------------------------------------

def _ngrams(text: str, n: int) -> set[str]:
    """Distinct word n-grams of the lowercased whitespace tokenization.

    Tokenizer parity with the DuckDB oracle:
    ``list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x <> '')``
    equals ``text.lower().split()`` on ASCII-whitespace corpora.
    """
    toks = (text or "").lower().split()
    if len(toks) < n:
        return set()
    return {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}


def decontaminate(corpus_ds, ref_ds, n: int = 5, text_col: str = "text",
                  id_col: str = "doc_id", out_col: str = "n_hits",
                  project: bool = True):
    """Benchmark decontamination: per corpus document, the number of
    distinct word ``n``-grams it shares with ANY document of the
    (small) reference/benchmark set.  ``out_col > 0`` ⇒ contaminated.

    Scale shape: the reference side is a benchmark suite — a few MB
    against a 100-TB corpus — so its distinct n-gram set is collected
    once (per-batch dedup first, so the driver unions pre-deduped
    sets) and broadcast via ``ray.put``; the corpus side is a single
    stateless ``map_batches`` pass, no shuffle.  If the reference set
    ever outgrows broadcast, the same semantics fall back to
    ``bucketed_semi_join`` on exploded (gram, doc) rows — not needed
    for benchmark-sized references.
    """
    import ray
    import ray.data  # noqa: F401  (ensures Dataset type is loaded)

    def ref_grams_batch(batch: pa.Table) -> pa.Table:
        grams: set[str] = set()
        for t in batch.column(text_col).to_pylist():
            grams |= _ngrams(t, n)
        return pa.table({"gram": pa.array(sorted(grams), pa.string())})

    ref_set: set[str] = set()
    for b in (ref_ds.map_batches(ref_grams_batch, batch_format="pyarrow")
              .iter_batches(batch_format="pyarrow")):
        ref_set.update(b.column("gram").to_pylist())
    ref_handle = ray.put(frozenset(ref_set))

    def count_hits(batch: pa.Table, ref) -> pa.Table:
        grams_ref = ray.get(ref)
        hits = [np.int64(sum(g in grams_ref for g in _ngrams(t, n)))
                for t in batch.column(text_col).to_pylist()]
        hit_col = pa.array(hits, pa.int64())
        if not project:  # keep all input columns (pipeline composition)
            return batch.append_column(out_col, hit_col)
        return pa.table({
            id_col: batch.column(id_col),
            out_col: hit_col,
        })

    return corpus_ds.map_batches(count_hits, batch_format="pyarrow",
                                 fn_kwargs=dict(ref=ref_handle))


# ---------------------------------------------------------------------------
# sequence packing (distributed prefix scan)
# ---------------------------------------------------------------------------

def pack_sequences(ds, budget: int, id_col: str = "doc_id",
                   token_col: str = "n_tokens",
                   pack_col: str = "pack_id",
                   bucket_width: int = 4096):
    """Greedy streaming sequence packing: documents in ``id_col`` order
    are concatenated into fixed-token-budget packs; a document's pack is
    ``floor(exclusive_prefix_sum(tokens) / budget)`` (documents are
    never split; a pack may overflow by at most one document — the
    standard "concat then chunk by offset" packing used for LLM
    pretraining shards).

    Distributed prefix scan, two passes over (id, tokens) rows only:
      1. per-batch partial sums per id-range bucket
         (``id // bucket_width``) → driver exclusive scan over the
         O(buckets) totals → broadcast offsets;
      2. one ``groupby(bucket)`` shuffle; each group sorts by id,
         local cumsum + its bucket's offset → pack id.
    Driver memory is O(buckets) = O(id_range / bucket_width), never
    O(rows).  Ids need not be dense — sparse ranges only make buckets
    uneven.
    """
    import ray

    if budget <= 0:
        raise ValueError("budget must be positive")

    def project(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        return pa.table({
            id_col: pa.array(ids, pa.int64()),
            token_col: batch.column(token_col).cast(pa.int64()),
            "_bucket": pa.array(ids // bucket_width, pa.int64()),
        })

    # narrow 3-int-column projection; pinned because both the partial
    # pass and the groupby consume it (unmaterialized datasets
    # re-execute their upstream per consumer)
    slim = ds.map_batches(project, batch_format="pyarrow").materialize()

    def bucket_partials(batch: pa.Table) -> pa.Table:
        df = batch.select(["_bucket", token_col]).to_pandas()
        g = df.groupby("_bucket", sort=False)[token_col].sum()
        return pa.table({"_bucket": pa.array(g.index.to_numpy(), pa.int64()),
                         "_sum": pa.array(g.to_numpy(), pa.int64())})

    totals: dict[int, int] = {}
    for b in (slim.map_batches(bucket_partials, batch_format="pyarrow")
              .iter_batches(batch_format="pyarrow")):
        for k, v in zip(b.column("_bucket").to_pylist(),
                        b.column("_sum").to_pylist()):
            totals[k] = totals.get(k, 0) + v
    if not totals:  # empty input: typed empty result, not schema-less
        import ray.data as rd
        return rd.from_arrow(pa.table({
            id_col: pa.array([], pa.int64()),
            token_col: pa.array([], pa.int64()),
            pack_col: pa.array([], pa.int64()),
        }))
    offsets: dict[int, int] = {}
    running = 0
    for k in sorted(totals):
        offsets[k] = running
        running += totals[k]
    offsets_handle = ray.put(offsets)

    def assign(g: pd.DataFrame, offs) -> pd.DataFrame:
        import ray as _ray
        base = _ray.get(offs)[int(g["_bucket"].iloc[0])]
        g = g.sort_values(id_col, kind="mergesort")
        toks = g[token_col].to_numpy(dtype=np.int64)
        excl = base + np.concatenate(([0], np.cumsum(toks)[:-1]))
        return pd.DataFrame({
            id_col: g[id_col].to_numpy(),
            token_col: toks,
            pack_col: (excl // budget).astype(np.int64),
        })

    return (slim.groupby("_bucket")
            .map_groups(assign, batch_format="pandas",
                        fn_kwargs=dict(offs=offsets_handle)))


# ---------------------------------------------------------------------------
# stratified sampling
# ---------------------------------------------------------------------------

def stratified_sample(ds, rates: Mapping[str, float], key_col: str,
                      id_col: str):
    """Deterministic per-stratum Bernoulli sample: a row survives iff
    the first 8 hex chars of ``md5(str(id))`` fall below its stratum's
    rate threshold.  Content-addressed — stable under repartitioning,
    resume, and re-runs (the same trick as the train/val/test split);
    SQL-replicable via ``substr(md5(CAST(id AS VARCHAR)),1,8)``.
    Pure filter map — no shuffle; the rate table is a broadcast-size
    parameter.  Strata absent from ``rates`` are dropped (rate 0)."""
    thresholds = {k: format(min(int(r * 16**8), 16**8), "08x")
                  if r < 1.0 else "g" * 8  # > 'ffffffff' ⇒ keep all
                  for k, r in rates.items()}

    def keep(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        keys = batch.column(key_col).to_pylist()
        mask = np.zeros(len(ids), dtype=bool)
        for i, (rid, k) in enumerate(zip(ids, keys)):
            thr = thresholds.get(k)
            if thr is None:
                continue
            h = hashlib.md5(str(rid).encode()).hexdigest()[:8]
            mask[i] = h < thr
        return batch.filter(pa.array(mask))

    return ds.map_batches(keep, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# per-key percentile gate
# ---------------------------------------------------------------------------

def percentile_gate(ds, value_col: str, key_col: str, q: float = 0.5):
    """Keep rows whose ``value_col`` is ≥ their key's ``q``-th
    discrete percentile (SQL ``PERCENTILE_DISC(q)``: the smallest
    value whose cumulative count reaches ``ceil(q·n)``) — e.g. "keep
    documents above their language's median quality".

    Exact AND scale-safe: values are expected pre-quantized (the
    quality score is 6-dp-rounded ⇒ ≤ 10^6+1 distinct values), so the
    full per-key distribution compresses to (key, value, count) rows —
    one keyed aggregate shuffle of partials, then a per-key group fn
    emits one threshold row.  Thresholds (O(keys) rows) broadcast via
    ``ray.put``; the gate itself is a stateless filter pass.  Raw rows
    are read twice (aggregate pass + filter pass) but never shuffled.
    """
    import ray
    from ray.data.aggregate import Count

    if not (0.0 < q <= 1.0):
        raise ValueError("q must be in (0, 1]")

    dist = ds.groupby([key_col, value_col]).aggregate(
        Count(alias_name="_n"))

    def threshold(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(value_col, kind="mergesort")
        counts = g["_n"].to_numpy(dtype=np.int64)
        total = int(counts.sum())
        pos = int(np.ceil(q * total))  # 1-based rank, PERCENTILE_DISC
        idx = int(np.searchsorted(np.cumsum(counts), pos))
        return pd.DataFrame({key_col: g[key_col].iloc[:1].to_numpy(),
                             "_thr": [g[value_col].iloc[idx]]})

    thr_rows = (dist.groupby(key_col)
                .map_groups(threshold, batch_format="pandas")
                .take_all())
    thresholds = {r[key_col]: r["_thr"] for r in thr_rows}
    thr_handle = ray.put(thresholds)

    def gate(batch: pa.Table, thr) -> pa.Table:
        import ray as _ray
        t = _ray.get(thr)
        keys = batch.column(key_col).to_pandas()
        vals = batch.column(value_col).to_numpy(zero_copy_only=False)
        # unseen keys map to NaN → comparison False → row dropped
        thr_vals = keys.map(t).to_numpy(dtype=np.float64, na_value=np.nan)
        mask = vals.astype(np.float64) >= thr_vals
        return batch.filter(pa.array(mask))

    return ds.map_batches(gate, batch_format="pyarrow",
                          fn_kwargs=dict(thr=thr_handle))


# ---------------------------------------------------------------------------
# distributed TF-IDF + inverted index
# ---------------------------------------------------------------------------

def _term_freq_batch(batch: pa.Table, text_col: str = "text",
                     id_col: str = "doc_id") -> pa.Table:
    """Tokenize (lowercased whitespace split) → one (doc, term, tf)
    row per distinct term per document."""
    ids_out: list = []
    terms_out: list[str] = []
    tfs_out: list[int] = []
    ids = batch.column(id_col).to_pylist()
    for rid, t in zip(ids, batch.column(text_col).to_pylist()):
        counts: dict[str, int] = {}
        for w in (t or "").lower().split():
            counts[w] = counts.get(w, 0) + 1
        ids_out.extend([rid] * len(counts))
        terms_out.extend(counts.keys())
        tfs_out.extend(counts.values())
    return pa.table({id_col: pa.array(ids_out, pa.int64()),
                     "term": pa.array(terms_out, pa.string()),
                     "tf": pa.array(tfs_out, pa.int64())})


def tfidf_top_terms(ds, n_docs: int, k: int = 3, text_col: str = "text",
                    id_col: str = "doc_id", n_buckets: int = 32):
    """Top-``k`` terms per document by TF-IDF.

    Integer-exact ranking for oracle parity: IDF is quantized FIRST —
    ``idf_micro = floor(ln(n_docs / df) · 1e6 + 0.5)`` (one float op
    per distinct document frequency, identical in DuckDB) — then
    ``score = tf · idf_micro`` is pure int64 arithmetic; ties break on
    term ascending.

    Fully distributed, no vocabulary ever sits on the driver:
      1. map: per-doc term frequencies → (doc, term, tf) rows;
      2. groupby(term) count → (term, df) — the document-frequency
         table stays a Dataset;
      3. ``bucketed_hash_join`` of tf rows with df rows on term
         (one hash shuffle each side);
      4. groupby(doc-id bucket) → vectorized per-doc top-k (B group
         tasks, not one per document — see ``bucketing.py``).
    """
    from ray.data.aggregate import Count

    from markdown_lab_ray.stages.joins import bucketed_hash_join

    if n_docs <= 0:
        raise ValueError("n_docs must be positive")

    # (doc, term, tf) is consumed by BOTH the df aggregate and the
    # join — pin it so the tokenize pass runs once
    tf_rows = ds.map_batches(
        _term_freq_batch, batch_format="pyarrow",
        fn_kwargs=dict(text_col=text_col, id_col=id_col)).materialize()

    df_rows = (tf_rows.groupby("term").aggregate(Count(alias_name="df"))
               .map_batches(_idf_micro_batch, batch_format="pandas",
                            fn_kwargs=dict(n_docs=n_docs)))

    joined = bucketed_hash_join(tf_rows, df_rows, key="term",
                                n_buckets=n_buckets)

    # group by a doc-id bucket, not by doc: B group tasks instead of
    # one tiny pandas group per document; the per-bucket top-k is one
    # vectorized sort + groupby-head over all of the bucket's docs
    def tag(df: pd.DataFrame) -> pd.DataFrame:
        return df.assign(
            _db=df[id_col].to_numpy(dtype=np.int64) % n_buckets)

    def topk_bucket(g: pd.DataFrame) -> pd.DataFrame:
        score = (g["tf"].to_numpy(dtype=np.int64)
                 * g["idf_micro"].to_numpy(dtype=np.int64))
        out = pd.DataFrame({id_col: g[id_col].to_numpy(),
                            "term": g["term"].to_numpy(),
                            "score": score})
        out = out.sort_values(["score", "term"], ascending=[False, True],
                              kind="mergesort")
        return (out.groupby(id_col, sort=False).head(k)
                .reset_index(drop=True))

    return (joined.map_batches(tag, batch_format="pandas")
            .groupby("_db").map_groups(topk_bucket,
                                       batch_format="pandas"))


def _idf_micro_batch(df: pd.DataFrame, n_docs: int) -> pd.DataFrame:
    """idf_micro = floor(ln(n_docs / df) * 1e6 + 0.5), int64 — the
    single quantized float op of the TF-IDF pipeline."""
    dfreq = df["df"].to_numpy(dtype=np.float64)
    idf = np.floor(np.log(float(n_docs) / dfreq) * 1e6 + 0.5)
    return pd.DataFrame({"term": df["term"].to_numpy(),
                         "idf_micro": idf.astype(np.int64)})


def inverted_index(ds, text_col: str = "text", id_col: str = "doc_id",
                   max_postings: int = 1000, n_buckets: int = 64):
    """Distributed inverted index: per term, the exact document
    frequency plus the first ``max_postings`` doc ids ascending,
    comma-joined (``term, df, postings``).

    One tokenize pass → (doc, term) rows → ONE keyed shuffle, grouped
    by ``hash(term) % n_buckets`` rather than by term — B group tasks
    regardless of vocabulary size (a raw groupby(term) would make one
    tiny pandas group per term; per-group overhead dominates at
    million-term vocabularies).  Each bucket task builds all of its
    terms' postings from one sort + groupby-agg.  The postings cap
    keeps hot-term rows bounded — a stopword's full list at corpus
    scale is GB-sized; ``df`` stays exact regardless.  At 100 TB the
    natural durable output is the (term, doc_id) rows themselves
    written as term-bucket-partitioned sorted parquet; this operator
    is the bounded queryable surface over the same single shuffle.
    """
    if max_postings <= 0:
        raise ValueError("max_postings must be positive")

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        return df.assign(_tb=_key_buckets(df["term"].to_numpy(),
                                          n_buckets))

    tf_rows = (ds.map_batches(
        _term_freq_batch, batch_format="pyarrow",
        fn_kwargs=dict(text_col=text_col, id_col=id_col))
        .map_batches(tag, batch_format="pandas"))

    def plist_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["term", id_col], kind="mergesort")
        grp = g.groupby("term", sort=False)[id_col]
        dfc = grp.size()
        posts = grp.agg(lambda s: ",".join(map(str,
                                               s.iloc[:max_postings])))
        return pd.DataFrame({
            "term": dfc.index.to_numpy(),
            "df": dfc.to_numpy(dtype=np.int64),
            "postings": posts.to_numpy(),
        })

    return tf_rows.groupby("_tb").map_groups(plist_bucket,
                                             batch_format="pandas")


# ---------------------------------------------------------------------------
# aspect-ratio bucketing (image-side training prep)
# ---------------------------------------------------------------------------

# SDXL-style training buckets: (name, target_w, target_h)
DEFAULT_ASPECT_BUCKETS: Sequence[tuple[str, int, int]] = (
    ("square", 1024, 1024),
    ("landscape_4_3", 1152, 896),
    ("landscape_16_9", 1344, 768),
    ("portrait_3_4", 896, 1152),
    ("portrait_9_16", 768, 1344),
)


def aspect_bucket_batch(batch: pa.Table, w_col: str = "w", h_col: str = "h",
                        buckets: Sequence[tuple[str, int, int]] =
                        DEFAULT_ASPECT_BUCKETS) -> pa.Table:
    """Assign each image to the training bucket whose aspect ratio is
    nearest (in log space, so 2:1 and 1:2 are symmetric errors); emit
    the bucket name and its target dimensions.  Vectorized argmin over
    the fixed bucket table — pure map, no shuffle; grouping the output
    by ``aspect_bucket`` is how a trainer forms resolution-homogeneous
    batches."""
    w = np.asarray(batch.column(w_col).to_pylist(), dtype=np.float64)
    h = np.asarray(batch.column(h_col).to_pylist(), dtype=np.float64)
    if np.any(w <= 0) or np.any(h <= 0):
        raise ValueError("width/height must be positive")
    ratios = np.log(w / h)
    names = [b[0] for b in buckets]
    bucket_ratios = np.log([bw / bh for _, bw, bh in buckets])
    idx = np.abs(ratios[:, None] - bucket_ratios[None, :]).argmin(axis=1)
    return (batch
            .append_column("aspect_bucket",
                           pa.array([names[i] for i in idx], pa.string()))
            .append_column("target_w",
                           pa.array([buckets[i][1] for i in idx], pa.int64()))
            .append_column("target_h",
                           pa.array([buckets[i][2] for i in idx], pa.int64())))


# ---------------------------------------------------------------------------
# per-key row cap (domain-cap curation rule)
# ---------------------------------------------------------------------------

def _md5_hex(ids) -> list[str]:
    return [hashlib.md5(str(i).encode()).hexdigest() for i in ids]


def cap_per_key(ds, key_col: str, id_col: str, k: int,
                n_buckets: int = 64):
    """Keep at most ``k`` rows per key — the "cap pages per domain"
    crawl-curation rule.  Selection is deterministic and
    content-independent: the ``k`` rows with smallest
    ``(md5(str(id)), id)``, i.e. a uniform pseudo-random-but-stable
    choice that never changes across runs, repartitioning, or resume.

    Scale shape: a per-batch combiner pre-caps each block to ≤ k rows
    per key BEFORE the shuffle (skew-proof: a hot key ships at most
    k·blocks rows, not its full row set); the shuffle groups by
    ``hash(key) % n_buckets`` — B groups regardless of key cardinality
    (millions of domains ≠ millions of tiny pandas groups) — and the
    final cap is one vectorized groupby-head per bucket."""
    if k <= 0:
        raise ValueError("k must be positive")

    def precap(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(_h=_md5_hex(df[id_col]))
        df = df.sort_values(["_h", id_col], kind="mergesort")
        df = df.groupby(key_col, sort=False).head(k)
        return df.assign(_kb=_key_buckets(df[key_col].to_numpy(),
                                          n_buckets))

    def final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["_h", id_col], kind="mergesort")
        out = g.groupby(key_col, sort=False).head(k)
        return out.drop(columns=["_h", "_kb"])

    return (ds.map_batches(precap, batch_format="pandas")
            .groupby("_kb").map_groups(final, batch_format="pandas"))


# ---------------------------------------------------------------------------
# leakage-free group split + class weights
# ---------------------------------------------------------------------------

# hex-string thresholds on the first 8 md5 chars: < t1 → train,
# < t2 → val, else test (≈ 80/10/10); string comparison keeps the rule
# bit-identical in SQL (substr(md5(…),1,8) compares the same way).
_SPLIT_T1 = "cccccccc"
_SPLIT_T2 = "e6666666"


def group_split_batch(batch: pa.Table, key_col: str) -> pa.Table:
    """Tag every row with a train/val/test split decided ONLY by
    ``md5(str(key))`` — all rows of one key land in one split, so a
    user (or domain) can never leak across the train/test boundary,
    the failure mode row-wise random splits have on grouped data.

    Pure per-row hash: NO shuffle, no state — embarrassingly parallel
    at any scale, stable across runs/repartition/resume (same
    determinism contract as ``cap_per_key``).  The reference has no
    splitter; rule mirrored in SQL via ``substr(md5(CAST(key AS
    VARCHAR)), 1, 8)`` string comparison."""
    h8 = [hashlib.md5(str(k).encode()).hexdigest()[:8]
          for k in batch.column(key_col).to_pylist()]
    split = ["train" if h < _SPLIT_T1 else ("val" if h < _SPLIT_T2
                                            else "test")
             for h in h8]
    return batch.append_column("split", pa.array(split, pa.string()))


def group_split_summary(ds, key_col: str):
    """Split audit: per split, distinct keys and total rows.  A
    per-batch DISTINCT (split, key) combiner bounds the distinct-count
    shuffle to keys × blocks rows; row counts ride a keyed Sum."""
    from ray.data.aggregate import Sum

    tagged = ds.map_batches(group_split_batch,
                            batch_format="pyarrow",
                            fn_kwargs=dict(key_col=key_col))

    def slim(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "split": batch.column("split").to_pylist(),
            key_col: batch.column(key_col).to_numpy(zero_copy_only=False)})
        g = (df.groupby(["split", key_col], sort=False)
             .size().rename("_rows").astype("int64").reset_index())
        return pa.Table.from_pandas(g, preserve_index=False)

    per_key = (tagged.map_batches(slim, batch_format="pyarrow")
               .groupby(["split", key_col])
               .aggregate(Sum("_rows", alias_name="_n")))

    def fold(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "_n" not in b.column_names:
            return pa.table({"split": pa.array([], pa.string()),
                             "n_keys": pa.array([], pa.int64()),
                             "n_rows": pa.array([], pa.int64())})
        df = b.to_pandas()
        g = (df.groupby("split", sort=True)
             .agg(n_keys=(key_col, "size"), n_rows=("_n", "sum"))
             .reset_index())
        g["n_keys"] = g["n_keys"].astype("int64")
        g["n_rows"] = g["n_rows"].astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False)

    return per_key.repartition(1).map_batches(fold,
                                              batch_format="pyarrow")


def class_weights(ds, label_col: str = "label"):
    """Inverse-frequency class weights in integer micro-units —
    w(c) = N / (K · n_c), the imbalance correction handed to a loss
    function: 1.0 when balanced, > 1 for rare classes.

    Scale shape: per-batch partial counts → one keyed Sum over the
    bounded label space → O(K) finish; exactness as everywhere (exact
    integer products, one double division mirroring the SQL twin).
    Output: (label, n int64, weight_micro int64)."""
    import math

    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({label_col: batch.column(label_col)
                           .to_pylist()})
        g = df.groupby(label_col, sort=False).size().rename("_c")
        return pa.Table.from_pandas(g.astype("int64").reset_index(),
                                    preserve_index=False)

    def finish(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "_n" not in b.column_names:
            return pa.table({label_col: pa.array([], pa.string()),
                             "n": pa.array([], pa.int64()),
                             "weight_micro": pa.array([], pa.int64())})
        df = b.to_pandas().sort_values(label_col)
        counts = [int(v) for v in df["_n"]]
        total, k = sum(counts), len(counts)
        w = [int(math.floor(1e6 * float(total) / float(k * c) + 0.5))
             for c in counts]
        return pa.table({label_col: pa.array(df[label_col].tolist()),
                         "n": pa.array(counts, pa.int64()),
                         "weight_micro": pa.array(w, pa.int64())})

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby(label_col).aggregate(Sum("_c", alias_name="_n"))
            .repartition(1).map_batches(finish, batch_format="pyarrow"))


def split_shingle_leakage(ds, key_col: str, text_col: str = "text",
                          n: int = 8, n_buckets: int = 64):
    """Train/test contamination audit for the md5 group split: how
    many distinct word ``n``-gram shingles occur in BOTH the train and
    test splits.  Group-level splitting guarantees no KEY crosses the
    boundary; this measures the leakage it cannot prevent — near-copy
    TEXT living under different keys (the Lee-et-al cross-split
    duplication failure mode).

    Shape: split tags are the pure ``group_split_batch`` hash (no
    shuffle); exploded (shingle-md5, split) rows collapse to per-batch
    distinct pairs, then ONE bucketed fold computes each shingle's
    train/test presence and per-bucket partial counts; a final
    single-row fold emits the scalars.  Shingle identity is md5 (the
    span-stats contract).  Output: one row (n_train, n_test, n_shared,
    leak_micro = shared/test).
    """
    import hashlib

    import pandas as pd

    from .bucketing import key_buckets

    def shingle_split(batch: pa.Table) -> pa.Table:
        tagged = group_split_batch(batch, key_col)
        ghs, splits = [], []
        for t, s in zip(tagged.column(text_col).to_pylist(),
                        tagged.column("split").to_pylist()):
            if s == "val":
                continue
            words = (t or "").lower().split()
            for i in range(len(words) - n + 1):
                ghs.append(hashlib.md5(
                    " ".join(words[i:i + n]).encode()).hexdigest())
                splits.append(s)
        df = pd.DataFrame({"gh": ghs, "split": splits})
        df = df.drop_duplicates()
        return pa.table({"gh": pa.array(df["gh"], pa.string()),
                         "split": pa.array(df["split"], pa.string())})

    def bucket_fold(g: "pd.DataFrame") -> "pd.DataFrame":
        g = g.drop_duplicates(["gh", "split"])
        pres = g.pivot_table(index="gh", columns="split", aggfunc="size",
                             fill_value=0)
        in_tr = (pres["train"].to_numpy() > 0 if "train" in pres
                 else np.zeros(len(pres), bool))
        in_te = (pres["test"].to_numpy() > 0 if "test" in pres
                 else np.zeros(len(pres), bool))
        return pd.DataFrame({
            "n_train": [np.int64(in_tr.sum())],
            "n_test": [np.int64(in_te.sum())],
            "n_shared": [np.int64((in_tr & in_te).sum())]})

    def finish(df: "pd.DataFrame") -> "pd.DataFrame":
        tr = int(df["n_train"].sum())
        te = int(df["n_test"].sum())
        sh = int(df["n_shared"].sum())
        leak = 0 if te == 0 else int(np.floor(1e6 * sh / te + 0.5))
        return pd.DataFrame({"n_train": pd.array([tr], dtype="int64"),
                             "n_test": pd.array([te], dtype="int64"),
                             "n_shared": pd.array([sh], dtype="int64"),
                             "leak_micro": pd.array([leak],
                                                    dtype="int64")})

    rows = ds.map_batches(shingle_split, batch_format="pyarrow")
    folded = (rows.map_batches(
        tag_buckets_batch, batch_format="pyarrow",
        fn_kwargs=dict(key_col="gh", n_buckets=n_buckets))
        .groupby("_b").map_groups(bucket_fold, batch_format="pandas"))
    return folded.repartition(1).map_batches(
        finish, batch_format="pandas", batch_size=None)


def lang_temperature_weights(ds, lang_col: str = "lang"):
    """Square-root temperature sampling weights per language —
    ``w_i = sqrt(n_i) / Σ sqrt(n_j)`` (the α=0.5 point of the
    mBERT/XLM-R multinomial upsampling family; sqrt chosen over a
    free α because IEEE sqrt is correctly rounded on every engine,
    so the oracle agrees bit-for-bit where pow() may drift an ulp).

    Scale shape: per-batch language partials collapse each block
    before ONE keyed Sum bounded by |langs|; the weight fold is a
    single task over that bounded aggregate.  Output: (lang, n_docs,
    weight_micro), weight in micro-units.
    """
    from ray.data.aggregate import Sum

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return (df.groupby(lang_col, sort=False).size()
                .rename("_n").astype("int64").reset_index())

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(lang_col, kind="mergesort")
        n = df["_n"].to_numpy(dtype=np.int64)
        s = np.sqrt(n.astype(np.float64))
        tot = s.sum()
        w = np.floor(1e6 * (s / tot) + 0.5).astype(np.int64)
        return pd.DataFrame({lang_col: df[lang_col].to_numpy(),
                             "n_docs": n, "weight_micro": w})

    agg = (ds.map_batches(partial, batch_format="pandas")
           .groupby(lang_col).aggregate(Sum("_n", alias_name="_n")))
    return agg.repartition(1).map_batches(fold, batch_format="pandas",
                                          batch_size=None)


def packing_waste(ds, token_col: str = "n_tokens_ws",
                  context_lengths=(512, 1024, 2048)):
    """Packing-waste lower bound per candidate context length: if
    every document is split into ``ceil(tokens / L)`` chunks, the pad
    waste is ``1 − total_tokens / (n_chunks · L)`` — the floor any
    real packer (including ``pack_sequences``) can only approach.
    The curation question it answers: which context length wastes the
    least compute for THIS corpus.

    All integers until the final division (ceil via
    ``(t + L − 1) // L``, same as the SQL twin).  Per-batch partials
    → one single-row fold per L; no shuffle at all.  Output: one row
    per L (context_len, total_tokens, n_chunks, waste_micro).
    """

    Ls = [int(x) for x in context_lengths]

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        t = df[token_col].to_numpy(dtype=np.int64)
        rows = []
        for L in Ls:
            rows.append((L, int(t.sum()), int(((t + L - 1) // L).sum())))
        return pd.DataFrame(rows, columns=["context_len",
                                           "total_tokens", "n_chunks"])

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.groupby("context_len", sort=True)
             .agg(total_tokens=("total_tokens", "sum"),
                  n_chunks=("n_chunks", "sum")).reset_index())
        L = g["context_len"].to_numpy(np.int64)
        tt = g["total_tokens"].to_numpy(np.int64)
        nc = g["n_chunks"].to_numpy(np.int64)
        denom = np.maximum(nc * L, 1)
        waste = np.floor(1e6 * (1.0 - tt / denom) + 0.5).astype(np.int64)
        waste = np.where(nc == 0, 0, waste)
        return pd.DataFrame({"context_len": L, "total_tokens": tt,
                             "n_chunks": nc, "waste_micro": waste})

    partials = ds.map_batches(partial, batch_format="pandas")
    return partials.repartition(1).map_batches(
        fold, batch_format="pandas", batch_size=None)


def exemplars_per_key(ds, key_col: str, id_col: str, k: int = 3,
                      extra_cols: tuple = (), n_buckets: int = 64):
    """Deterministic per-key exemplar sample: the ``k`` rows with the
    smallest ``md5(str(id))`` per key — the "show me a few random
    examples per language" panel every dataset card wants, stable
    across runs/repartition/resume (hash rank, no RNG state).

    Scale shape: per-batch top-k per key is a TRUE combiner (≤ k
    survivors per key per block), so the single bucketed key shuffle
    moves O(k × keys × blocks) rows; the in-bucket fold re-applies
    the same rule.  Output: (key, id, rank, *extra_cols), rank 1..k
    by hash order.
    """
    import hashlib

    import pandas as pd

    from .bucketing import key_buckets

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    cols = [key_col, id_col, *extra_cols]

    def topk(df: "pd.DataFrame") -> "pd.DataFrame":
        h = [hashlib.md5(str(i).encode()).hexdigest()
             for i in df[id_col]]
        out = (df.assign(_h=h)
               .sort_values([key_col, "_h"], kind="mergesort")
               .groupby(key_col, sort=False).head(k))
        return out[cols + ["_h"]]

    def finish(g: "pd.DataFrame") -> "pd.DataFrame":
        g = topk(g)
        g["rank"] = g.groupby(key_col, sort=False).cumcount() + 1
        return g[cols + ["rank"]].astype({"rank": "int64"})

    tagged = (ds.map_batches(topk, batch_format="pandas")
              .map_batches(
                  tag_buckets_batch, batch_format="pyarrow",
                  fn_kwargs=dict(key_col=key_col, n_buckets=n_buckets)))
    return tagged.groupby("_b").map_groups(finish, batch_format="pandas")


def fd_violations(ds, det_col: str, dep_col: str, n_buckets: int = 64):
    """Functional-dependency audit ``det → dep``: per determinant
    value, how many DISTINCT dependent values occur — a count > 1 is
    a violation (the "does source imply language" data-quality check).

    Scale shape: per-batch distinct (det, dep) pairs collapse each
    block, one bucketed det-keyed fold counts distincts exactly, and
    the summary is a single-row fold over O(determinants) rows.
    Output: one row (n_keys, n_violating, n_extra_pairs) —
    ``n_extra_pairs`` = Σ (distinct_deps − 1), the edit distance to a
    clean FD.
    """
    import pandas as pd

    from .bucketing import key_buckets

    def pairs(df: "pd.DataFrame") -> "pd.DataFrame":
        return df[[det_col, dep_col]].drop_duplicates()

    def fold(g: "pd.DataFrame") -> "pd.DataFrame":
        d = (g.drop_duplicates([det_col, dep_col])
             .groupby(det_col, sort=False)[dep_col].nunique()
             .astype("int64"))
        return pd.DataFrame({
            "n_keys": [np.int64(len(d))],
            "n_violating": [np.int64((d > 1).sum())],
            "n_extra_pairs": [np.int64((d - 1).sum())]})

    def finish(df: "pd.DataFrame") -> "pd.DataFrame":
        return pd.DataFrame({
            "n_keys": pd.array([int(df["n_keys"].sum())], dtype="int64"),
            "n_violating": pd.array([int(df["n_violating"].sum())],
                                    dtype="int64"),
            "n_extra_pairs": pd.array([int(df["n_extra_pairs"].sum())],
                                      dtype="int64")})

    tagged = (ds.map_batches(pairs, batch_format="pandas")
              .map_batches(
                  tag_buckets_batch, batch_format="pyarrow",
                  fn_kwargs=dict(key_col=det_col, n_buckets=n_buckets)))
    folded = tagged.groupby("_b").map_groups(fold, batch_format="pandas")
    return folded.repartition(1).map_batches(
        finish, batch_format="pandas", batch_size=None)


def propagate_deletions(delete_keys_ds, artifacts):
    """Right-to-be-forgotten propagation audit: given a delete-list
    Dataset (single key column) and derived ARTIFACTS [(name, ds,
    key_col)…], count per artifact how many rows the deletion reaches —
    each via the bucketed SEMI join (keys only cross the wire; the
    delete list is never broadcast, so a 10⁸-row GDPR backlog works the
    same as ten ids).  Pair with ``bucketed_anti_join`` to materialize
    the purged artifact itself.  Output: (artifact, n_before, n_purged,
    n_after) per artifact, name-sorted."""
    import pandas as pd
    import pyarrow as pa

    from .joins import bucketed_anti_join, bucketed_semi_join  # noqa: F401

    del_key = delete_keys_ds.schema().names[0]
    rows = []
    for name, ds, key_col in sorted(artifacts, key=lambda a: a[0]):
        n_before = ds.count()
        keys = ds.map_batches(
            lambda b, kc=key_col: pa.table({del_key: b[kc]}),
            batch_format="pyarrow")
        n_purged = bucketed_semi_join(keys, delete_keys_ds, key=del_key,
                                      n_buckets=16).count()
        rows.append((name, n_before, n_purged, n_before - n_purged))
    out = pd.DataFrame(rows, columns=["artifact", "n_before", "n_purged",
                                      "n_after"])
    return out.astype({c: "int64" for c in out.columns[1:]})

"""Mergeable sketches for single-pass approximate statistics at scale.

Exact per-key percentiles (``events_percentile`` query) need every
group's values in one place — a keyed shuffle plus per-group sort.  At
100 TB that is the expensive path; the scale path is a MERGEABLE sketch
computed per batch inside ``map_batches`` and combined associatively:
no shuffle of the raw values, only fixed-size sketch states travel.

``histogram_quantiles`` uses a deterministic fixed-bin histogram sketch:
pass 1 aggregates (min, max) per key (native, tiny), pass 2 bins every
value into ``n_bins`` uniform buckets per key and sums the counts —
both passes stream; the error bound is one bin width
((max−min)/n_bins), verified in tests against exact numpy quantiles.
Deterministic by construction (no sampling), so results are stable
across block orders and retries — unlike a reservoir or a greedy
t-digest whose state depends on merge order.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


class _BinCountsStage:
    """Actor-pool binning stage: per-batch partial sketch rows
    (key, lo, hi, bin counts).

    The per-key global (lo, hi) bounds arrive as a LIST of Arrow block
    refs (``Dataset.to_arrow_refs`` of the pass-1 minmax aggregate) —
    the bounds never materialize on the driver; each actor reads them
    zero-copy from the object store ONCE in ``__init__`` and probes
    per batch with vectorized ``pc.index_in``.  Per-actor memory is
    O(#distinct keys) Arrow columns (~24 B/key: ~240 MB at 10^7 keys,
    shared via the object store across actors on a node)."""

    def __init__(self, bounds_refs, key_col: str, value_col: str,
                 n_bins: int):
        import ray

        self.key_col = key_col
        self.value_col = value_col
        self.n_bins = n_bins
        tables = [t for t in ray.get(list(bounds_refs)) if t.num_rows]
        if tables:
            tbl = pa.concat_tables(tables)
            self.keys = tbl.column(key_col).combine_chunks()
            lo = np.asarray(tbl.column("lo").to_numpy(zero_copy_only=False),
                            dtype=np.float64)
            hi = np.asarray(tbl.column("hi").to_numpy(zero_copy_only=False),
                            dtype=np.float64)
        else:
            self.keys = pa.array([], pa.string())
            lo = hi = np.zeros(0, np.float64)
        self.lo = lo
        self.width = np.maximum(hi - lo, 1e-300)
        self.hi = hi

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        n = batch.num_rows
        empty = pa.table({
            self.key_col: pa.array([], self.keys.type),
            "lo": pa.array([], pa.float64()),
            "hi": pa.array([], pa.float64()),
            "counts": pa.array([], pa.list_(pa.int64())),
        })
        if n == 0 or len(self.keys) == 0:
            return empty
        idx = pc.index_in(batch.column(self.key_col).combine_chunks(),
                          value_set=self.keys)
        idx_np = np.asarray(idx.to_numpy(zero_copy_only=False))
        vals = np.asarray(batch.column(self.value_col).to_numpy(
            zero_copy_only=False), dtype=np.float64)
        # every key came from pass 1 over the same dataset, so idx has
        # no nulls; compact the batch's key set to local indices
        uniq, local = np.unique(idx_np, return_inverse=True)
        bins = np.minimum(
            ((vals - self.lo[idx_np]) / self.width[idx_np]
             * self.n_bins).astype(np.int64),
            self.n_bins - 1)
        flat = np.bincount(local * self.n_bins + bins,
                           minlength=len(uniq) * self.n_bins)
        counts = flat.reshape(len(uniq), self.n_bins)
        return pa.table({
            self.key_col: self.keys.take(pa.array(uniq, pa.int64())),
            "lo": pa.array(self.lo[uniq], pa.float64()),
            "hi": pa.array(self.hi[uniq], pa.float64()),
            "counts": pa.array(counts.tolist(), pa.list_(pa.int64())),
        })


def _merge_quantiles_group(df, qs, n_bins):
    """Merge a key's partial count vectors and read quantiles off the
    cumulative histogram (linear interpolation inside the bin).  The
    key's global (lo, hi) ride the partial rows, so the merge needs no
    broadcast state at all."""
    import pandas as pd

    key = df.iloc[0, 0]
    counts = np.sum(np.stack([np.asarray(c) for c in df["counts"]]), axis=0)
    lo = float(df["lo"].iloc[0])
    hi = float(df["hi"].iloc[0])
    width = (hi - lo) / n_bins if hi > lo else 0.0
    total = counts.sum()
    cum = np.cumsum(counts)
    row = {df.columns[0]: key}
    for q in qs:
        if total == 0:
            row[f"p{int(q * 100)}"] = float("nan")
            continue
        target = q * (total - 1)
        b = int(np.searchsorted(cum, target + 1))
        b = min(b, n_bins - 1)
        inside = cum[b] - counts[b]
        frac = ((target - inside) / counts[b]) if counts[b] else 0.0
        row[f"p{int(q * 100)}"] = lo + (b + min(max(frac, 0.0), 1.0)) * width
    return pd.DataFrame([row])


def histogram_quantiles(ds, key_col: str, value_col: str,
                        qs=(0.5, 0.95), n_bins: int = 4096,
                        concurrency=(1, 8)):
    """Approximate per-key quantiles via the two-pass histogram sketch.

    Error ≤ one bin width ((max−min)/n_bins) per key.  Shuffles only
    (key, lo, hi, n_bins-int64) sketch rows — never the raw values.
    Returns a Dataset with one row per key: (key, p50, p95, ...).

    No driver-side key state at ANY cardinality: pass 1's per-key
    (lo, hi) aggregate stays in the object store as Arrow block refs
    (``to_arrow_refs``) and is read zero-copy by each binning actor in
    ``__init__``; the merge reads each key's bounds off its own partial
    rows.  Driver memory is O(#blocks) refs; per-actor memory is the
    bounds table itself (~24 B/key — see ``_BinCountsStage``), the
    operator's only cardinality bound."""
    from ray.data.aggregate import Max, Min

    minmax = (ds.groupby(key_col)
              .aggregate(Min(value_col, alias_name="lo"),
                         Max(value_col, alias_name="hi"))).materialize()
    bounds_refs = minmax.to_arrow_refs()

    partials = ds.map_batches(
        _BinCountsStage, batch_format="pyarrow", concurrency=concurrency,
        fn_constructor_kwargs=dict(bounds_refs=bounds_refs, key_col=key_col,
                                   value_col=value_col, n_bins=n_bins))
    return partials.groupby(key_col).map_groups(
        _merge_quantiles_group, batch_format="pandas",
        fn_kwargs=dict(qs=tuple(qs), n_bins=n_bins))


# ---------------------------------------------------------------------------
# Misra-Gries heavy hitters (mergeable; Agarwal et al. 2012, public)
# ---------------------------------------------------------------------------

_TOKEN_RE = None  # compiled lazily


def _tokens(texts):
    """Tokenizer shared by the heavy-hitter / HLL sketches.  Uses the
    ``regex`` module's explicit ``[\\p{L}\\p{N}_]+`` class so engine and
    DuckDB oracle tokenize IDENTICALLY on non-ASCII text (Python
    ``re``'s ``\\w`` also matches combining marks and Other_Alphabetic
    codepoints and would diverge — ADVICE r03); falls back to ``re`` \\w+
    only if ``regex`` is absent, where the contract is ASCII-only."""
    global _TOKEN_RE
    if _TOKEN_RE is None:
        try:
            import regex
            _TOKEN_RE = regex.compile(r"[\p{L}\p{N}_]+")
        except ImportError:
            import re
            _TOKEN_RE = re.compile(r"\w+")
    for t in texts:
        yield from _TOKEN_RE.findall((t or "").lower())


_HH_TOTAL = "\x00__total__"  # sentinel term row carrying the batch size


def _mg_partial_batch(batch: pa.Table, text_col: str, k: int) -> pa.Table:
    """Per-batch Misra-Gries summary with k counters.

    Built by exact-count-then-trim: a full Counter of the batch,
    minus the (k+1)-th largest count, positives kept — a valid MG
    summary with error ≤ n_batch/(k+1) (mergeable-summaries
    Lemma 1), and vectorizable unlike the one-token-at-a-time
    textbook loop.  Emits (term, weight) rows plus one sentinel row
    holding the exact batch token count.
    """
    from collections import Counter

    c = Counter(_tokens(batch.column(text_col).to_pylist()))
    n_batch = sum(c.values())
    if len(c) > k:
        kth = sorted(c.values(), reverse=True)[k]
        c = {t: v - kth for t, v in c.items() if v > kth}
    terms = list(c.keys()) + [_HH_TOTAL]
    weights = list(c.values()) + [n_batch]
    return pa.table({"term": pa.array(terms, pa.string()),
                     "weight": pa.array(weights, pa.int64())})


def heavy_hitters_exact(ds, text_col: str = "text", k: int = 20):
    """All terms with frequency strictly above n/k, with EXACT counts.

    Two streaming passes (the sketch-then-recount pattern):

    1. Misra-Gries partials per batch → keyed Sum.  Summed weights
       satisfy W(t) ≥ F(t) − n/(k+1), so every true heavy hitter has
       W(t) > n/k − n/(k+1) = n/(k(k+1)); at most k(k+1) terms can
       clear that bar (ΣW ≤ n), so the candidate set is O(k²) rows —
       driver-safe by construction, independent of corpus size.
    2. Exact recount of candidates only: per-batch Counter restricted
       to the broadcast candidate set → keyed Sum → keep
       count·k > n (strict).

    Output is exact and deterministic → DuckDB-oracle-able
    (GROUP BY term HAVING count(*)*k > total), unlike a raw sketch.
    Returns a pandas DataFrame (≤ k rows) sorted by count desc, term.
    """
    import ray
    from ray.data.aggregate import Sum

    merged = (ds.map_batches(_mg_partial_batch, batch_format="pyarrow",
                             fn_kwargs=dict(text_col=text_col, k=k))
              .groupby("term").aggregate(Sum("weight", alias_name="w"))
              ).materialize()

    import pyarrow.compute as pc

    def keep_total(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.equal(batch.column("term"), _HH_TOTAL))

    total_tbl = merged.map_batches(
        keep_total, batch_format="pyarrow").take_all()
    if not total_tbl:  # zero-batch input: no sentinel rows at all
        import pandas as pd
        return pd.DataFrame({"term": pd.Series(dtype="object"),
                             "n_term": pd.Series(dtype="int64")})
    n_total = int(total_tbl[0]["w"])
    bar = n_total // (k * (k + 1))  # W > bar ⟸ F > n/k

    def keep_heavy(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.greater(batch.column("w"), bar))

    cand = (merged.map_batches(keep_heavy, batch_format="pyarrow")
            .take_all())  # ≤ k(k+1) rows by the mass argument
    candidates = {r["term"] for r in cand} - {_HH_TOTAL}
    if not candidates:  # nothing clears the bar: empty result, fixed schema
        import pandas as pd
        return pd.DataFrame({"term": pd.Series(dtype="object"),
                             "n_term": pd.Series(dtype="int64")})
    cand_ref = ray.put(candidates)

    def recount(batch: pa.Table) -> pa.Table:
        from collections import Counter
        cset = ray.get(cand_ref)
        c = Counter(t for t in _tokens(batch.column(text_col).to_pylist())
                    if t in cset)
        return pa.table({"term": pa.array(list(c.keys()), pa.string()),
                         "n_term": pa.array(list(c.values()), pa.int64())})

    exact = (ds.map_batches(recount, batch_format="pyarrow")
             .groupby("term").aggregate(Sum("n_term", alias_name="n_term"))
             .to_pandas())
    exact = exact[exact["n_term"] * k > n_total]
    return (exact.sort_values(["n_term", "term"],
                              ascending=[False, True])
            .reset_index(drop=True))


# ---------------------------------------------------------------------------
# HyperLogLog distinct-count sketch (Flajolet et al. 2007, public)
# ---------------------------------------------------------------------------

def _hll_hash64(values) -> np.ndarray:
    """Deterministic 64-bit hashes via md5 (no process-seed
    dependence — stable across workers and runs)."""
    import hashlib

    return np.array(
        [int.from_bytes(hashlib.md5(v.encode()).digest()[:8], "big")
         for v in values], dtype=np.uint64)


def _hll_partial(values, p: int) -> np.ndarray:
    """Register array (2^p uint8) for one batch of string values."""
    regs = np.zeros(1 << p, np.uint8)
    if not values:
        return regs
    h = _hll_hash64(values)
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = h << np.uint64(p)  # low 64-p bits, left-aligned
    # rho = position of the leftmost 1-bit in the remaining stream
    rho = np.ones(len(h), np.uint8)
    mask = np.uint64(1) << np.uint64(63)
    rem = rest.copy()
    live = rem != 0
    while live.any():
        top = (rem & mask) != 0
        live &= ~top
        rho[live] += 1
        rem[live] = rem[live] << np.uint64(1)
    rho[rest == 0] = np.uint8(64 - p + 1)
    np.maximum.at(regs, idx, rho)
    return regs


def hll_estimate(regs: np.ndarray) -> float:
    """Standard HLL estimator with small-range linear counting."""
    m = len(regs)
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.power(2.0, -regs.astype(np.float64)))
    zeros = int(np.sum(regs == 0))
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)
    return float(est)


def hll_distinct_terms(ds, text_col: str = "text", p: int = 12):
    """Approximate distinct-token count over a text column.

    Each batch emits ONE fixed-size register row (2^p = 4 KiB at
    p=12) regardless of batch size — the only data that moves is
    O(n_blocks) sketch rows, merged by element-wise max (associative
    and commutative, so block order never matters).  Relative error
    ≈ 1.04/√(2^p) ≈ 1.6% at p=12; asserted ≤ 5% vs exact in tests.

    The driver folds ≤ n_blocks 4 KiB rows — fixed-size per block by
    construction (the same bound the quantile sketch documents); a
    tree-merge via groupby(const).map_groups would cut that to one
    row if block counts ever reached driver-hostile scale.
    """
    def partial(batch: pa.Table) -> pa.Table:
        uniq = set()
        for t in _tokens(batch.column(text_col).to_pylist()):
            uniq.add(t)
        regs = _hll_partial(sorted(uniq), p)
        return pa.table({"regs": pa.array([regs.tolist()],
                                          pa.list_(pa.uint8()))})

    rows = ds.map_batches(partial, batch_format="pyarrow").take_all()
    merged = np.zeros(1 << p, np.uint8)
    for r in rows:
        merged = np.maximum(merged, np.asarray(r["regs"], np.uint8))
    import pandas as pd
    return pd.DataFrame({"distinct_estimate": [hll_estimate(merged)],
                         "p": [p],
                         "registers_nonzero": [int((merged > 0).sum())]})


def hll_distinct_per_group(ds, key_col: str, value_col: str, p: int = 12):
    """Approximate COUNT(DISTINCT value) per key — the sketch twin of
    ``analytics.distinct_count`` (exact, oracled as ``users_per_type``).

    Why it exists: the exact two-level pattern shuffles one row per
    DISTINCT (key, value) pair — at 10^10 events with high-cardinality
    values that is the corpus itself.  Here each batch emits ONE
    2^p-byte register row per key it contains, so the groupby moves
    O(n_blocks × keys_per_block) fixed-size rows regardless of row or
    value cardinality; registers merge by element-wise max (associative
    + commutative → block order and retries never change the answer).
    Relative error ≈ 1.04/√(2^p) ≈ 1.6% at p=12, asserted ≤ 5% vs the
    exact path in tests.
    """
    import pandas as pd

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "k": batch.column(key_col).to_pylist(),
            "v": [str(v) for v in batch.column(value_col).to_pylist()],
        })
        keys, regs = [], []
        for key, grp in df.groupby("k", sort=True):
            keys.append(key)
            regs.append(_hll_partial(sorted(set(grp["v"])), p).tolist())
        return pa.table({key_col: pa.array(keys),
                         "regs": pa.array(regs, pa.list_(pa.uint8()))})

    def merge(df: "pd.DataFrame") -> "pd.DataFrame":
        merged = np.zeros(1 << p, np.uint8)
        for r in df["regs"]:
            merged = np.maximum(merged, np.asarray(r, np.uint8))
        return pd.DataFrame({key_col: [df[key_col].iloc[0]],
                             "n_distinct_approx": [hll_estimate(merged)]})

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return partials.groupby(key_col).map_groups(merge,
                                                batch_format="pandas")


# ---------------------------------------------------------------------------
# Count-Min sketch (Cormode & Muthukrishnan 2005, public)
# ---------------------------------------------------------------------------

# pd.util.hash_array hash keys must be exactly 16 bytes; one fixed key
# per depth row gives `depth` independent vectorized hash functions
# that every worker process agrees on (same property key_buckets uses).
_CMS_KEYS = ("cms-depth-00-key", "cms-depth-01-key",
             "cms-depth-02-key", "cms-depth-03-key")


def _cms_slots(terms: np.ndarray, depth: int, width: int) -> np.ndarray:
    """(depth, n_terms) flattened slot ids: row d occupies
    [d*width, (d+1)*width)."""
    import pandas as pd

    out = np.empty((depth, len(terms)), dtype=np.int64)
    for d in range(depth):
        h = pd.util.hash_array(terms, hash_key=_CMS_KEYS[d],
                               categorize=False)
        out[d] = d * width + (h % np.uint64(width)).astype(np.int64)
    return out


def _cms_partial_batch(batch: pa.Table, text_col: str, depth: int,
                       width: int, topn: int) -> pa.Table:
    """Per-batch CMS partial: sparse nonzero (slot, count) increments —
    CMS matrices merge by elementwise add, which a keyed Sum over slot
    ids expresses with zero driver state — plus the batch's ``topn``
    most frequent terms as heavy-hitter candidates (kind=1 rows)."""
    from collections import Counter

    c = Counter(_tokens(batch.column(text_col).to_pylist()))
    if not c:
        return pa.table({"kind": pa.array([], pa.int8()),
                         "slot": pa.array([], pa.int64()),
                         "term": pa.array([], pa.string()),
                         "c": pa.array([], pa.int64())})
    terms = np.array(list(c.keys()), dtype=object)
    counts = np.array(list(c.values()), dtype=np.int64)
    slots = _cms_slots(terms, depth, width)
    flat_slots = slots.ravel()
    flat_counts = np.tile(counts, depth)
    uniq, inv = np.unique(flat_slots, return_inverse=True)
    summed = np.zeros(len(uniq), dtype=np.int64)
    np.add.at(summed, inv, flat_counts)
    order = np.lexsort((terms.astype(str), -counts))[:topn]
    return pa.table({
        "kind": pa.array([0] * len(uniq) + [1] * len(order), pa.int8()),
        "slot": pa.array(np.concatenate([uniq, np.full(len(order), -1)]),
                         pa.int64()),
        "term": pa.array([""] * len(uniq) + list(terms[order]),
                         pa.string()),
        "c": pa.array(np.concatenate([summed, counts[order]]), pa.int64()),
    })


def cms_sketch(ds, text_col: str = "text", depth: int = 4,
               width: int = 4096):
    """Merged Count-Min sketch over a text column → ((depth, width)
    int64 matrix, total token count).  One keyed Sum shuffle over slot
    ids; the driver holds only the dense matrix (depth×width×8 bytes,
    independent of corpus size).  Point-query estimates are one-sided:
    estimate(t) ≥ true count, always."""
    from ray.data.aggregate import Sum

    import pyarrow.compute as pc

    def keep_slots(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.equal(batch.column("kind"), 0))

    merged = (ds.map_batches(_cms_partial_batch, batch_format="pyarrow",
                             fn_kwargs=dict(text_col=text_col, depth=depth,
                                            width=width, topn=1))
              .map_batches(keep_slots, batch_format="pyarrow")
              .groupby("slot").aggregate(Sum("c", alias_name="c"))
              .to_pandas())
    cms = np.zeros(depth * width, dtype=np.int64)
    cms[merged["slot"].to_numpy()] = merged["c"].to_numpy()
    cms = cms.reshape(depth, width)
    # every depth row saw every token once ⇒ row mass == total count
    return cms, int(cms[0].sum())


def cms_estimate(cms: np.ndarray, terms) -> np.ndarray:
    """Vectorized CMS point query: min over depth rows."""
    depth, width = cms.shape
    arr = np.array(list(terms), dtype=object)
    if len(arr) == 0:
        return np.zeros(0, dtype=np.int64)
    slots = _cms_slots(arr, depth, width) - (
        np.arange(depth)[:, None] * width)
    return np.min(cms[np.arange(depth)[:, None], slots], axis=0)


def cms_heavy_hitters(ds, text_col: str = "text", k: int = 24,
                      depth: int = 4, width: int = 4096,
                      topn_per_batch: int = 64):
    """Terms with frequency strictly above n/k, EXACT counts, via a
    Count-Min sketch (the CMS twin of ``heavy_hitters_exact``; same
    sketch→candidates→exact-recount pattern, different sketch):

    1. One pass emits sparse CMS increments + per-batch local top-N
       candidate terms; a keyed Sum over slot ids merges the CMS.
    2. Candidates (distinct local tops) are filtered by CMS estimate:
       one-sided error (estimate ≥ truth) means NO true heavy hitter
       is dropped — the filter only prunes, never misses.
    3. Exact recount of survivors → strict ``count·k > n`` gate.

    Exact, deterministic output ⇒ DuckDB-oracle-able.  Driver holds
    the dense CMS (depth×width ints) and the pruned candidate set;
    survivor count is bounded in practice by the < k heavy cells per
    CMS row that an estimate above n/k must hash into.  A true heavy
    hitter is ALWAYS a per-batch local top in at least one batch
    whenever it is heavy in that batch; with frequency > n/k it is
    heavy in at least one batch by averaging, so the candidate stream
    covers all true heavy hitters for topn ≥ k (enforced)."""
    import ray
    from ray.data.aggregate import Sum

    import pyarrow.compute as pc

    if topn_per_batch < k:
        raise ValueError("topn_per_batch must be ≥ k for the averaging "
                         "cover argument to hold")
    partials = ds.map_batches(
        _cms_partial_batch, batch_format="pyarrow",
        fn_kwargs=dict(text_col=text_col, depth=depth, width=width,
                       topn=topn_per_batch)).materialize()

    def keep_slots(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.equal(batch.column("kind"), 0))

    def keep_cands(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.equal(batch.column("kind"), 1))

    merged = (partials.map_batches(keep_slots, batch_format="pyarrow")
              .groupby("slot").aggregate(Sum("c", alias_name="c"))
              .to_pandas())
    cms = np.zeros(depth * width, dtype=np.int64)
    if len(merged):
        cms[merged["slot"].to_numpy()] = merged["c"].to_numpy()
    cms = cms.reshape(depth, width)
    n_total = int(cms[0].sum())
    if n_total == 0:
        import pandas as pd
        return pd.DataFrame({"term": pd.Series(dtype="object"),
                             "n_term": pd.Series(dtype="int64")})
    cms_ref = ray.put(cms)

    def prune(batch: pa.Table) -> pa.Table:
        mat = ray.get(cms_ref)
        terms = np.array(batch.column("term").to_pylist(), dtype=object)
        est = cms_estimate(mat, terms)
        return batch.filter(pa.array(est * k > n_total))

    cand_rows = (partials.map_batches(keep_cands, batch_format="pyarrow")
                 .groupby("term").aggregate(Sum("c", alias_name="c"))
                 .map_batches(prune, batch_format="pyarrow")
                 .take_all())
    candidates = {r["term"] for r in cand_rows}
    if not candidates:  # nothing clears the bar: empty result, fixed schema
        import pandas as pd
        return pd.DataFrame({"term": pd.Series(dtype="object"),
                             "n_term": pd.Series(dtype="int64")})
    cand_ref = ray.put(candidates)

    def recount(batch: pa.Table) -> pa.Table:
        from collections import Counter
        cset = ray.get(cand_ref)
        c = Counter(t for t in _tokens(batch.column(text_col).to_pylist())
                    if t in cset)
        return pa.table({"term": pa.array(list(c.keys()), pa.string()),
                         "n_term": pa.array(list(c.values()), pa.int64())})

    exact = (ds.map_batches(recount, batch_format="pyarrow")
             .groupby("term").aggregate(Sum("n_term", alias_name="n_term"))
             .to_pandas())
    exact = exact[exact["n_term"] * k > n_total]
    return (exact.sort_values(["n_term", "term"], ascending=[False, True])
            .reset_index(drop=True))


def _kmv_hash(values) -> np.ndarray:
    """Deterministic 60-bit hashes for KMV (md5 prefix — stable across
    processes, layouts, and runs; no seed state)."""
    import hashlib

    return np.array(
        [int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16)
         for v in values], dtype=np.int64)


def kmv_overlap(ds, key_col: str, item_col: str, k: int = 256):
    """KMV (k-minimum-values) distinct sketch with SET-OVERLAP
    estimation — the one thing HLL can't do: per key, keep the k
    smallest distinct item hashes; |A| ≈ (k−1)·2⁶⁰/h_(k); for a pair,
    the Jaccard estimate is ρ = |K(A∪B) ∩ K(A) ∩ K(B)| / k over the
    union's k-min set, and |A∩B| ≈ ρ·|A∪B|.  (Beyer et al. 2007,
    public.)  Exact when a key has ≤ k distinct items (the sketch IS
    the set).

    Scale shape: per-batch (key, sorted-k-min) partials → one keyed
    fold merges lists (k-bounded rows, items never shuffle);
    the pairwise step runs over the O(keys²)·k driver-side sketches —
    keys are event types / languages here (bounded domain), NOT users.
    Output: (key_a, key_b, est_a, est_b, est_union, est_inter) int64,
    plus self rows (key, key, est, est, est, est)."""
    import pandas as pd

    from .bucketing import key_buckets  # noqa: F401  (doc symmetry)

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "k": batch.column(key_col).to_numpy(zero_copy_only=False),
            "v": batch.column(item_col).to_numpy(zero_copy_only=False)})
        rows_k, rows_h = [], []
        for key, g in df.groupby("k", sort=False):
            hs = np.unique(_kmv_hash(pd.unique(g["v"])))[:k]
            rows_k.append(str(key))
            rows_h.append(hs.tolist())
        return pa.table({key_col: pa.array(rows_k, pa.string()),
                         "kmin": pa.array(rows_h,
                                          pa.list_(pa.int64()))})

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        key = g[key_col].iloc[0]
        hs = np.unique(np.concatenate(
            [np.asarray(x, np.int64) for x in g["kmin"]]))[:k]
        return pd.DataFrame({key_col: [key], "kmin": [hs.tolist()]})

    sketches = (ds.map_batches(partial, batch_format="pyarrow")
                .groupby(key_col).map_groups(merge, batch_format="pandas")
                ).to_pandas()

    FULL = 1 << 60  # Python int: (k−1)·2⁶⁰ must not wrap in int64

    def est(hs: np.ndarray) -> int:
        if len(hs) < k:          # exact: sketch holds the whole set
            return int(len(hs))
        return (k - 1) * FULL // int(hs[k - 1])

    keys = sketches[key_col].tolist()
    mins = [np.asarray(x, np.int64) for x in sketches["kmin"]]
    out = []
    for i in range(len(keys)):
        a = est(mins[i])
        out.append((keys[i], keys[i], a, a, a, a))
        for j in range(i + 1, len(keys)):
            b = est(mins[j])
            u = np.unique(np.concatenate([mins[i], mins[j]]))[:k]
            eu = est(u)
            both = np.intersect1d(u, mins[i], assume_unique=True)
            both = np.intersect1d(both, mins[j], assume_unique=True)
            inter = len(both) * eu // max(len(u), 1)
            out.append((keys[i], keys[j], a, b, eu, int(inter)))
    cols = ["key_a", "key_b", "est_a", "est_b", "est_union", "est_inter"]
    df = pd.DataFrame(out, columns=cols)
    return df.astype({c: "int64" for c in cols[2:]}).sort_values(
        ["key_a", "key_b"]).reset_index(drop=True)

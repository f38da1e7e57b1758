"""Text-analysis stages for large-scale training-data pipelines.

All deterministic, vectorized where the kernel allows, and stateless
(plain ``map_batches`` tasks).  These extend the reference's surface
(SURVEY.md: language-ID, quality scoring, token counting, document
fingerprinting are the training-data operators the graft adds).
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa

from .bucketing import tag_buckets_batch
import pyarrow.compute as pc

# BPE-ish pre-tokenization pattern (GPT-2 style, public knowledge)
_BPEISH_RE = re.compile(
    r"'s|'t|'re|'ve|'m|'ll|'d| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+")

_WS_RE = re.compile(r"\s+")

_STOPWORDS = {
    "en": {"the", "and", "of", "a", "to", "in", "is", "it", "that", "for"},
    "de": {"der", "die", "das", "und", "ist", "ein", "zu", "den", "von", "mit"},
    "fr": {"le", "la", "les", "et", "de", "un", "une", "est", "que", "pour"},
    "es": {"el", "la", "los", "de", "y", "un", "una", "es", "que", "por"},
}


def token_count_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Whitespace token count + BPE-ish piece count per row."""
    texts = batch.column(text_col).to_pylist()
    ws_counts = [len(t.split()) if t else 0 for t in texts]
    bpe_counts = [sum(1 for m in _BPEISH_RE.finditer(t) if not m.group().isspace())
                  if t else 0 for t in texts]
    return (batch
            .append_column("n_tokens_ws", pa.array(ws_counts, pa.int64()))
            .append_column("n_tokens_bpe", pa.array(bpe_counts, pa.int64())))


def quality_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Length / punctuation / stopword / digit ratios + a composite
    quality score in [0, 1].  Formula (documented, deterministic):
    score = clip(0.25·len_norm + 0.25·(1-punct) + 0.25·stop_norm
                 + 0.25·(1-digit), 0, 1)
    with len_norm = min(n_words/100, 1) and stop_norm =
    min(stop_ratio/0.4, 1) (prose has ~40% stopwords)."""
    texts = batch.column(text_col).to_pylist()
    n = len(texts)
    n_chars = np.zeros(n, np.int64)
    n_words = np.zeros(n, np.int64)
    punct_ratio = np.zeros(n, np.float64)
    stop_ratio = np.zeros(n, np.float64)
    digit_ratio = np.zeros(n, np.float64)
    all_stops = set().union(*_STOPWORDS.values())
    for i, t in enumerate(texts):
        t = t or ""
        n_chars[i] = len(t)
        words = t.lower().split()
        n_words[i] = len(words)
        if t:
            punct_ratio[i] = sum(not c.isalnum() and not c.isspace()
                                 for c in t) / len(t)
            digit_ratio[i] = sum(c.isdigit() for c in t) / len(t)
        if words:
            stop_ratio[i] = sum(w in all_stops for w in words) / len(words)
    len_norm = np.minimum(n_words / 100.0, 1.0)
    stop_norm = np.minimum(stop_ratio / 0.4, 1.0)
    score = np.clip(0.25 * len_norm + 0.25 * (1 - punct_ratio)
                    + 0.25 * stop_norm + 0.25 * (1 - digit_ratio), 0, 1)
    return (batch
            .append_column("n_chars_q", pa.array(n_chars))
            .append_column("n_words", pa.array(n_words))
            .append_column("punct_ratio", pa.array(punct_ratio))
            .append_column("stop_ratio", pa.array(stop_ratio))
            .append_column("digit_ratio", pa.array(digit_ratio))
            .append_column("quality", pa.array(score)))


def lang_id_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Heuristic language ID: script ranges (CJK/Cyrillic) else the
    stopword table with the most hits, default 'en'."""
    texts = batch.column(text_col).to_pylist()
    langs = []
    for t in texts:
        t = t or ""
        if any("一" <= c <= "鿿" for c in t[:200]):
            langs.append("zh")
            continue
        if any("Ѐ" <= c <= "ӿ" for c in t[:200]):
            langs.append("ru")
            continue
        words = set(t.lower().split())
        best_lang, best_hits = "en", 0
        for lang, stops in _STOPWORDS.items():
            hits = len(words & stops)
            if hits > best_hits:
                best_lang, best_hits = lang, hits
        langs.append(best_lang)
    return batch.append_column("lang_pred", pa.array(langs, pa.string()))


def fingerprint_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Document fingerprints:
    - ``fp_md5``: md5 of the whitespace-normalized lowercase text
      (SQL-replicable: md5(lower(regexp_replace(trim(text),'\\s+',' ','g'))))
    - ``fp_roll``: 63-bit Karp-Rabin rolling hash over the same
      normalization (base 1000003, mod 2^61-1)."""
    texts = batch.column(text_col).to_pylist()
    md5s, rolls = [], []
    mod = (1 << 61) - 1
    base = 1000003
    for t in texts:
        norm = _WS_RE.sub(" ", (t or "").strip()).lower()
        md5s.append(hashlib.md5(norm.encode("utf-8")).hexdigest())
        h = 0
        for ch in norm:
            h = (h * base + ord(ch)) % mod
        rolls.append(h)
    return (batch
            .append_column("fp_md5", pa.array(md5s, pa.string()))
            .append_column("fp_roll", pa.array(rolls, pa.int64())))


def add_text_hash_batch(batch: pa.Table, text_col: str = "text",
                        out_col: str = "text_md5") -> pa.Table:
    """md5(text) exactly — the exact-dedup key (no normalization)."""
    texts = batch.column(text_col).to_pylist()
    hashes = [hashlib.md5((t or "").encode("utf-8")).hexdigest() for t in texts]
    return batch.append_column(out_col, pa.array(hashes, pa.string()))


def repetition_batch(batch: pa.Table, text_col: str = "text",
                     id_col: str = "doc_id") -> pa.Table:
    """Gopher-style repetition quality signals per document
    (MassiveText rules: filter docs whose most frequent word / 2-gram
    accounts for too much of the text):

    - ``n_words``: lowercased whitespace-token count;
    - ``top_word_frac``: count of the most frequent word / n_words;
    - ``top_bigram_frac``: count of the most frequent consecutive
      word pair / (n_words - 1); 0.0 when fewer than 2 words.

    Fractions are rounded half-away-from-zero to 6 dp for SQL-oracle
    parity.  Pure map — no shuffle."""
    from collections import Counter

    ids = batch.column(id_col)
    n_words = []
    top_w = []
    top_b = []
    for t in batch.column(text_col).to_pylist():
        words = (t or "").lower().split()
        n = len(words)
        n_words.append(n)
        if n == 0:
            top_w.append(0.0)
            top_b.append(0.0)
            continue
        top_w.append(max(Counter(words).values()) / n)
        if n < 2:
            top_b.append(0.0)
        else:
            top_b.append(max(Counter(zip(words, words[1:])).values())
                         / (n - 1))

    def _r6(xs):
        return np.floor(np.asarray(xs, dtype=np.float64) * 1e6 + 0.5) / 1e6

    return pa.table({
        id_col: ids,
        "n_words": pa.array(np.asarray(n_words, dtype=np.int64)),
        "top_word_frac": pa.array(_r6(top_w), pa.float64()),
        "top_bigram_frac": pa.array(_r6(top_b), pa.float64()),
    })


_PII_PATTERNS: tuple = (
    (re.compile(r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
     "<EMAIL>"),
    (re.compile(r"\d{2,}"), "<NUM>"),
)


def redact_batch(batch: pa.Table, text_col: str = "text",
                 out_col: str = "redacted",
                 count_col: str = "n_redacted",
                 patterns=None) -> pa.Table:
    """PII scrubbing (curation): apply each (compiled-regex,
    replacement) pair IN ORDER to the text, counting total
    replacements.  Later patterns see earlier patterns' output — the
    oracle must chain its ``regexp_replace`` calls the same way.
    Default pattern set: emails, then runs of ≥2 digits.  Patterns are
    RE2-compatible (no backrefs/lookarounds) so SQL engines replicate
    them exactly.  Pure map, no shuffle; regexes compiled once at
    module import."""
    pats = _PII_PATTERNS if patterns is None else patterns
    texts = batch.column(text_col).to_pylist()
    out = []
    counts = np.zeros(len(texts), np.int64)
    for i, t in enumerate(texts):
        s = t or ""
        total = 0
        for pat, repl in pats:
            s, n = pat.subn(repl, s)
            total += n
        out.append(s)
        counts[i] = total
    return (batch
            .append_column(out_col, pa.array(out, pa.string()))
            .append_column(count_col, pa.array(counts)))


# ---------------------------------------------------------------------------
# n-gram language-model perplexity (model-based quality scoring)
# ---------------------------------------------------------------------------

def _unigram_bigram_partial(batch: pa.Table, text_col: str) -> pa.Table:
    """Per-batch unigram/bigram counts (the combiner: token streams
    collapse to (gram, n) rows before the one keyed shuffle)."""
    from collections import Counter

    uni: Counter = Counter()
    bi: Counter = Counter()
    for t in batch.column(text_col).to_pylist():
        ws = (t or "").lower().split()
        uni.update(ws)
        bi.update(" ".join(p) for p in zip(ws, ws[1:]))
    grams = [("u:" + g, n) for g, n in uni.items()] + \
            [("b:" + g, n) for g, n in bi.items()]
    return pa.table({
        "gram": pa.array([g for g, _ in grams], pa.string()),
        "n": pa.array([n for _, n in grams], pa.int64())})


def train_bigram_lm(ds, text_col: str = "text", max_bigrams: int = 1 << 16,
                    max_unigrams: int = 1 << 17):
    """Corpus bigram LM with Laplace smoothing, trained distributed:
    per-batch count combiners → one keyed Sum → the model (top
    unigram/bigram counts + vocab size) pulled to the driver for
    broadcast.

    BOTH tables are CAPPED deterministically (kept by count desc, gram
    asc): a dropped bigram scores as unseen; a dropped (rare) unigram
    scores with count 0 in the smoothed numerator's denominator — the
    vocab size ``v`` used for smoothing stays EXACT (a distributed
    count, never a driver pull), so the cap only perturbs scores of
    documents dominated by out-of-cap rare words.  Broadcast is
    O(max_unigrams + max_bigrams) regardless of corpus size — no
    unbounded ``take_all`` of the vocabulary (ADVICE r03).
    Returns (uni: dict, bi: dict, v: int)."""
    from ray.data.aggregate import Sum

    # materialize: the unigram and bigram consumers below would each
    # re-execute the tokenize + keyed-Sum shuffle otherwise (Dataset
    # lineage is not cached across consumers)
    counts = (ds.map_batches(_unigram_bigram_partial,
                             batch_format="pyarrow",
                             fn_kwargs=dict(text_col=text_col))
              .groupby("gram").aggregate(Sum("n", alias_name="n"))
              ).materialize()

    import pyarrow.compute as pc

    def split(batch: pa.Table, want_prefix: str) -> pa.Table:
        mask = pc.starts_with(batch.column("gram"), want_prefix)
        return batch.filter(mask)

    uni_ds = counts.map_batches(split, batch_format="pyarrow",
                                fn_kwargs=dict(want_prefix="u:")
                                ).materialize()
    vocab_size = uni_ds.count()  # exact V for smoothing, never pulled
    # distributed top-k: total order (n desc, gram asc) then limit —
    # only the capped head reaches the driver
    uni_rows = (uni_ds.sort(["n", "gram"], descending=[True, False])
                .limit(max_unigrams).take_all())
    uni = {r["gram"][2:]: int(r["n"]) for r in uni_rows}

    bi_ds = counts.map_batches(split, batch_format="pyarrow",
                               fn_kwargs=dict(want_prefix="b:"))
    bi_rows = (bi_ds.sort(["n", "gram"], descending=[True, False])
               .limit(max_bigrams).take_all())
    bi = {r["gram"][2:]: int(r["n"]) for r in bi_rows}
    return uni, bi, vocab_size


def perplexity_batch(batch: pa.Table, model_ref, text_col: str = "text",
                     id_col: str = "doc_id") -> pa.Table:
    """Per-document bigram perplexity under the broadcast LM:
    nll = -(1/n)·Σ ln((c(w1 w2)+1) / (c(w1)+V)), ppl = exp(nll).
    Deterministic: bigrams are summed in document order with float64,
    so the distributed result equals a single-process scorer exactly."""
    import ray

    uni, bi, v = ray.get(model_ref)
    ids = batch.column(id_col)
    nlls, ppls, ns = [], [], []
    for t in batch.column(text_col).to_pylist():
        ws = (t or "").lower().split()
        pairs = list(zip(ws, ws[1:]))
        if not pairs:
            nlls.append(0.0)
            ppls.append(1.0)
            ns.append(0)
            continue
        total = np.float64(0.0)
        for w1, w2 in pairs:
            c_bi = bi.get(f"{w1} {w2}", 0)
            c_uni = uni.get(w1, 0)
            total += np.log((c_bi + 1.0) / (c_uni + v))
        nll = -total / len(pairs)
        nlls.append(float(nll))
        ppls.append(float(np.exp(nll)))
        ns.append(len(pairs))
    return pa.table({
        id_col: ids,
        "n_bigrams": pa.array(ns, pa.int64()),
        "nll": pa.array(nlls, pa.float64()),
        "ppl": pa.array(ppls, pa.float64())})


def ngram_lm_perplexity(ds, text_col: str = "text", id_col: str = "doc_id",
                        max_bigrams: int = 1 << 16):
    """Train-broadcast-score: the LM trains on the full Dataset (one
    keyed shuffle of gram partials), ships ONCE via ``ray.put``, and
    every batch scores against the same handle — the model-based
    quality-filter shape (perplexity gates à la CCNet/Gopher) with a
    deterministic n-gram model standing in for the neural scorer this
    container can't run."""
    import ray

    model_ref = ray.put(train_bigram_lm(ds, text_col=text_col,
                                        max_bigrams=max_bigrams))
    return ds.map_batches(perplexity_batch, batch_format="pyarrow",
                          fn_kwargs=dict(model_ref=model_ref,
                                         text_col=text_col,
                                         id_col=id_col))


def json_extract_int_batch(batch: pa.Table, col: str, key: str,
                           out_col: str) -> pa.Table:
    """Semi-structured payload extraction: pull an integer field out of
    a JSON-string column (the event-properties shape).  Missing keys /
    malformed JSON become null.  Float values ROUND half away from zero
    like DuckDB's ``CAST(... AS BIGINT)`` (int() would truncate 3.7 → 3
    and silently diverge from the SQL twin; Python's round() is
    half-to-even and diverges at exact .5); the synth events table
    holds integer values only, so this path is exercised by unit
    tests, not the oracle."""
    import json
    import math

    vals = []
    for s in batch.column(col).to_pylist():
        try:
            v = json.loads(s).get(key) if s else None
        except (json.JSONDecodeError, AttributeError):
            v = None
        if isinstance(v, bool) or not isinstance(v, (int, float)):
            vals.append(None)
        elif isinstance(v, float):
            if v != v or math.isinf(v):
                vals.append(None)
            else:
                vals.append(int(math.floor(v + 0.5) if v >= 0
                                else math.ceil(v - 0.5)))
        else:
            vals.append(int(v))
    return batch.append_column(out_col, pa.array(vals, pa.int64()))


def bm25_scores(ds, terms, k1: float = 1.2, b: float = 0.75,
                doc_id_col: str = "doc_id", text_col: str = "text"):
    """BM25 relevance of every matching document against a FIXED small
    query-term set (Robertson/Spärck Jones probabilistic ranking; the
    Lucene idf variant ``ln((N - df + 0.5)/(df + 0.5) + 1)``), scored
    in floor(score·10⁶ + 0.5) integer micro-units so the DuckDB twin
    hashes identically (same trick as the tfidf oracle).

    Scale shape: ONE tokenize pass collapses each doc to a fixed-width
    row (doc_id, dl, tf per query term) — |terms| is a query constant,
    so there is NO (doc, term) explode and no shuffle at all.  Corpus
    stats (N, Σdl, df per term) reduce per batch to one partial row;
    the driver folds O(blocks) partials, broadcasts three scalars per
    term, and a second vectorized pass over the (materialized) slim
    rows emits scores.  Docs containing no query term are dropped
    (their score is 0), empty/whitespace docs are excluded from the
    corpus stats — both matching the SQL twin.

    Exactness note: both sides evaluate the same double-precision
    expression tree; only the final sum's term order differs, so the
    micro-rounding could in principle flip on a score within ~1e-10 of
    a .5 micro boundary — immaterial against real data, and locked by
    the oracle at both test scales.
    """
    import pandas as pd

    terms = list(terms)
    if not terms:
        raise ValueError("terms must be non-empty")
    tf_cols = [f"_tf{i}" for i in range(len(terms))]

    def tokenize(batch: pa.Table) -> pa.Table:
        ids, dls = [], []
        tfs = [[] for _ in terms]
        for doc_id, text in zip(
                batch.column(doc_id_col).to_pylist(),
                batch.column(text_col).to_pylist()):
            toks = (text or "").strip().lower().split()
            if not toks:
                continue
            ids.append(doc_id)
            dls.append(len(toks))
            for i, t in enumerate(terms):
                tfs[i].append(toks.count(t))
        cols = {doc_id_col: pa.array(ids, pa.int64()),
                "_dl": pa.array(dls, pa.int64())}
        for c, v in zip(tf_cols, tfs):
            cols[c] = pa.array(v, pa.int64())
        return pa.table(cols)

    slim = ds.map_batches(tokenize, batch_format="pyarrow").materialize()

    def stats_partial(df: "pd.DataFrame") -> "pd.DataFrame":
        row = {"_n": np.int64(len(df)),
               "_sum_dl": df["_dl"].sum().astype("int64")
               if len(df) else np.int64(0)}
        for c in tf_cols:
            row[f"df{c}"] = np.int64((df[c] > 0).sum())
        return pd.DataFrame([row])

    stats = slim.map_batches(stats_partial, batch_format="pandas"
                             ).to_pandas().sum()
    n_docs = int(stats["_n"])
    if n_docs == 0:
        return pd.DataFrame({doc_id_col: pd.Series([], dtype="int64"),
                             "bm25_micro": pd.Series([], dtype="int64")})
    avgdl = float(stats["_sum_dl"]) / float(n_docs)
    idf = np.array([np.log((n_docs - float(stats[f"df{c}"]) + 0.5)
                           / (float(stats[f"df{c}"]) + 0.5) + 1.0)
                    for c in tf_cols])

    def score(df: "pd.DataFrame") -> "pd.DataFrame":
        tf = df[tf_cols].to_numpy(dtype=np.float64)
        dl = df["_dl"].to_numpy(dtype=np.float64)
        denom = tf + k1 * (1.0 - b + (b * dl[:, None]) / avgdl)
        s = np.where(tf > 0, idf[None, :] * tf * (k1 + 1.0) / denom,
                     0.0).sum(axis=1)
        keep = (df[tf_cols].to_numpy() > 0).any(axis=1)
        return pd.DataFrame({
            doc_id_col: df[doc_id_col].to_numpy()[keep],
            "bm25_micro": np.floor(s[keep] * 1e6 + 0.5).astype(np.int64),
        })

    return slim.map_batches(score, batch_format="pandas")


def group_token_entropy(ds, group_col: str = "lang",
                        text_col: str = "text", n_buckets: int = 64):
    """Shannon entropy of the token distribution per group, in integer
    micro-nats — the corpus-diversity diagnostic (a language whose
    token entropy collapses is boilerplate / spam).

    Scale shape: per-batch (group, term) partial counts → ONE bucketed
    shuffle keyed on term (every copy of a (group, term) cell lands
    together, giving exact global counts) → per-block (group, Σc,
    Σc·ln c) partials → a tiny final fold per group.  Derivation
    ``H = ln(N) − (Σ c·ln c)/N`` matches the SQL twin's expression
    tree; only float summation order differs (micro-rounding note as
    in bm25_scores).  Output: (group, entropy_micro int64).
    """
    import pandas as pd

    from .bucketing import key_buckets

    def counts_partial(batch: pa.Table) -> pa.Table:
        from collections import Counter
        acc: "Counter" = Counter()
        for grp, text in zip(batch.column(group_col).to_pylist(),
                             batch.column(text_col).to_pylist()):
            toks = (text or "").strip().lower().split()
            for t in toks:
                acc[(grp, t)] += 1
        groups, terms, cs = [], [], []
        for (grp, t), c in acc.items():
            groups.append(grp)
            terms.append(t)
            cs.append(c)
        return pa.table({group_col: pa.array(groups, pa.string()),
                         "_term": pa.array(terms, pa.string()),
                         "_c": pa.array(cs, pa.int64())})

    def fold_counts(g: "pd.DataFrame") -> "pd.DataFrame":
        cnt = (g.groupby([group_col, "_term"], sort=False)["_c"].sum()
               .astype("int64").reset_index())
        c = cnt["_c"].to_numpy(dtype=np.float64)
        part = pd.DataFrame({group_col: cnt[group_col],
                             "_n": cnt["_c"].astype("int64"),
                             "_s": c * np.log(c)})
        out = part.groupby(group_col, sort=False).agg(
            n=("_n", "sum"), s=("_s", "sum")).reset_index()
        out["n"] = out["n"].astype("int64")
        return out

    def finish(df: "pd.DataFrame") -> "pd.DataFrame":
        g = df.groupby(group_col, sort=False).agg(
            n=("n", "sum"), s=("s", "sum")).reset_index()
        n = g["n"].to_numpy(dtype=np.float64)
        h = np.log(n) - g["s"].to_numpy() / n
        return pd.DataFrame({
            group_col: g[group_col],
            "entropy_micro": np.floor(h * 1e6 + 0.5).astype(np.int64)})

    part = ds.map_batches(counts_partial, batch_format="pyarrow")
    tagged = part.map_batches(
        tag_buckets_batch, batch_format="pyarrow",
        fn_kwargs=dict(key_col="_term", n_buckets=n_buckets))
    folded = tagged.groupby("_b").map_groups(fold_counts,
                                             batch_format="pandas")
    # final fold: O(groups × buckets) rows — one tiny single-task pass
    return folded.repartition(1).map_batches(finish,
                                             batch_format="pandas")


def compression_ratio_batch(batch: pa.Table, text_col: str = "text",
                            id_col: str = "doc_id",
                            level: int = 6) -> pa.Table:
    """zlib compression ratio per document (compressed/raw bytes, 6-dp)
    — the classic redundancy signal for training-data quality gates:
    boilerplate and repeated spans compress far below natural prose
    (public heuristic, e.g. Gopher/RefinedWeb filtering rules).
    Stateless vectorized-enough batch kernel (zlib is C; the Python
    loop is I/O over rows, same shape as the other text kernels).
    Empty docs emit ratio 0.
    """
    import zlib

    ids = batch.column(id_col)
    ratios = []
    for text in batch.column(text_col).to_pylist():
        raw = (text or "").encode("utf-8")
        if not raw:
            ratios.append(0.0)
            continue
        comp = zlib.compress(raw, level)
        ratios.append(round(len(comp) / len(raw), 6))
    return pa.table({id_col: ids,
                     "compression_ratio": pa.array(ratios, pa.float64())})


def pmi_collocations(ds, min_count: int = 5, text_col: str = "text",
                     n_buckets: int = 64):
    """Collocation mining: pointwise mutual information of adjacent
    token bigrams, ``pmi = ln(P(xy) / (P(x)·P(y)))`` in integer
    micro-nats, for bigrams seen ≥ ``min_count`` times (Church & Hanks
    1990 — the classic collocation statistic).

    Scale shape: per-batch unigram+bigram Counter partials (one
    tokenize pass, mixed rows distinguished by an empty w2); ONE
    bucketed shuffle keyed on w1 folds exact global counts; bigrams
    then pick up c(x) and c(y) via two union-then-merge bucketed
    passes (the triangle-count degree pattern — never a driver dict).
    Totals fold from O(bucket) partial rows.  The PMI expression tree
    — ``(c·Nu·Nu) / (Nb·cx·cy)`` left-associated, then ln, then
    floor(·1e6 + 0.5) — matches the SQL twin exactly.  Output:
    (w1, w2, n, pmi_micro).
    """
    import pandas as pd

    from .bucketing import key_buckets

    if min_count < 1:
        raise ValueError(f"min_count must be >= 1, got {min_count}")

    def partial(batch: pa.Table) -> pa.Table:
        from collections import Counter
        uni: "Counter" = Counter()
        big: "Counter" = Counter()
        for text in batch.column(text_col).to_pylist():
            toks = (text or "").strip().lower().split()
            uni.update(toks)
            big.update(zip(toks, toks[1:]))
        w1s, w2s, cs = [], [], []
        for w, c in uni.items():
            w1s.append(w)
            w2s.append("")
            cs.append(c)
        for (a, b), c in big.items():
            w1s.append(a)
            w2s.append(b)
            cs.append(c)
        return pa.table({"w1": pa.array(w1s, pa.string()),
                         "w2": pa.array(w2s, pa.string()),
                         "_c": pa.array(cs, pa.int64())})

    def fold(g: "pd.DataFrame") -> "pd.DataFrame":
        out = (g.groupby(["w1", "w2"], sort=False)["_c"].sum()
               .astype("int64").reset_index())
        return out

    part = ds.map_batches(partial, batch_format="pyarrow")
    tagged = part.map_batches(
        tag_buckets_batch, batch_format="pyarrow",
        fn_kwargs=dict(key_col="w1", n_buckets=n_buckets))
    counts = tagged.groupby("_b").map_groups(
        fold, batch_format="pandas").materialize()

    # small-vocab fast path (per-group-overhead rule): the exact
    # global (w1, w2, c) aggregate already exists — when it is modest,
    # the totals + two count merges + PMI all run in ONE task with
    # local pandas merges (same expression tree, same float order)
    if 0 < counts.count() <= 5_000_000:
        def local_pmi(df: "pd.DataFrame") -> "pd.DataFrame":
            df = (df.groupby(["w1", "w2"], sort=False)["_c"].sum()
                  .astype("int64").reset_index())
            uni = df[df["w2"] == ""][["w1", "_c"]]
            nu_l = float(uni["_c"].sum())
            nb_l = float(df.loc[df["w2"] != "", "_c"].sum())
            big = df[(df["w2"] != "") & (df["_c"] >= min_count)]
            m = big.merge(uni.rename(columns={"_c": "_cx"}), on="w1")
            m = m.merge(uni.rename(columns={"w1": "w2", "_c": "_cy"}),
                        on="w2")
            c = m["_c"].to_numpy(dtype=np.float64)
            cx = m["_cx"].to_numpy(dtype=np.float64)
            cy = m["_cy"].to_numpy(dtype=np.float64)
            pmi = np.log((c * nu_l * nu_l) / (nb_l * cx * cy))
            return pd.DataFrame({
                "w1": m["w1"], "w2": m["w2"],
                "n": m["_c"].astype("int64"),
                "pmi_micro": np.floor(pmi * 1e6 + 0.5).astype(np.int64)})

        return counts.repartition(1).map_batches(
            local_pmi, batch_format="pandas", batch_size=None)

    # totals: O(blocks) partial rows to the driver
    totals = counts.map_batches(
        lambda df: pd.DataFrame({
            "nu": [np.int64(df.loc[df["w2"] == "", "_c"].sum())],
            "nb": [np.int64(df.loc[df["w2"] != "", "_c"].sum())]}),
        batch_format="pandas").to_pandas().sum()
    nu, nb = float(totals["nu"]), float(totals["nb"])

    def merge_on(rows_ds, row_cols, key: str, c_col: str):
        """Attach unigram count c(key) to bigram rows: union-then-merge
        bucketed on the word.  ``row_cols`` is the rows' exact column
        list, passed explicitly (a mutated closure variable would be
        read at lazy-execution time, after the next call changed it)."""

        def tag_rows(df: "pd.DataFrame") -> "pd.DataFrame":
            out = df.copy()
            out["_node"] = df[key]
            out["_uc"] = np.int64(-1)
            return out

        def tag_uni(df: "pd.DataFrame") -> "pd.DataFrame":
            u = df[df["w2"] == ""]
            out = pd.DataFrame(index=range(len(u)))
            for c in row_cols:
                out[c] = "" if c in ("w1", "w2") else np.int64(0)
            out["_node"] = u["w1"].to_numpy()
            out["_uc"] = u["_c"].to_numpy().astype(np.int64)
            return out

        def merge(g: "pd.DataFrame") -> "pd.DataFrame":
            u = g[g["_uc"] >= 0][["_node", "_uc"]].drop_duplicates()
            r = g[g["_uc"] < 0].drop(columns=["_uc"])
            m = r.merge(u, on="_node")
            m = m.rename(columns={"_uc": c_col}).drop(columns=["_node"])
            return m.reset_index(drop=True)

        union = (rows_ds.map_batches(tag_rows, batch_format="pandas")
                 .union(counts.map_batches(tag_uni,
                                           batch_format="pandas")))
        tg = union.map_batches(
            lambda df: df.assign(_b2=key_buckets(df["_node"].to_numpy(),
                                                 n_buckets)),
            batch_format="pandas")
        return tg.groupby("_b2").map_groups(merge, batch_format="pandas")

    bigrams = counts.map_batches(
        lambda df: df[(df["w2"] != "") & (df["_c"] >= min_count)]
        .reset_index(drop=True),
        batch_format="pandas")

    with_cx = merge_on(bigrams, ["w1", "w2", "_c"], "w1", "_cx")
    with_cy = merge_on(with_cx, ["w1", "w2", "_c", "_cx"], "w2", "_cy")

    def finish(df: "pd.DataFrame") -> "pd.DataFrame":
        c = df["_c"].to_numpy(dtype=np.float64)
        cx = df["_cx"].to_numpy(dtype=np.float64)
        cy = df["_cy"].to_numpy(dtype=np.float64)
        pmi = np.log((c * nu * nu) / (nb * cx * cy))
        return pd.DataFrame({
            "w1": df["w1"], "w2": df["w2"],
            "n": df["_c"].astype("int64"),
            "pmi_micro": np.floor(pmi * 1e6 + 0.5).astype(np.int64)})

    return with_cy.map_batches(finish, batch_format="pandas")


def hapax_stats(ds, group_col: str = "lang", text_col: str = "text",
                n_buckets: int = 64):
    """Hapax-legomena rate per group: the fraction of a language's
    DISTINCT vocabulary that occurs exactly once in the corpus — high
    hapax = fresh long-tail text, collapsing hapax = template spam /
    dedup failure.  Companion diagnostic to ``group_token_entropy``
    (same whitespace tokenizer, same oracle contract).

    Scale shape: per-batch (group, term) partial counts → ONE bucketed
    shuffle keyed on the (group, term) cell (exact global counts) →
    per-bucket (n_terms, n_hapax) partials → native groupby over the
    bounded group alphabet.  Output: (group, n_terms int64,
    n_hapax int64, hapax_micro int64 = round(hapax/terms·1e6)).
    """
    import pandas as pd

    from ray.data.aggregate import Sum

    from .bucketing import key_buckets

    def counts_partial(batch: pa.Table) -> pa.Table:
        from collections import Counter
        acc: "Counter" = Counter()
        for grp, text in zip(batch.column(group_col).to_pylist(),
                             batch.column(text_col).to_pylist()):
            for t in (text or "").strip().lower().split():
                acc[(grp, t)] += 1
        groups, terms, cs = [], [], []
        for (grp, t), c in acc.items():
            groups.append(grp)
            terms.append(t)
            cs.append(c)
        return pa.table({group_col: pa.array(groups, pa.string()),
                         "_term": pa.array(terms, pa.string()),
                         "_c": pa.array(cs, pa.int64())})

    def fold(g: "pd.DataFrame") -> "pd.DataFrame":
        cnt = (g.groupby([group_col, "_term"], sort=False)["_c"].sum()
               .reset_index())
        part = cnt.groupby(group_col, sort=False).agg(
            _terms=("_c", "size"),
            _hapax=("_c", lambda s: int((s == 1).sum()))).reset_index()
        part["_terms"] = part["_terms"].astype("int64")
        part["_hapax"] = part["_hapax"].astype("int64")
        return part

    def cell_buckets(df: "pd.DataFrame") -> "pd.DataFrame":
        cell = (df[group_col].astype(str) + "\x1f" + df["_term"])
        return df.assign(_b=key_buckets(cell.to_numpy(), n_buckets))

    part = (ds.map_batches(counts_partial, batch_format="pyarrow")
            .map_batches(cell_buckets, batch_format="pandas")
            .groupby("_b").map_groups(fold, batch_format="pandas"))
    agg = part.groupby(group_col).aggregate(
        Sum("_terms", alias_name="n_terms"),
        Sum("_hapax", alias_name="n_hapax"))

    def finish(df: "pd.DataFrame") -> "pd.DataFrame":
        rate = np.floor(df["n_hapax"].to_numpy(np.float64)
                        / df["n_terms"].to_numpy(np.float64) * 1e6
                        + 0.5).astype(np.int64)
        return df.assign(n_terms=df["n_terms"].astype("int64"),
                         n_hapax=df["n_hapax"].astype("int64"),
                         hapax_micro=rate)

    return agg.map_batches(finish, batch_format="pandas")


_WORD_AZ_RE = re.compile(r"[A-Za-z]+")
_SENT_END_RE = re.compile(r"[.!?]+")
_VOWEL_RUN_RE = re.compile(r"[aeiouy]+")


def readability_batch(batch: pa.Table, text_col: str = "text",
                      id_col: str = "doc_id") -> pa.Table:
    """Flesch reading-ease screen in exact integer micro-points:

        flesch_micro = 206_835_000
                       - (1_015_000 * n_words) // max(n_sents, 1)
                       - (84_600_000 * n_syll) // max(n_words, 1)

    with n_words = count of ``[A-Za-z]+`` runs, n_sents = count of
    ``[.!?]+`` runs (floored to 1), and n_syll = the standard
    vowel-group syllable approximation (count of ``[aeiouy]+`` runs in
    the lowercased text).  Floor division keeps the score int64 and
    bit-identical to the DuckDB ``regexp_extract_all`` twin — the
    float formula would round differently across engines.  Stateless
    per-batch map, compiled module-level regexes, zero shuffles."""
    texts = batch.column(text_col).to_pylist()
    n = len(texts)
    words = np.zeros(n, np.int64)
    sents = np.zeros(n, np.int64)
    sylls = np.zeros(n, np.int64)
    for i, t in enumerate(texts):
        if not t:
            continue
        words[i] = sum(1 for _ in _WORD_AZ_RE.finditer(t))
        sents[i] = sum(1 for _ in _SENT_END_RE.finditer(t))
        sylls[i] = sum(1 for _ in _VOWEL_RUN_RE.finditer(t.lower()))
    flesch = (206_835_000
              - (1_015_000 * words) // np.maximum(sents, 1)
              - (84_600_000 * sylls) // np.maximum(words, 1))
    return pa.table({
        id_col: batch.column(id_col),
        "n_words": pa.array(words, pa.int64()),
        "n_sents": pa.array(sents, pa.int64()),
        "n_syll": pa.array(sylls, pa.int64()),
        "flesch_micro": pa.array(flesch, pa.int64()),
    })


def corpus_summary(ds, text_col: str = "text", lang_col: str = "lang",
                   source_col: str = "source", n_buckets: int = 64):
    """One-row dataset-card panel: document count, whitespace-token
    total, distinct languages/sources, exact-duplicate rate — the
    header numbers every corpus release publishes.

    Scale shape: three independent partial streams union into one
    final single-row fold — (a) per-batch (n_docs, total_tokens)
    scalars, (b) per-bucket distinct-md5 counts (each digest lands in
    exactly one ``hash(md5) % B`` bucket, so bucket-local uniques sum
    exactly), (c) per-batch distinct (lang, source) pairs collapsing
    to a bounded native groupby.  Nothing wider than O(B + |langs| ×
    |sources|) reaches the fold.  ``dup_rate_micro`` =
    ``floor(1e6·(1 − distinct/total) + 0.5)``.  Output: one row
    (n_docs, total_tokens, n_langs, n_sources, n_unique_texts,
    dup_rate_micro).
    """
    import pandas as pd

    from .bucketing import key_buckets

    def scalars(df: "pd.DataFrame") -> "pd.DataFrame":
        toks = df[text_col].fillna("").astype(str).str.split().str.len()
        return pd.DataFrame({
            "kind": ["scalar"], "a": [np.int64(len(df))],
            "b": [np.int64(toks.sum())]})

    def hash_rows(df: "pd.DataFrame") -> "pd.DataFrame":
        import hashlib
        h = [hashlib.md5(str(t).encode()).hexdigest()
             for t in df[text_col].fillna("")]
        out = pd.DataFrame({"gh": h}).drop_duplicates()
        out["_b"] = key_buckets(out["gh"].to_numpy(), n_buckets)
        return out

    def bucket_distinct(g: "pd.DataFrame") -> "pd.DataFrame":
        return pd.DataFrame({
            "kind": ["uniq"],
            "a": [np.int64(g["gh"].nunique())], "b": [np.int64(0)]})

    def cat_rows(df: "pd.DataFrame") -> "pd.DataFrame":
        out = df[[lang_col, source_col]].drop_duplicates()
        return pd.DataFrame({"lang": out[lang_col].astype(str),
                             "source": out[source_col].astype(str)})

    def cats_fold(df: "pd.DataFrame") -> "pd.DataFrame":
        return pd.DataFrame({
            "kind": ["cats"],
            "a": [np.int64(df["lang"].nunique())],
            "b": [np.int64(df["source"].nunique())]})

    def finish(df: "pd.DataFrame") -> "pd.DataFrame":
        sc = df[df["kind"] == "scalar"]
        uq = df[df["kind"] == "uniq"]
        ct = df[df["kind"] == "cats"]
        n_docs = int(sc["a"].sum())
        total_tokens = int(sc["b"].sum())
        n_unique = int(uq["a"].sum())
        dup = 0 if n_docs == 0 else int(
            np.floor(1e6 * (1.0 - n_unique / n_docs) + 0.5))
        return pd.DataFrame({
            "n_docs": pd.array([n_docs], dtype="int64"),
            "total_tokens": pd.array([total_tokens], dtype="int64"),
            "n_langs": pd.array([int(ct["a"].sum())], dtype="int64"),
            "n_sources": pd.array([int(ct["b"].sum())], dtype="int64"),
            "n_unique_texts": pd.array([n_unique], dtype="int64"),
            "dup_rate_micro": pd.array([dup], dtype="int64")})

    sc = ds.map_batches(scalars, batch_format="pandas")
    uq = (ds.map_batches(hash_rows, batch_format="pandas")
          .groupby("_b").map_groups(bucket_distinct,
                                    batch_format="pandas"))
    ct = (ds.map_batches(cat_rows, batch_format="pandas")
          .repartition(1)
          .map_batches(cats_fold, batch_format="pandas",
                       batch_size=None))
    return (sc.union(uq).union(ct)
            .repartition(1)
            .map_batches(finish, batch_format="pandas", batch_size=None))


def zipf_slope(ds, text_col: str = "text", top_n: int = 100):
    """Zipf rank-frequency slope over the corpus' top-``top_n`` terms
    — OLS of ln(count) on ln(rank); natural text sits near −1, and a
    big departure flags boilerplate floods or synthetic/spam corpora
    (Zipf 1949, public).  Tokenization is the ``top_terms`` contract
    (``\\w+`` on lowered text; ASCII-equivalent to the SQL twin's
    ``[\\p{L}\\p{N}_]+`` — same documented caveat).

    Scale shape: per-batch Counter partials (terms ≪ tokens) → one
    keyed Sum → the rank/fit runs in a single task over the
    O(distinct terms) aggregate, of which only ``top_n`` enter the
    fit (count desc, term asc — the deterministic top-terms order).
    Output: one row (zipf_slope_micro, n_terms).
    """
    import re
    from collections import Counter

    import pandas as pd
    from ray.data.aggregate import Sum

    pat = re.compile(r"\w+")

    def partial(b: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for t in b.column(text_col).to_pylist():
            c.update(pat.findall((t or "").lower()))
        return pa.table({
            "term": pa.array(list(c.keys()), pa.string()),
            "_n": pa.array(list(c.values()), pa.int64())})

    def fit(df: "pd.DataFrame") -> "pd.DataFrame":
        df = df.sort_values(["n", "term"], ascending=[False, True],
                            kind="mergesort").head(top_n)
        k = len(df)
        if k < 2:
            return pd.DataFrame({
                "zipf_slope_micro": pd.array([0], dtype="int64"),
                "n_terms": pd.array([k], dtype="int64")})
        r = np.arange(1, k + 1, dtype=np.float64)
        x = np.log(r)
        y = np.log(df["n"].to_numpy(dtype=np.float64))
        sx, sy = x.sum(), y.sum()
        sxy, sx2 = (x * y).sum(), (x * x).sum()
        slope = (k * sxy - sx * sy) / (k * sx2 - sx * sx)
        return pd.DataFrame({
            "zipf_slope_micro": pd.array(
                [int(np.floor(1e6 * slope + 0.5))], dtype="int64"),
            "n_terms": pd.array([k], dtype="int64")})

    counts = (ds.map_batches(partial, batch_format="pyarrow")
              .groupby("term").aggregate(Sum("_n", alias_name="n")))
    return counts.repartition(1).map_batches(
        fit, batch_format="pandas", batch_size=None)


def top_terms_per_group(ds, group_col: str = "lang",
                        text_col: str = "text", k: int = 5,
                        n_buckets: int = 64):
    """Top-``k`` terms per group by (count desc, term asc) — the
    per-language vocabulary panel (``top_terms`` is the global
    variant; the tokenizer contract is shared).

    Scale shape: per-batch (group, term) Counter partials → ONE
    bucketed shuffle keyed on the (group, term) CELL (exact global
    counts; a group's terms spread over buckets, which is fine
    because the top-k cut needs global per-cell counts, not
    co-located groups) → a second tiny shuffle of per-bucket
    top-k candidates keyed on the group picks the true top-k (a
    bucket's local top-k contains every global top-k member whose
    cell hashed there).  Output: (group, term, n, rank 1..k).
    """
    import re
    from collections import Counter

    import pandas as pd

    from .bucketing import key_buckets

    pat = re.compile(r"\w+")

    def partial(b: pa.Table) -> pa.Table:
        acc: "Counter" = Counter()
        for grp, text in zip(b.column(group_col).to_pylist(),
                             b.column(text_col).to_pylist()):
            for tok in pat.findall((text or "").lower()):
                acc[(grp, tok)] += 1
        keys = list(acc.keys())
        return pa.table({
            group_col: pa.array([g for g, _ in keys], pa.string()),
            "term": pa.array([t for _, t in keys], pa.string()),
            "_c": pa.array(list(acc.values()), pa.int64())})

    def cell_fold(g: "pd.DataFrame") -> "pd.DataFrame":
        out = (g.groupby([group_col, "term"], sort=False)["_c"].sum()
               .astype("int64").reset_index())
        # local candidate cut: global top-k per group is a subset of
        # the union of per-bucket top-k (counts here are global-exact)
        out = (out.sort_values([group_col, "_c", "term"],
                               ascending=[True, False, True],
                               kind="mergesort")
               .groupby(group_col, sort=False).head(k))
        return out.reset_index(drop=True)

    def final_cut(g: "pd.DataFrame") -> "pd.DataFrame":
        g = (g.sort_values([group_col, "_c", "term"],
                           ascending=[True, False, True],
                           kind="mergesort")
             .groupby(group_col, sort=False).head(k)
             .reset_index(drop=True))
        g["rank"] = g.groupby(group_col, sort=False).cumcount() + 1
        g = g.drop(columns=["_b", "_b2"], errors="ignore")
        return (g.rename(columns={"_c": "n"})
                .astype({"n": "int64", "rank": "int64"}))

    cells = ds.map_batches(partial, batch_format="pyarrow")
    tagged = cells.map_batches(
        lambda df: df.assign(_b=key_buckets(
            (df[group_col] + "\x00" + df["term"]).to_numpy(), n_buckets)),
        batch_format="pandas")
    cands = tagged.groupby("_b").map_groups(cell_fold,
                                            batch_format="pandas")
    by_grp = cands.map_batches(
        lambda df: df.assign(_b2=key_buckets(df[group_col].to_numpy(),
                                             n_buckets)),
        batch_format="pandas")
    return by_grp.groupby("_b2").map_groups(final_cut,
                                            batch_format="pandas")


def lang_fertility(ds, group_col: str = "lang", text_col: str = "text"):
    """Tokenizer fertility per language: characters per whitespace
    token, ``floor(1e6·Σchars/Σtokens + 0.5)`` — the budgeting number
    behind "this language costs N× the tokens per byte".  Exact int64
    sums through a per-batch combiner and one bounded keyed Sum; one
    division at the end, same tree as SQL.  Output: (group, n_chars,
    n_tokens, chars_per_token_micro)."""
    import pandas as pd

    from ray.data.aggregate import Sum

    def partial(df: "pd.DataFrame") -> "pd.DataFrame":
        txt = df[text_col].fillna("").astype(str)
        g = pd.DataFrame({
            group_col: df[group_col].to_numpy(),
            "_ch": txt.str.len().to_numpy().astype(np.int64),
            "_tk": txt.str.split().str.len().to_numpy().astype(np.int64)})
        return (g.groupby(group_col, sort=False).sum().reset_index()
                .astype({"_ch": "int64", "_tk": "int64"}))

    def finish(b: pa.Table) -> pa.Table:
        ch = b.column("n_chars").to_numpy(zero_copy_only=False)
        tk = b.column("n_tokens").to_numpy(zero_copy_only=False)
        f = np.floor(1e6 * ch / np.maximum(tk, 1) + 0.5).astype(np.int64)
        f = np.where(tk == 0, 0, f)
        return pa.table({group_col: b.column(group_col),
                         "n_chars": pa.array(ch, pa.int64()),
                         "n_tokens": pa.array(tk, pa.int64()),
                         "chars_per_token_micro": pa.array(f, pa.int64())})

    return (ds.map_batches(partial, batch_format="pandas")
            .groupby(group_col)
            .aggregate(Sum("_ch", alias_name="n_chars"),
                       Sum("_tk", alias_name="n_tokens"))
            .map_batches(finish, batch_format="pyarrow"))


_PMI_WORD_RE = re.compile(r"[a-z0-9]+")


def pmi_bigrams(ds, text_col: str = "text", min_count: int = 5,
                top_k: int = 20, n_buckets: int = 32):
    """Top-k adjacent-word bigrams by pointwise mutual information
    ``ln((c_xy/N2) / ((c_x/N1)·(c_y/N1)))`` — the collocation-mining
    audit of a corpus (Church & Hanks 1990, public).  ASCII
    ``[a-z0-9]+`` tokens (the SQL-twin-identical tokenizer contract);
    counts stay exact int64 end-to-end; the single ``ln`` happens once
    per surviving bigram through the SQL twin's exact expression tree,
    micro-pinned half-up.

    Scale shape: per-batch (bigram, n) and (word, n) partials → two
    keyed Sums (vocab-scale rows, never corpus-scale); the two scalar
    totals (N1 tokens, N2 bigrams) are O(1) driver reads; c_x / c_y
    attach via two ``bucketed_hash_join``s on the word key; the
    ``min_count`` gate cuts the tail BEFORE the global
    sort-by-(pmi desc, w1, w2) top-k.  Output: (w1, w2, n_xy, n_x,
    n_y, pmi_micro), ``top_k`` rows."""
    import pandas as pd
    from ray.data.aggregate import Sum

    from .joins import bucketed_hash_join

    if min_count < 1:
        raise ValueError(f"min_count must be >= 1, got {min_count}")

    def partials(batch: pa.Table) -> pa.Table:
        big: dict = {}
        uni: dict = {}
        for t in batch.column(text_col).to_pylist():
            ws = _PMI_WORD_RE.findall((t or "").lower())
            for w in ws:
                uni[w] = uni.get(w, 0) + 1
            for a, b in zip(ws, ws[1:]):
                big[(a, b)] = big.get((a, b), 0) + 1
        w1 = [k[0] for k in big] + list(uni)
        w2 = [k[1] for k in big] + [""] * len(uni)
        n = list(big.values()) + list(uni.values())
        return pa.table({"w1": pa.array(w1, pa.string()),
                         "w2": pa.array(w2, pa.string()),
                         "n": pa.array(n, pa.int64())})

    counts = (ds.map_batches(partials, batch_format="pyarrow")
              .groupby(["w1", "w2"]).aggregate(Sum("n", alias_name="n"))
              .map_batches(lambda b: b.select(["w1", "w2", "n"]),
                           batch_format="pyarrow")
              .materialize())
    uni = counts.filter(expr="w2 == ''")
    n1 = int(uni.sum("n") or 0)
    bg = (counts.filter(expr="w2 != ''")
          .map_batches(lambda b: pa.table({
              "w1": b["w1"], "w2": b["w2"],
              "n_xy": pc.cast(b["n"], pa.int64())}),
              batch_format="pyarrow"))
    n2 = int(bg.sum("n_xy") or 0)
    if n1 == 0 or n2 == 0:
        return pd.DataFrame({c: pd.Series(dtype=d) for c, d in
                             [("w1", "object"), ("w2", "object"),
                              ("n_xy", "int64"), ("n_x", "int64"),
                              ("n_y", "int64"), ("pmi_micro", "int64")]})
    bg = bg.filter(expr=f"n_xy >= {min_count}")
    ux = uni.map_batches(lambda b: pa.table(
        {"w1": b["w1"], "n_x": pc.cast(b["n"], pa.int64())}),
        batch_format="pyarrow")
    uy = uni.map_batches(lambda b: pa.table(
        {"w2": b["w1"], "n_y": pc.cast(b["n"], pa.int64())}),
        batch_format="pyarrow")
    j = bucketed_hash_join(bg, ux, key="w1", n_buckets=n_buckets)
    j = bucketed_hash_join(j, uy, key="w2", n_buckets=n_buckets)

    def score(b: pa.Table) -> pa.Table:
        nxy = b.column("n_xy").to_numpy(zero_copy_only=False)
        nx = b.column("n_x").to_numpy(zero_copy_only=False)
        ny = b.column("n_y").to_numpy(zero_copy_only=False)
        # the SQL twin's exact tree, parenthesis for parenthesis
        pmi = np.log((nxy.astype(np.float64) / float(n2))
                     / ((nx.astype(np.float64) / float(n1))
                        * (ny.astype(np.float64) / float(n1))))
        return pa.table({
            "w1": b["w1"], "w2": b["w2"],
            "n_xy": pc.cast(b["n_xy"], pa.int64()),
            "n_x": pc.cast(b["n_x"], pa.int64()),
            "n_y": pc.cast(b["n_y"], pa.int64()),
            "pmi_micro": pa.array(
                np.floor(1e6 * pmi + 0.5).astype(np.int64), pa.int64()),
            "_neg": pa.array(
                -np.floor(1e6 * pmi + 0.5).astype(np.int64), pa.int64()),
        })

    out = (j.map_batches(score, batch_format="pyarrow")
           .sort(["_neg", "w1", "w2"]).limit(top_k).to_pandas()
           .drop(columns="_neg"))
    return out.reset_index(drop=True)


def bpe_train(ds, text_col: str = "text", n_merges: int = 10,
              n_buckets: int = 32):
    """Byte-pair-encoding merge-rule training over the corpus
    (Sennrich et al. 2016, public): the classic word-frequency
    formulation — corpus → (word, count) table ONCE, then each merge
    round counts adjacent symbol pairs weighted by word count, picks
    the (count desc, pair asc) argmax, and rewrites the symbol
    sequences.  Deterministic end-to-end (exact int counts, total
    tie order); ASCII ``[a-z0-9]+`` words with a ``</w>`` end marker.

    Scale shape: the corpus collapses to the vocab-scale word table in
    one keyed Count and never re-reads; each round is one keyed Sum
    over (pair, n) partials plus a sort-limit-1 (the single argmax row
    is the only per-round driver read — same O(1) pattern as the
    ``kmeans_lloyd`` state) and one broadcast rewrite pass; the word
    table re-materializes per round so round k+1 never recomputes
    round k.  No SQL twin (iterated string rewriting is not
    SQL-expressible) — pinned by an exact single-process replica test.
    Output: (rank, left, right, pair_count) — one row per merge, in
    order; stops early when no pair repeats."""
    import pandas as pd
    from ray.data.aggregate import Sum

    if n_merges < 1:
        raise ValueError(f"n_merges must be >= 1, got {n_merges}")

    def words(batch: pa.Table) -> pa.Table:
        out: dict = {}
        for t in batch.column(text_col).to_pylist():
            for w in _PMI_WORD_RE.findall((t or "").lower()):
                out[w] = out.get(w, 0) + 1
        return pa.table({"w": pa.array(list(out), pa.string()),
                         "n": pa.array(list(out.values()), pa.int64())})

    vocab = (ds.map_batches(words, batch_format="pyarrow")
             .groupby("w").aggregate(Sum("n", alias_name="n"))
             .map_batches(lambda b: pa.table({
                 "syms": pa.array(
                     [list(w) + ["</w>"] for w in b["w"].to_pylist()],
                     pa.list_(pa.string())),
                 "n": pc.cast(b["n"], pa.int64())}),
                 batch_format="pyarrow")
             .materialize())

    def pair_partials(batch: pa.Table) -> pa.Table:
        cnt: dict = {}
        ns = batch.column("n").to_pylist()
        for syms, n in zip(batch.column("syms").to_pylist(), ns):
            for a, b in zip(syms, syms[1:]):
                cnt[(a, b)] = cnt.get((a, b), 0) + n
        return pa.table({
            "a": pa.array([k[0] for k in cnt], pa.string()),
            "b": pa.array([k[1] for k in cnt], pa.string()),
            "cnt": pa.array(list(cnt.values()), pa.int64())})

    merges = []
    for rank in range(n_merges):
        pairs = (vocab.map_batches(pair_partials, batch_format="pyarrow")
                 .groupby(["a", "b"]).aggregate(Sum("cnt",
                                                    alias_name="cnt"))
                 .map_batches(lambda b: b.append_column(
                     "neg", pc.multiply(pc.cast(b["cnt"], pa.int64()),
                                        -1)),
                     batch_format="pyarrow"))
        top = pairs.sort(["neg", "a", "b"]).limit(1).take_all()
        if not top or top[0]["cnt"] < 2:
            break
        best_a, best_b, best_n = top[0]["a"], top[0]["b"], top[0]["cnt"]
        merges.append((rank, best_a, best_b, int(best_n)))

        def rewrite(batch: pa.Table, a=best_a, b=best_b) -> pa.Table:
            out = []
            for syms in batch.column("syms").to_pylist():
                res, i = [], 0
                while i < len(syms):
                    if (i + 1 < len(syms) and syms[i] == a
                            and syms[i + 1] == b):
                        res.append(a + b)
                        i += 2
                    else:
                        res.append(syms[i])
                        i += 1
                out.append(res)
            return pa.table({"syms": pa.array(out, pa.list_(pa.string())),
                             "n": batch.column("n")})

        vocab = vocab.map_batches(rewrite,
                                  batch_format="pyarrow").materialize()

    return pd.DataFrame(merges, columns=["rank", "left", "right",
                                         "pair_count"]).astype(
        {"rank": "int64", "pair_count": "int64"})


def boilerplate_lines(ds, group_col: str, text_col: str, id_col: str,
                      min_ratio_bp: int = 5000, min_pages: int = 2):
    """Per-group boilerplate LINE detection — the nav/footer stripping
    pass a crawl corpus runs before training: a line is boilerplate for
    a group (host/source) when it appears on ≥ ``min_pages`` pages AND
    on ≥ ``min_ratio_bp``/10⁴ of the group's pages.  Counting is
    per-PAGE-distinct (a line repeated within one page counts once).

    Scale shape: per-batch explode to (group, line_md5) page-distinct
    partial rows (the line TEXT never shuffles, only 16-byte hashes),
    one keyed Count per (group, line_md5), plus a tiny per-group page
    Count; ratio filter in-stream against the broadcast page counts.
    Output: (group, line_md5, n_pages, group_pages, ratio_bp)."""
    import hashlib

    import pandas as pd
    import ray
    from ray.data.aggregate import Sum

    def page_partial(batch: pa.Table) -> pa.Table:
        groups = batch.column(group_col).to_pylist()
        g = pd.Series(groups).value_counts()
        return pa.table({group_col: pa.array(g.index.astype(str)),
                         "_n": pa.array(g.to_numpy(np.int64))})

    pages = (ds.map_batches(page_partial, batch_format="pyarrow")
             .groupby(group_col).aggregate(Sum("_n", alias_name="pages"))
             ).to_pandas()
    pages_ref = ray.put(dict(zip(pages[group_col], pages["pages"])))

    def line_partial(batch: pa.Table) -> pa.Table:
        out_g, out_h = [], []
        for g, text in zip(batch.column(group_col).to_pylist(),
                           batch.column(text_col).to_pylist()):
            seen = set()
            for line in (text or "").split("\n"):
                if not line.strip():
                    continue
                h = hashlib.md5(line.encode()).hexdigest()
                if h not in seen:
                    seen.add(h)
                    out_g.append(g)
                    out_h.append(h)
        return pa.table({group_col: pa.array(out_g, pa.string()),
                         "line_md5": pa.array(out_h, pa.string()),
                         "_c": pa.array(np.ones(len(out_g), np.int64))})

    counts = (ds.map_batches(line_partial, batch_format="pyarrow")
              .groupby([group_col, "line_md5"])
              .aggregate(Sum("_c", alias_name="n_pages")))

    def attach_filter(batch: pa.Table, ref) -> pa.Table:
        totals = ray.get(ref)
        gp = np.array([totals.get(g, 0) for g in
                       batch.column(group_col).to_pylist()], np.int64)
        n = batch.column("n_pages").to_numpy(zero_copy_only=False)
        keep = (n >= min_pages) & (n * 10_000 >= min_ratio_bp * gp)
        ratio = np.zeros(len(gp), np.int64)
        nz = gp > 0
        ratio[nz] = n[nz] * 10_000 // gp[nz]
        t = batch.append_column(
            "group_pages", pa.array(gp, pa.int64())).append_column(
            "ratio_bp", pa.array(ratio, pa.int64()))
        return t.filter(pa.array(keep))

    return counts.map_batches(attach_filter, batch_format="pyarrow",
                              fn_kwargs=dict(ref=pages_ref))


def strip_boilerplate(ds, group_col: str, text_col: str, id_col: str,
                      min_ratio_bp: int = 5000, min_pages: int = 2):
    """Companion pass: per document, drop the group's boilerplate lines
    (from ``boilerplate_lines``) and report what survived.  The
    boilerplate SET (md5s only) broadcasts once via ``ray.put`` —
    it is O(distinct nav/footer lines), tiny by construction.
    Output: (id, n_lines_kept, n_chars_kept, n_lines_dropped)."""
    import hashlib

    import ray

    bp = boilerplate_lines(ds, group_col, text_col, id_col,
                           min_ratio_bp, min_pages).to_pandas()
    bp_ref = ray.put({(g, h) for g, h in
                      zip(bp[group_col], bp["line_md5"])})

    def strip(batch: pa.Table, ref) -> pa.Table:
        bad = ray.get(ref)
        ids, kept_n, kept_c, dropped = [], [], [], []
        for i, g, text in zip(batch.column(id_col).to_pylist(),
                              batch.column(group_col).to_pylist(),
                              batch.column(text_col).to_pylist()):
            k = c = d = 0
            for line in (text or "").split("\n"):
                if not line.strip():
                    continue
                if (g, hashlib.md5(line.encode()).hexdigest()) in bad:
                    d += 1
                else:
                    k += 1
                    c += len(line)
            ids.append(i)
            kept_n.append(k)
            kept_c.append(c)
            dropped.append(d)
        return pa.table({
            id_col: pa.array(ids, pa.string()),
            "n_lines_kept": pa.array(kept_n, pa.int64()),
            "n_chars_kept": pa.array(kept_c, pa.int64()),
            "n_lines_dropped": pa.array(dropped, pa.int64())})

    return ds.map_batches(strip, batch_format="pyarrow",
                          fn_kwargs=dict(ref=bp_ref))

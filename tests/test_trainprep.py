"""Training-prep operators (stages/trainprep.py): benchmark
decontamination, sequence packing, stratified sampling, aspect-ratio
bucketing — each asserted against a single-process oracle."""

import hashlib

import numpy as np
import pandas as pd
import pytest


def _rd():
    import ray.data as rd
    return rd


# ---------------------------------------------------------------------------
# decontaminate
# ---------------------------------------------------------------------------

def test_decontaminate_counts_distinct_shared_ngrams(ray_session):
    from markdown_lab_ray.stages.trainprep import decontaminate

    ref = pd.DataFrame({
        "doc_id": [100, 101],
        "text": ["the quick brown fox jumps over the lazy dog",
                 "pack my box with five dozen liquor jugs"],
    })
    corpus = pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "text": [
            # contains "the quick brown fox jumps" + the 3 following 5-grams
            "intro the quick brown fox jumps over the lazy dog outro",
            "pack my box with five dozen",   # two shared 5-grams (7 tokens)
            "completely different words here today",
            "short",                         # < 5 tokens → no grams
        ],
    })
    out = decontaminate(_rd().from_pandas(corpus).repartition(2),
                        _rd().from_pandas(ref), n=5).to_pandas()
    got = out.set_index("doc_id")["n_hits"].to_dict()
    assert got == {0: 5, 1: 2, 2: 0, 3: 0}
    assert out["n_hits"].dtype == np.int64


def test_decontaminate_empty_reference(ray_session):
    from markdown_lab_ray.stages.trainprep import decontaminate

    corpus = pd.DataFrame({"doc_id": [0], "text": ["a b c d e f"]})
    ref = pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                        "text": pd.Series(dtype="object")})
    out = decontaminate(_rd().from_pandas(corpus),
                        _rd().from_pandas(ref)).to_pandas()
    assert out["n_hits"].tolist() == [0]


def test_decontaminate_is_case_and_whitespace_normalized(ray_session):
    from markdown_lab_ray.stages.trainprep import decontaminate

    ref = pd.DataFrame({"doc_id": [9], "text": ["Alpha Beta GAMMA delta epsilon"]})
    corpus = pd.DataFrame({"doc_id": [0],
                           "text": ["alpha   beta gamma\ndelta epsilon"]})
    out = decontaminate(_rd().from_pandas(corpus),
                        _rd().from_pandas(ref), n=5).to_pandas()
    assert out["n_hits"].tolist() == [1]


# ---------------------------------------------------------------------------
# pack_sequences
# ---------------------------------------------------------------------------

def _pack_oracle(df, budget):
    df = df.sort_values("doc_id").reset_index(drop=True)
    excl = np.concatenate(([0], np.cumsum(df["n_tokens"].to_numpy())[:-1]))
    return dict(zip(df["doc_id"], excl // budget))


def test_pack_sequences_matches_prefix_sum_oracle(ray_session):
    from markdown_lab_ray.stages.trainprep import pack_sequences

    rng = np.random.RandomState(17)
    # sparse, shuffled ids across several scan buckets
    ids = rng.choice(np.arange(0, 50_000, 7, dtype=np.int64), 800,
                     replace=False)
    df = pd.DataFrame({"doc_id": ids,
                       "n_tokens": rng.randint(1, 900, 800).astype(np.int64)})
    out = pack_sequences(_rd().from_pandas(df).repartition(6),
                         budget=2048, bucket_width=4096).to_pandas()
    want = _pack_oracle(df, 2048)
    assert len(out) == len(df)
    got = out.set_index("doc_id")["pack_id"].to_dict()
    assert got == want
    # packs are contiguous in id order and never skip backwards
    chk = out.sort_values("doc_id")["pack_id"].to_numpy()
    assert (np.diff(chk) >= 0).all()


def test_pack_sequences_doc_larger_than_budget_gets_own_packs(ray_session):
    from markdown_lab_ray.stages.trainprep import pack_sequences

    df = pd.DataFrame({"doc_id": np.arange(4, dtype=np.int64),
                       "n_tokens": np.array([10, 5000, 10, 10], np.int64)})
    out = pack_sequences(_rd().from_pandas(df), budget=100).to_pandas()
    assert out.set_index("doc_id")["pack_id"].to_dict() == _pack_oracle(
        df, 100)


def test_pack_sequences_rejects_bad_budget(ray_session):
    from markdown_lab_ray.stages.trainprep import pack_sequences

    df = pd.DataFrame({"doc_id": [0], "n_tokens": [1]})
    with pytest.raises(ValueError):
        pack_sequences(_rd().from_pandas(df), budget=0)


# ---------------------------------------------------------------------------
# stratified_sample
# ---------------------------------------------------------------------------

def test_stratified_sample_deterministic_and_rate_accurate(ray_session):
    from markdown_lab_ray.stages.trainprep import stratified_sample

    rng = np.random.RandomState(23)
    n = 4000
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "event_type": rng.choice(["a", "b", "c"], n),
        "user_id": rng.randint(0, 50, n).astype(np.int64),
    })
    rates = {"a": 0.25, "b": 1.0}  # c absent → dropped
    out = stratified_sample(_rd().from_pandas(df).repartition(5),
                            rates=rates, key_col="event_type",
                            id_col="event_id").to_pandas()
    # exact oracle: same md5-prefix rule
    def kept(row):
        r = rates.get(row["event_type"], 0.0)
        if r >= 1.0:
            return True
        thr = format(int(r * 16**8), "08x")
        return hashlib.md5(str(row["event_id"]).encode()).hexdigest()[:8] < thr
    want = df[df.apply(kept, axis=1)]
    assert sorted(out["event_id"]) == sorted(want["event_id"])
    # rate sanity: 'a' stratum lands near 25%, all 'b' kept, no 'c'
    n_a = (df["event_type"] == "a").sum()
    got_a = (out["event_type"] == "a").sum()
    assert abs(got_a / n_a - 0.25) < 0.05
    assert (out["event_type"] == "b").sum() == (df["event_type"] == "b").sum()
    assert (out["event_type"] == "c").sum() == 0


def test_stratified_sample_stable_under_repartition(ray_session):
    from markdown_lab_ray.stages.trainprep import stratified_sample

    df = pd.DataFrame({
        "event_id": np.arange(500, dtype=np.int64),
        "event_type": ["x"] * 500,
        "user_id": np.zeros(500, dtype=np.int64),
    })
    a = stratified_sample(_rd().from_pandas(df).repartition(2),
                          rates={"x": 0.5}, key_col="event_type",
                          id_col="event_id").to_pandas()
    b = stratified_sample(_rd().from_pandas(df).repartition(9),
                          rates={"x": 0.5}, key_col="event_type",
                          id_col="event_id").to_pandas()
    assert sorted(a["event_id"]) == sorted(b["event_id"])


# ---------------------------------------------------------------------------
# aspect_bucket_batch
# ---------------------------------------------------------------------------

def test_aspect_bucket_nearest_log_ratio(ray_session):
    import pyarrow as pa

    from markdown_lab_ray.stages.trainprep import (DEFAULT_ASPECT_BUCKETS,
                                                   aspect_bucket_batch)

    batch = pa.table({
        "image_id": ["sq", "land", "wide", "port", "tall"],
        "w": [512, 800, 1920, 600, 540],
        "h": [512, 600, 1080, 800, 960],
    })
    out = aspect_bucket_batch(batch).to_pandas()
    got = dict(zip(out["image_id"], out["aspect_bucket"]))
    assert got == {"sq": "square", "land": "landscape_4_3",
                   "wide": "landscape_16_9", "port": "portrait_3_4",
                   "tall": "portrait_9_16"}
    # target dims come from the matched bucket row
    by_name = {b[0]: (b[1], b[2]) for b in DEFAULT_ASPECT_BUCKETS}
    for _, r in out.iterrows():
        assert (r["target_w"], r["target_h"]) == by_name[r["aspect_bucket"]]


def test_aspect_bucket_rejects_nonpositive_dims(ray_session):
    import pyarrow as pa

    from markdown_lab_ray.stages.trainprep import aspect_bucket_batch

    with pytest.raises(ValueError):
        aspect_bucket_batch(pa.table({"image_id": ["x"], "w": [0], "h": [5]}))


def test_percentile_gate_discrete_percentile_semantics(ray_session):
    """PERCENTILE_DISC(q): keep rows ≥ the smallest value whose
    cumulative count reaches ceil(q·n), per key — ties and duplicate
    values handled via the (key, value, count) compression."""
    import ray.data as rd

    from markdown_lab_ray.stages.trainprep import percentile_gate

    df = pd.DataFrame({
        "k": ["a"] * 5 + ["b"] * 4,
        "v": [1.0, 2.0, 3.0, 4.0, 5.0, 10.0, 20.0, 20.0, 30.0],
        "id": range(9)})
    ds = rd.from_pandas(df).repartition(3)
    out = (percentile_gate(ds, "v", "k", q=0.5).to_pandas()
           .sort_values("id"))
    # a: n=5, rank ceil(2.5)=3 -> thr 3.0; b: n=4, rank 2 of
    # [10,20,20,30] -> thr 20.0 (duplicate value spans ranks 2-3)
    assert out["id"].tolist() == [2, 3, 4, 6, 7, 8]


def test_percentile_gate_q1_keeps_only_max(ray_session):
    import ray.data as rd

    from markdown_lab_ray.stages.trainprep import percentile_gate

    ds = rd.from_pandas(pd.DataFrame({"k": ["x"] * 4,
                                      "v": [1.0, 2.0, 3.0, 3.0],
                                      "id": range(4)}))
    out = percentile_gate(ds, "v", "k", q=1.0).to_pandas()
    assert sorted(out["id"].tolist()) == [2, 3]
    with pytest.raises(ValueError):
        percentile_gate(ds, "v", "k", q=0.0)


def test_tfidf_top_terms_scores_and_ties(ray_session):
    """Integer-exact TF·IDF ranking: idf_micro = floor(ln(n/df)·1e6
    + 0.5); ties break term-ascending; empty docs emit nothing."""
    import ray.data as rd

    from markdown_lab_ray.stages.trainprep import tfidf_top_terms

    docs = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["the cat sat on the mat", "the dog", "   "]})
    ds = rd.from_pandas(docs).repartition(2)
    out = (tfidf_top_terms(ds, n_docs=3, k=3).to_pandas()
           .sort_values(["doc_id", "score", "term"],
                        ascending=[True, False, True])
           .reset_index(drop=True))
    ln3 = int(np.floor(np.log(3.0) * 1e6 + 0.5))        # df=1
    ln15 = int(np.floor(np.log(1.5) * 1e6 + 0.5))       # df=2 ("the")
    # doc 1: cat/mat/on/sat all tf=1·ln3 — term-asc tie-break drops
    # "sat"; "the" (tf=2·ln1.5=810930) loses to the ln3 singletons
    assert list(map(tuple, out.to_numpy())) == [
        (1, "cat", ln3), (1, "mat", ln3), (1, "on", ln3),
        (2, "dog", ln3), (2, "the", ln15)]
    assert out["score"].dtype == np.int64
    with pytest.raises(ValueError):
        tfidf_top_terms(ds, n_docs=0)


def test_trainprep_queries_match_duckdb_at_sf0001(ray_session):
    """End-to-end: the SQL-checked trainprep queries() entries equal
    their oracle_sql() twins on the real sf0.001 tables."""
    import duckdb

    import __ray_entry__ as entrymod

    sf = "/root/testdata/sf0.001"
    names = ["decontaminate", "pack_sequences", "stratified_sample",
             "quality_above_median", "tfidf"]
    qs, sqls = entrymod.queries(), entrymod.oracle_sql()
    con = duckdb.connect()
    for t in ("documents", "events"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    for name in names:
        got = qs[name](sf).to_pandas()
        want = con.sql(sqls[name]).df()
        assert sorted(got.columns) == sorted(want.columns), name
        assert len(got) == len(want), name
        cols = sorted(got.columns)
        g = got[cols].sort_values(cols).reset_index(drop=True)
        w = want[cols].sort_values(cols).reset_index(drop=True).astype(
            g.dtypes.to_dict())
        for c in cols:
            assert g[c].equals(w[c]), (name, c)


def test_inverted_index_postings_cap_and_df(ray_session):
    """df stays exact when postings are capped; postings sorted asc."""
    import ray.data as rd

    from markdown_lab_ray.stages.trainprep import inverted_index

    docs = pd.DataFrame({
        "doc_id": [5, 1, 3, 2],
        "text": ["common alpha", "common beta", "common", "COMMON beta"]})
    ds = rd.from_pandas(docs).repartition(2)
    out = (inverted_index(ds, max_postings=2).to_pandas()
           .set_index("term"))
    assert out.loc["common", "df"] == 4
    assert out.loc["common", "postings"] == "1,2"     # capped, asc
    assert out.loc["beta", "df"] == 2
    assert out.loc["beta", "postings"] == "1,2"
    assert out.loc["alpha", "postings"] == "5"
    with pytest.raises(ValueError):
        inverted_index(ds, max_postings=0)


def test_cap_per_key_deterministic_and_skew_proof(ray_session):
    """Cap picks the k smallest (md5(id), id) rows per key; identical
    result at any partitioning (the pre-cap combiner must not change
    the selection)."""
    import ray.data as rd

    from markdown_lab_ray.stages.trainprep import cap_per_key

    rng = np.random.RandomState(11)
    df = pd.DataFrame({
        "doc_id": np.arange(300, dtype=np.int64),
        "src": ["hot"] * 250 + [f"s{i}" for i in rng.randint(0, 9, 50)]})

    def oracle(k):
        d = df.assign(_h=[hashlib.md5(str(i).encode()).hexdigest()
                          for i in df["doc_id"]])
        d = d.sort_values(["_h", "doc_id"])
        return set(map(tuple, d.groupby("src", sort=False).head(k)
                       [["doc_id", "src"]].itertuples(index=False)))

    for parts in (1, 7):
        out = cap_per_key(rd.from_pandas(df).repartition(parts),
                          key_col="src", id_col="doc_id", k=5).to_pandas()
        assert set(map(tuple, out[["doc_id", "src"]]
                       .itertuples(index=False))) == oracle(5)
        assert (out.groupby("src").size() <= 5).all()
        assert (out[out.src == "hot"].shape[0]) == 5
    with pytest.raises(ValueError):
        cap_per_key(rd.from_pandas(df), "src", "doc_id", 0)


# ---------------------------------------------------------------------------
# property tests (single-process oracles over random inputs)
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=12, deadline=None)
@given(st.lists(st.tuples(st.sampled_from("abc"),
                          st.integers(0, 20)),
                min_size=1, max_size=60),
       st.floats(0.01, 1.0))
def test_percentile_gate_matches_rank_oracle(ray_session, rows, q):
    """percentile_gate == keep rows ≥ the value at 1-based rank
    ceil(q·n) of the key's sorted multiset (PERCENTILE_DISC)."""
    import ray.data as rd

    from markdown_lab_ray.stages.trainprep import percentile_gate

    df = pd.DataFrame({"k": [r[0] for r in rows],
                       "v": [float(r[1]) for r in rows],
                       "id": np.arange(len(rows), dtype=np.int64)})
    out = percentile_gate(rd.from_pandas(df).repartition(3),
                          "v", "k", q=q).to_pandas()
    want = set()
    for k, g in df.groupby("k"):
        vals = np.sort(g["v"].to_numpy())
        thr = vals[int(np.ceil(q * len(vals))) - 1]
        want |= set(g.loc[g["v"] >= thr, "id"])
    assert set(out["id"]) == want


@settings(max_examples=12, deadline=None)
@given(st.lists(st.integers(0, 10_000), min_size=1, max_size=80,
                unique=True),
       st.integers(1, 6))
def test_cap_per_key_matches_hash_order_oracle(ray_session, ids, k):
    import ray.data as rd

    from markdown_lab_ray.stages.trainprep import cap_per_key

    df = pd.DataFrame({"doc_id": np.array(ids, np.int64),
                       "src": [f"s{i % 3}" for i in ids]})
    out = cap_per_key(rd.from_pandas(df).repartition(2),
                      "src", "doc_id", k=k).to_pandas()
    d = df.assign(_h=[hashlib.md5(str(i).encode()).hexdigest()
                      for i in df["doc_id"]])
    want = set(d.sort_values(["_h", "doc_id"])
               .groupby("src", sort=False).head(k)["doc_id"])
    assert set(out["doc_id"]) == want


def test_dedup_keep_best_picks_highest_quality_copy(ray_session):
    """With genuine duplicate texts, the kept copy per cluster is the
    max-quality one (ties → smallest id) and the cluster label is the
    group's min doc_id — exercised via the full query path on a
    synthetic table, compared against DuckDB."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq
    import tempfile, os

    import __ray_entry__ as entrymod

    # doc 0/2/4 share text A (different ids only), 1/3 share text B
    texts = ["alpha beta gamma delta epsilon " * 4,
             "one two three numbers 99 !!!! " * 3]
    tbl = pa.table({
        "doc_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
        "text": pa.array([texts[0], texts[1], texts[0], texts[1],
                          texts[0]], pa.string()),
        "lang": pa.array(["en"] * 5), "source": pa.array(["s"] * 5),
        "n_chars": pa.array([len(texts[0])] * 5, pa.int64()),
    })
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(tbl, os.path.join(d, "documents.parquet"))
        got = (entrymod.queries()["dedup_keep_best"](d).to_pandas()
               .sort_values("cluster_id").reset_index(drop=True))
        con = duckdb.connect()
        con.sql(f"CREATE VIEW documents AS SELECT * FROM "
                f"'{d}/documents.parquet'")
        want = (con.sql(entrymod.oracle_sql()["dedup_keep_best"]).df()
                .sort_values("cluster_id").reset_index(drop=True))
    assert len(got) == 2                       # one survivor per cluster
    assert got["cluster_id"].tolist() == [0, 1]
    # identical texts ⇒ identical quality ⇒ tie-break keeps min id
    assert got["doc_id"].tolist() == [0, 1]
    for c in ("cluster_id", "doc_id", "quality"):
        assert got[c].tolist() == want[c].tolist()

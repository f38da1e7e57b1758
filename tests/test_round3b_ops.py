"""Cumulative sums, Hamilton budget apportionment, and the image
keep-best-resolution retention policy — each vs a single-process
pandas/DuckDB oracle."""

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


def _rd():
    import ray.data as rd
    return rd


def test_cumulative_spend_matches_duckdb(ray_session):
    import duckdb

    import __ray_entry__ as entry

    got = (entry.q_cumulative_spend(SF).to_pandas()
           .sort_values(["user_id", "event_id"]).reset_index(drop=True))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{SF}/events.parquet'")
    want = (con.execute(entry.SQL_CUMULATIVE_SPEND).df()
            .sort_values(["user_id", "event_id"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got.astype({"cum_sum_cents": "int64"}),
        want.astype({"cum_sum_cents": "int64"}))


def test_budget_apportion_matches_duckdb(ray_session):
    import duckdb

    import __ray_entry__ as entry

    got = entry.q_budget_apportion(SF).reset_index(drop=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{SF}/events.parquet'")
    want = con.execute(entry.SQL_BUDGET_APPORTION).df()
    pd.testing.assert_frame_equal(
        got.astype({"n_rows": "int64", "budget": "int64"}),
        want.astype({"n_rows": "int64", "budget": "int64"}))
    assert int(got["budget"].sum()) == 1000  # exact apportionment


def test_budget_apportion_remainder_ties(ray_session):
    """Largest-remainder with ties: equal remainders go to the
    lexicographically smaller key; the total always hits the budget
    exactly."""
    from markdown_lab_ray.stages.analytics import budget_apportion

    # counts 1,1,1 with budget 10 → floors 3,3,3, one leftover → 'a'
    df = pd.DataFrame({"k": ["a", "b", "c"], "x": [1, 1, 1]}
                      ).loc[lambda d: d.index.repeat(1)]
    ds = _rd().from_pandas(df.rename(columns={"k": "key"}))
    out = budget_apportion(ds, key_col="key", budget=10)
    assert out["budget"].tolist() == [4, 3, 3]
    assert out["key"].tolist() == ["a", "b", "c"]
    assert int(out["budget"].sum()) == 10


def test_image_keep_best_matches_pandas(ray_session):
    from markdown_lab_ray.sources.synth import SiteSpec, build_images_table
    from markdown_lab_ray.stages.images import keep_best_resolution

    table = build_images_table(SiteSpec(n_images=150))
    df = table.select(["image_id", "w", "h", "phash"]).to_pandas()
    ds = _rd().from_arrow(table).select_columns(
        ["image_id", "w", "h", "phash"]).repartition(7)
    got = (keep_best_resolution(ds).to_pandas()
           .sort_values("phash").reset_index(drop=True))

    want = df.assign(_px=df["w"] * df["h"]).sort_values(
        ["phash", "_px", "image_id"], ascending=[True, False, True],
        kind="mergesort").drop_duplicates("phash", keep="first")
    want = (want[["phash", "image_id", "w", "h"]]
            .sort_values("phash").reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got[["phash", "image_id", "w", "h"]].astype(
            {"w": "int64", "h": "int64"}),
        want.astype({"w": "int64", "h": "int64"}))
    # one survivor per duplicate group, and it's the largest
    assert got["phash"].is_unique


def test_convert_payloads_matches_duckdb_full_text(ray_session):
    """Character-for-character equality of every rendered markdown
    payload vs the SQL string reconstruction (the strongest oracle in
    the convert family)."""
    import duckdb

    import __ray_entry__ as entry

    got = (entry.q_convert_payloads(SF).to_pandas()
           .sort_values("url").reset_index(drop=True))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    want = (con.execute(entry.SQL_CONVERT_PAYLOADS).df()
            .sort_values("url").reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got.astype({"n_links": "int64", "n_images": "int64"}), want)


def _lm_local(texts, max_bigrams=1 << 16):
    """Single-process twin of train_bigram_lm + perplexity_batch."""
    from collections import Counter

    uni, bi = Counter(), Counter()
    for t in texts:
        ws = (t or "").lower().split()
        uni.update(ws)
        bi.update(" ".join(p) for p in zip(ws, ws[1:]))
    if len(bi) > max_bigrams:
        kept = sorted(bi.items(), key=lambda kv: (-kv[1], kv[0]))[:max_bigrams]
        bi = dict(kept)
    v = len(uni)
    rows = []
    for t in texts:
        ws = (t or "").lower().split()
        pairs = list(zip(ws, ws[1:]))
        if not pairs:
            rows.append((0, 0.0, 1.0))
            continue
        total = np.float64(0.0)
        for w1, w2 in pairs:
            total += np.log((bi.get(f"{w1} {w2}", 0) + 1.0)
                            / (uni.get(w1, 0) + v))
        nll = -total / len(pairs)
        rows.append((len(pairs), float(nll), float(np.exp(nll))))
    return rows


def test_lm_perplexity_matches_local_exactly(ray_session):
    import pyarrow.parquet as pq

    import __ray_entry__ as entry

    got = (entry.q_lm_perplexity(SF).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    tbl = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    df = tbl.to_pandas().sort_values("doc_id").reset_index(drop=True)
    rows = _lm_local(df["text"].tolist())
    want = pd.DataFrame({
        "doc_id": df["doc_id"].astype("int64"),
        "n_bigrams": [r[0] for r in rows],
        "nll": [r[1] for r in rows],
        "ppl": [r[2] for r in rows],
    }).astype({"n_bigrams": "int64"})
    # exact float equality: both paths sum bigrams in document order
    pd.testing.assert_frame_equal(got, want, check_exact=True)
    # sanity: a gibberish doc scores worse than a typical one
    assert got["ppl"].min() > 1.0


def test_lm_bigram_cap_deterministic(ray_session):
    """With a tiny bigram cap the kept set is (count desc, gram asc)
    deterministic, and scoring still matches the local twin under the
    same cap."""
    from markdown_lab_ray.stages.text import ngram_lm_perplexity

    texts = ["a b a b c d", "a b c d c d", "x y x y"] * 5
    df = pd.DataFrame({"doc_id": np.arange(15, dtype=np.int64),
                       "text": texts})
    ds = _rd().from_pandas(df).repartition(4)
    got = (ngram_lm_perplexity(ds, max_bigrams=3).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    rows = _lm_local(texts, max_bigrams=3)
    want = pd.DataFrame({
        "doc_id": df["doc_id"],
        "n_bigrams": [r[0] for r in rows],
        "nll": [r[1] for r in rows],
        "ppl": [r[2] for r in rows],
    }).astype({"n_bigrams": "int64"})
    pd.testing.assert_frame_equal(got, want, check_exact=True)


def test_render_xml_payloads_matches_duckdb_full_text(ray_session):
    """Character-for-character XML payload equality vs the SQL string
    reconstruction (the M10 renderer's full-fidelity oracle)."""
    import duckdb

    import __ray_entry__ as entry

    got = (entry.q_render_xml_payloads(SF).to_pandas()
           .sort_values("url").reset_index(drop=True))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    want = (con.execute(entry.SQL_RENDER_XML_PAYLOADS).df()
            .sort_values("url").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want)


def test_render_json_payloads_matches_duckdb_full_text(ray_session):
    """Character-for-character JSON payload equality vs the SQL string
    reconstruction — all three render formats are now full-fidelity
    oracled (markdown via convert_payloads, xml, json)."""
    import duckdb

    import __ray_entry__ as entry

    got = (entry.q_render_json_payloads(SF).to_pandas()
           .sort_values("url").reset_index(drop=True))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    want = (con.execute(entry.SQL_RENDER_JSON_PAYLOADS).df()
            .sort_values("url").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want)


def test_props_stats_matches_duckdb(ray_session):
    import duckdb

    import __ray_entry__ as entry

    got = entry.q_props_stats(SF)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{SF}/events.parquet'")
    want = con.execute(entry.SQL_PROPS_STATS).df()
    for c in ("sum_k", "min_k", "max_k", "n_events"):
        want[c] = want[c].astype("int64")
    pd.testing.assert_frame_equal(got, want)


def test_json_extract_malformed_to_null():
    import pyarrow as pa

    from markdown_lab_ray.stages.text import json_extract_int_batch

    b = pa.table({"props": pa.array(
        ['{"k": 3}', "not json", None, '{"other": 1}', '{"k": "str"}',
         '{"k": true}'])})
    out = json_extract_int_batch(b, col="props", key="k", out_col="k_val")
    assert out.column("k_val").to_pylist() == [3, None, None, None,
                                               None, None]


# ---------------------------------------------------------------------------
# round-4 ADVICE pins
# ---------------------------------------------------------------------------

def test_json_extract_int_rounds_like_sql_cast(ray_session):
    """ADVICE r03: floats round HALF AWAY FROM ZERO like DuckDB
    CAST(... AS BIGINT), not truncate, not banker's-round."""
    import json

    import duckdb
    import pyarrow as pa

    from markdown_lab_ray.stages.text import json_extract_int_batch

    vals = [3.7, 2.5, 3.5, -2.5, -3.7, 7, None, True]
    rows = [json.dumps({"k": v}) if v is not None else "{}" for v in vals]
    batch = pa.table({"props": pa.array(rows, pa.string())})
    out = json_extract_int_batch(batch, "props", "k", "k_int")
    got = out.column("k_int").to_pylist()

    con = duckdb.connect()
    expected = []
    for v in vals:
        if v is None or isinstance(v, bool):
            expected.append(None)  # engine contract: bools/missing → null
        else:
            expected.append(con.execute(
                f"SELECT CAST({v} AS BIGINT)").fetchone()[0])
    assert got == expected  # 3.7→4, 2.5→3, 3.5→4, -2.5→-3, -3.7→-4


def test_bigram_lm_unigram_cap_and_exact_vocab(ray_session):
    """ADVICE r03: the unigram broadcast is capped (count desc, gram
    asc) while the smoothing vocab size stays EXACT."""
    import pandas as pd
    import ray.data as rd

    from markdown_lab_ray.stages.text import train_bigram_lm

    texts = (["alpha beta"] * 8 + ["gamma delta"] * 4
             + ["epsilon zeta", "eta theta"])
    ds = rd.from_pandas(pd.DataFrame({"doc_id": range(len(texts)),
                                      "text": texts}))
    uni, bi, v = train_bigram_lm(ds, max_unigrams=4, max_bigrams=64)
    assert v == 8  # exact distinct unigrams, not len(uni)
    assert len(uni) == 4
    # the cap keeps the most frequent grams, ties by gram asc
    assert uni["alpha"] == 8 and uni["beta"] == 8
    assert uni["delta"] == 4 and uni["gamma"] == 4
    assert "epsilon" not in uni  # out-of-cap rare word → scores as 0


def test_pagerank_int64_bound_enforced(ray_session):
    """ADVICE r03: an overflow-risky scale raises instead of silently
    wrapping int64."""
    import pyarrow as pa
    import pytest
    import ray.data as rd

    from markdown_lab_ray.stages.graph import pagerank_integer

    edges = rd.from_arrow(pa.table({
        "src": pa.array([1, 2, 3], pa.int64()),
        "dst": pa.array([2, 3, 1], pa.int64())}))
    with pytest.raises(ValueError, match="overflow"):
        pagerank_integer(edges, n_iter=1, scale=2 ** 61)
    # a sane scale still works
    out = pagerank_integer(edges, n_iter=1, scale=10 ** 6).take_all()
    assert len(out) == 3


def test_sketch_tokenizer_matches_duckdb_on_non_ascii():
    """ADVICE r03: the heavy-hitter tokenizer must agree with the
    oracle's [\\p{L}\\p{N}_]+ on combining marks / non-ASCII."""
    import duckdb

    from markdown_lab_ray.stages.sketch import _tokens

    text = "café naïve பா 123_x"  # combining acute,
    # precomposed ï, Tamil + combining vowel sign, digits+underscore
    got = list(_tokens([text]))
    con = duckdb.connect()
    expected = [t for (t,) in con.execute(
        "SELECT unnest(regexp_extract_all(lower($1), '[\\p{L}\\p{N}_]+'))",
        [text]).fetchall()]
    assert got == expected

"""Ordered-analytics operators (stages/analytics.py): rolling window,
lag deltas, rank, pivot, histogram, distinct-count, rollup — each
asserted equal to a single-process pandas/DuckDB oracle."""

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


def _rd():
    import ray.data as rd
    return rd


def _events(n=600, seed=3):
    rng = np.random.RandomState(seed)
    ts = pd.to_datetime("2024-01-01") + pd.to_timedelta(
        np.sort(rng.randint(0, 10**7, n)), unit="s")
    return pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.randint(0, 25, n).astype(np.int64),
        "ts": ts,
        "event_type": rng.choice(["a", "b", "c"], n),
        "value": (rng.randint(1, 50000, n) / 100.0),
    })


def test_rolling_sum_cents_matches_pandas(ray_session):
    from markdown_lab_ray.stages.analytics import rolling_sum_cents

    df = _events()
    out = rolling_sum_cents(_rd().from_pandas(df).repartition(5),
                            window=4).to_pandas()
    want_parts = []
    for _, g in df.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"], kind="mergesort")
        cents = np.round(g["value"].to_numpy() * 100).astype(np.int64)
        roll = pd.Series(cents).rolling(4, min_periods=1).sum().astype(
            np.int64)
        want_parts.append(pd.DataFrame({
            "user_id": g["user_id"].to_numpy(),
            "event_id": g["event_id"].to_numpy(),
            "roll_sum_cents": roll.to_numpy()}))
    want = pd.concat(want_parts).sort_values("event_id").reset_index(
        drop=True)
    got = out.sort_values("event_id").reset_index(drop=True)
    assert got.equals(want[got.columns.tolist()])


def test_lag_deltas_exact_microseconds(ray_session):
    from markdown_lab_ray.stages.analytics import lag_deltas

    df = _events(400, seed=9)
    out = lag_deltas(_rd().from_pandas(df).repartition(4)).to_pandas()
    # every user loses exactly its first event
    assert len(out) == len(df) - df["user_id"].nunique()
    g = df[df["user_id"] == df["user_id"].iloc[0]].sort_values(
        ["ts", "event_id"])
    want = np.diff(g["ts"].to_numpy().astype("datetime64[us]").astype(
        np.int64))
    got = (out[out["user_id"] == df["user_id"].iloc[0]]
           .sort_values("event_id")["delta_us"].to_numpy())
    # same multiset (row order differs only by event_id ordering)
    assert sorted(got.tolist()) == sorted(want.tolist())
    assert out["delta_us"].dtype == np.int64
    assert (out["delta_us"] >= 0).all()


def test_lag_deltas_singleton_groups_empty_frame_dtype(ray_session):
    from markdown_lab_ray.stages.analytics import lag_deltas

    df = pd.DataFrame({
        "event_id": [0, 1, 2],
        "user_id": np.array([10, 20, 30], dtype=np.int64),
        "ts": pd.to_datetime(["2024-01-01", "2024-01-02", "2024-01-03"]),
    })
    out = lag_deltas(_rd().from_pandas(df).repartition(3)).to_pandas()
    assert len(out) == 0  # all groups singleton — and no dtype crash


def test_rank_in_group_row_number(ray_session):
    from markdown_lab_ray.stages.analytics import rank_in_group

    rng = np.random.RandomState(4)
    df = pd.DataFrame({
        "k": rng.choice(["x", "y", "z"], 200),
        "score": rng.randint(0, 40, 200).astype("float64"),  # forces ties
        "rid": np.arange(200, dtype=np.int64),
    })
    out = rank_in_group(_rd().from_pandas(df).repartition(4), key_col="k",
                        order_col="score", id_col="rid").to_pandas()
    want = df.copy()
    want["rn"] = (want.sort_values(["score", "rid"],
                                   ascending=[False, True])
                  .groupby("k").cumcount() + 1)
    merged = out.merge(want[["rid", "rn"]], on="rid",
                       suffixes=("", "_want"))
    assert (merged["rn"] == merged["rn_want"]).all()
    assert len(out) == len(df)


def test_pivot_counts_vs_crosstab(ray_session):
    from markdown_lab_ray.stages.analytics import pivot_counts

    df = _events(500, seed=11)
    out = pivot_counts(_rd().from_pandas(df).repartition(6),
                       key_col="user_id", cat_col="event_type",
                       categories=("a", "b", "c")).to_pandas()
    want = pd.crosstab(df["user_id"], df["event_type"]).reindex(
        columns=["a", "b", "c"], fill_value=0)
    got = out.set_index("user_id").sort_index()
    for c in ("a", "b", "c"):
        assert (got[f"n_{c}"].to_numpy() == want[c].to_numpy()).all()
        assert got[f"n_{c}"].dtype == np.int64


def test_pivot_counts_rejects_unlisted_category(ray_session):
    from markdown_lab_ray.stages.analytics import pivot_counts

    df = _events(60, seed=2)
    with pytest.raises(Exception):  # ray wraps the ValueError
        pivot_counts(_rd().from_pandas(df), key_col="user_id",
                     cat_col="event_type",
                     categories=("a", "b")).materialize()


def test_histogram_counts_exact(ray_session):
    from markdown_lab_ray.stages.analytics import histogram_counts

    df = _events(700, seed=5)
    df.loc[:10, "value"] = -df.loc[:10, "value"]  # negative-bin floor
    out = histogram_counts(_rd().from_pandas(df).repartition(5),
                           value_col="value", bin_width=50.0).to_pandas()
    want = (pd.Series(np.floor(df["value"].to_numpy() / 50.0).astype(
        np.int64)).value_counts().sort_index())
    got = out.set_index("bin")["n_events"].sort_index()
    assert got.to_dict() == want.to_dict()
    assert got.dtype == np.int64


def test_distinct_count_two_level(ray_session):
    from markdown_lab_ray.stages.analytics import distinct_count

    df = _events(800, seed=6)
    out = distinct_count(_rd().from_pandas(df).repartition(6),
                         key_col="event_type", distinct_col="user_id",
                         out_col="n_users").to_pandas()
    want = df.groupby("event_type")["user_id"].nunique()
    got = out.set_index("event_type")["n_users"].sort_index()
    assert got.to_dict() == want.to_dict()
    assert got.dtype == np.int64


def test_rollup_agg_matches_duckdb(ray_session):
    import duckdb

    from markdown_lab_ray.stages.analytics import rollup_agg

    rng = np.random.RandomState(8)
    df = pd.DataFrame({
        "p": rng.choice(["hi", "lo", "mid"], 400),
        "s": rng.choice(["F", "O"], 400),
        "price": (rng.randint(100, 10**7, 400) / 100.0),
    })
    out = rollup_agg(_rd().from_pandas(df).repartition(4),
                     cols=("p", "s"), value_col="price",
                     count_col="n", sum_col="sv").to_pandas()
    want = duckdb.sql("""
        SELECT COALESCE(p,'ALL') AS p, COALESCE(s,'ALL') AS s,
               COUNT(*) AS n, ROUND(SUM(price), 2) AS sv
        FROM df GROUP BY ROLLUP (p, s)""").df()
    got = out.sort_values(["p", "s"]).reset_index(drop=True)
    want = want.sort_values(["p", "s"]).reset_index(drop=True).astype(
        got.dtypes.to_dict())
    assert got[["p", "s", "n"]].equals(want[["p", "s", "n"]])
    assert np.allclose(got["sv"], want["sv"], atol=0.011)
    # 3 levels: finest (≤6) + per-p (3) + grand total (1)
    assert (got[["p", "s"]].eq("ALL").all(axis=1)).sum() == 1


def test_cube_agg_matches_duckdb(ray_session):
    import duckdb

    from markdown_lab_ray.stages.analytics import cube_agg

    rng = np.random.RandomState(13)
    df = pd.DataFrame({
        "p": rng.choice(["hi", "lo", "mid"], 400),
        "s": rng.choice(["F", "O"], 400),
        "price": (rng.randint(100, 10**7, 400) / 100.0),
    })
    out = cube_agg(_rd().from_pandas(df).repartition(4),
                   cols=("p", "s"), value_col="price",
                   count_col="n", sum_col="sv").to_pandas()
    want = duckdb.sql("""
        SELECT COALESCE(p,'ALL') AS p, COALESCE(s,'ALL') AS s,
               COUNT(*) AS n, ROUND(SUM(price), 2) AS sv
        FROM df GROUP BY CUBE (p, s)""").df()
    got = out.sort_values(["p", "s"]).reset_index(drop=True)
    want = want.sort_values(["p", "s"]).reset_index(drop=True).astype(
        got.dtypes.to_dict())
    assert got[["p", "s", "n"]].equals(want[["p", "s", "n"]])
    assert np.allclose(got["sv"], want["sv"], atol=0.011)
    # cube adds the per-s set rollup lacks: rows with p=ALL, s real
    per_s = (got["p"] == "ALL") & (got["s"] != "ALL")
    assert per_s.sum() == df["s"].nunique()


def test_grouping_sets_requires_finest_first(ray_session):
    from markdown_lab_ray.stages.analytics import grouping_sets_agg

    df = pd.DataFrame({"p": ["a"], "s": ["b"], "v": [1.0]})
    with pytest.raises(ValueError):
        grouping_sets_agg(_rd().from_pandas(df), cols=["p", "s"],
                          sets=[["p"], ["p", "s"]], value_col="v")


def test_argmax_per_key_mode_with_lexicographic_ties(ray_session):
    from markdown_lab_ray.stages.analytics import argmax_per_key

    rng = np.random.RandomState(7)
    df = pd.DataFrame({
        "k": rng.randint(0, 30, 900).astype(np.int64),
        "cat": rng.choice(["apple", "banana", "cherry", "date"], 900),
    })
    out = argmax_per_key(_rd().from_pandas(df).repartition(6),
                         key_col="k", cat_col="cat").to_pandas()
    want = {}
    for k, g in df.groupby("k"):
        counts = g["cat"].value_counts()
        best_n = counts.max()
        # ties → lexicographically smallest category
        best = min(c for c, n in counts.items() if n == best_n)
        want[k] = (best, best_n)
    assert len(out) == len(want)
    for _, row in out.iterrows():
        assert (row["top_cat"], row["n"]) == want[row["k"]], row["k"]
    assert out["n"].dtype == np.int64


def test_analytics_queries_match_duckdb_at_sf0001(ray_session):
    """End-to-end: every new queries() entry equals its oracle_sql()
    twin on the real sf0.001 tables (same check the driver runs)."""
    import duckdb

    import __ray_entry__ as entrymod

    names = ["rolling_sum", "event_gaps", "order_ranks", "pivot_events",
             "sales_rollup", "sales_cube", "top_event_per_user",
             "value_histogram", "users_per_type"]
    qs, sqls = entrymod.queries(), entrymod.oracle_sql()
    con = duckdb.connect()
    for t in ("events", "orders"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    for name in names:
        got = qs[name](SF).to_pandas()
        want = con.sql(sqls[name]).df()
        assert sorted(got.columns) == sorted(want.columns), name
        assert len(got) == len(want), name
        cols = sorted(got.columns)
        g = got[cols].sort_values(cols).reset_index(drop=True)
        w = want[cols].sort_values(cols).reset_index(drop=True).astype(
            g.dtypes.to_dict())
        for c in cols:
            if g[c].dtype == np.float64:
                assert np.allclose(g[c], w[c], atol=1e-9), (name, c)
            else:
                assert g[c].equals(w[c]), (name, c)


def test_ntile_percent_rank_matches_sql_semantics(ray_session):
    """NTILE split (first n%t tiles get the extra row) and
    percent_rank=(rn-1)/(n-1), 0.0 for singleton groups."""
    import ray.data as rd

    from markdown_lab_ray.stages.analytics import ntile_percent_rank

    df = pd.DataFrame({
        "k": ["a"] * 10 + ["b"] * 3 + ["c"],
        "id": list(range(10)) + [20, 21, 22] + [30],
        "v": [float(10 - i) for i in range(10)] + [5.0, 5.0, 1.0] + [9.0]})
    ds = rd.from_pandas(df).repartition(3)
    out = (ntile_percent_rank(ds, "k", "v", "id", n_tiles=4)
           .to_pandas().sort_values(["k", "id"]).reset_index(drop=True))
    a = out[out.k == "a"]
    # descending v → id order 0..9; tiles 3-3-2-2
    assert a.sort_values("id")["tile"].tolist() == [
        1, 1, 1, 2, 2, 2, 3, 3, 4, 4]
    assert a["pr"].min() == 0.0 and a["pr"].max() == 1.0
    b = out[out.k == "b"].sort_values("id")
    # tie on v=5.0 → id tie-break: 20 before 21
    assert b["pr"].tolist() == [0.0, 0.5, 1.0]
    assert b["tile"].tolist() == [1, 2, 3]
    c = out[out.k == "c"]
    assert c["pr"].tolist() == [0.0] and c["tile"].tolist() == [1]
    with pytest.raises(ValueError):
        ntile_percent_rank(ds, "k", "v", "id", n_tiles=0)


def test_zscore_outliers_exact_moments_and_zero_variance(ray_session):
    import math

    import ray.data as rd

    from markdown_lab_ray.stages.analytics import zscore_outliers

    df = pd.DataFrame({
        "id": np.arange(8, dtype=np.int64),
        "k": ["a"] * 6 + ["flat"] * 2,
        # a: five 1.00s and one 11.00 → the 11.00 is far out
        "v": [1.0, 1.0, 1.0, 1.0, 1.0, 11.0, 5.0, 5.0]})
    ds = rd.from_pandas(df).repartition(3)
    out = zscore_outliers(ds, "k", "v", "id", threshold=2.0).to_pandas()
    # zero-variance key emits nothing
    assert (out["k"] == "flat").sum() == 0
    assert out["id"].tolist() == [5]
    # exact moments: cents mean=(5*100+1100)/6, var=sq/n-mean^2
    mean = (5 * 100 + 1100) / 6
    var = (5 * 100**2 + 1100**2) / 6 - mean * mean
    want = (1100 - mean) / math.sqrt(var)
    got = out["z"].iloc[0]
    assert abs(got - want) < 1e-6


def test_bucketed_hash_join_left_keeps_unmatched(ray_session):
    import ray.data as rd

    from markdown_lab_ray.stages.joins import bucketed_hash_join

    left = rd.from_pandas(pd.DataFrame(
        {"k": np.array([1, 2, 3], np.int64),
         "lv": np.array([10, 20, 30], np.int64)})).repartition(2)
    right = rd.from_pandas(pd.DataFrame(
        {"k": np.array([2], np.int64), "rv": np.array([99], np.int64)}))
    out = (bucketed_hash_join(left, right, key="k", n_buckets=4,
                              how="left")
           .to_pandas().sort_values("k").reset_index(drop=True))
    assert out["k"].tolist() == [1, 2, 3]
    assert out["rv"].isna().tolist() == [True, False, True]
    assert out.loc[1, "rv"] == 99


def test_grouped_pearson_corr_exact_and_degenerate(ray_session):
    """Mergeable-moments correlation equals numpy's corrcoef on the
    same cents-quantized data; zero-variance keys emit null;
    block layout doesn't change the result."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from markdown_lab_ray.stages.analytics import grouped_pearson_corr

    rng = np.random.RandomState(7)
    n = 4000
    x = np.round(rng.uniform(1, 50, n), 2)
    y = np.round(x * 3.5 + rng.normal(0, 20, n), 2)
    df = pd.DataFrame({
        "k": np.where(np.arange(n) % 2 == 0, "a", "b"),
        "x": x, "y": y})
    df = pd.concat([df, pd.DataFrame(
        {"k": ["flat"] * 10, "x": [5.0] * 10,
         "y": np.arange(10, dtype=float)})], ignore_index=True)

    out = (grouped_pearson_corr(rd.from_pandas(df).repartition(8),
                                "k", "x", "y", out_col="c")
           .to_pandas().set_index("k"))
    out2 = (grouped_pearson_corr(rd.from_pandas(df).repartition(3),
                                 "k", "x", "y", out_col="c")
            .to_pandas().set_index("k"))
    for key, g in df.groupby("k"):
        if key == "flat":
            assert out.loc[key, "c"] is None or np.isnan(out.loc[key, "c"])
            continue
        xc = np.round(g["x"].to_numpy() * 100).astype(np.int64)
        yc = np.round(g["y"].to_numpy() * 100).astype(np.int64)
        exact = np.corrcoef(xc, yc)[0, 1]
        assert abs(out.loc[key, "c"] - exact) < 1e-6, key
        assert out.loc[key, "c"] == out2.loc[key, "c"]


def test_grouped_path_order_and_layout(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from markdown_lab_ray.stages.analytics import grouped_path

    table = pa.table({
        "u": pa.array([1, 1, 1, 2, 2], pa.int64()),
        "t": pa.array([3, 1, 2, 5, 5], pa.int64()),
        "id": pa.array([30, 10, 20, 51, 50], pa.int64()),
        "ev": pa.array(["c", "a", "b", "y", "x"]),
    })
    want = {1: ("a->b->c", 3), 2: ("x->y", 2)}  # t asc, tie by id
    for parts in (1, 4):
        out = grouped_path(rd.from_arrow(table).repartition(parts),
                           "u", ["t", "id"], "ev").to_pandas()
        got = {int(r.u): (r.path, int(r.n_steps))
               for r in out.itertuples(index=False)}
        assert got == want


def test_time_window_sum_peers_and_bounds(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from markdown_lab_ray.stages.analytics import time_window_sum_cents

    # user 1: ts 0s, 30s, 30s (peers), 100s; window 60s
    table = pa.table({
        "user_id": pa.array([1, 1, 1, 1, 2], pa.int64()),
        "ts": pa.array([0, 30_000_000, 30_000_000, 100_000_000, 0],
                       pa.timestamp("us")),
        "event_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "value": pa.array([1.0, 2.0, 4.0, 8.0, 16.0], pa.float64()),
    })
    out = time_window_sum_cents(rd.from_arrow(table).repartition(2),
                                window_us=60_000_000).to_pandas()
    got = {int(r.event_id): int(r.win_sum_cents)
           for r in out.itertuples(index=False)}
    # RANGE frames are peer-inclusive: rows 2 AND 3 each see 1+2+4;
    # row 4's window [40s, 100s] holds only itself
    assert got == {1: 100, 2: 700, 3: 700, 4: 800, 5: 1600}


def test_melt_roundtrips_pivot_shape(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from markdown_lab_ray.stages.analytics import melt

    table = pa.table({
        "k": pa.array([1, 2], pa.int64()),
        "a": pa.array([10.0, 20.0], pa.float64()),
        "b": pa.array([1.5, 2.5], pa.float64()),
    })
    out = melt(rd.from_arrow(table), ["k"], ["a", "b"]).to_pandas()
    got = sorted(map(tuple, out[["k", "measure", "value"]].values.tolist()))
    assert got == [(1, "a", 10.0), (1, "b", 1.5),
                   (2, "a", 20.0), (2, "b", 2.5)]
    import pytest

    with pytest.raises(ValueError, match="non-empty"):
        melt(rd.from_arrow(table), ["k"], [])

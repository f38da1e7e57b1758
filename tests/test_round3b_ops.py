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

"""Round-4l operators: link_prediction (Jaccard + RA), holt_trend
(trunc-div recursion), clamped_balance (closed-form floor-at-zero)."""

import numpy as np
import pandas as pd
import ray.data as rd


def test_trunc_div_matches_duckdb():
    import duckdb

    from markdown_lab_ray.stages.analytics import _trunc_div

    for a in (-7, -4, -1, 0, 1, 4, 7, -100000001):
        for d in (2, 3, 4):
            want = duckdb.sql(f"SELECT {a} // {d}").fetchone()[0]
            assert _trunc_div(a, d) == want, (a, d)
    arr = np.array([-7, -4, 0, 7], np.int64)
    assert _trunc_div(arr, 2).tolist() == [-3, -2, 0, 3]


def test_link_prediction_hand_case(ray_session):
    from markdown_lab_ray.stages.graph import link_prediction

    # baskets: 1:{a,b,c} 2:{a,b} 3:{a,b} 4:{c,d}  (a=1,b=2,c=3,d=4)
    df = pd.DataFrame({
        "ok": [1, 1, 1, 2, 2, 3, 3, 4, 4],
        "it": [1, 2, 3, 1, 2, 1, 2, 3, 4]})
    out = (link_prediction(rd.from_pandas(df), "ok", "it",
                           min_cooc=2, top_k=10)
           .to_pandas().reset_index(drop=True))
    # only (1,2) reaches cooc 2 (3 shared baskets); deg a=3, b=3
    assert out[["u", "v"]].values.tolist() == [[1, 2]]
    assert out["n_uv"].tolist() == [3]
    # jaccard = 3/(3+3-3) = 1.0 → 1_000_000 micro
    assert out["jaccard_micro"].tolist() == [1_000_000]
    # ra = 10^9//3 + 10^9//2 + 10^9//2 = 333333333 + 2*500000000
    assert out["ra_nano"].tolist() == [1_333_333_333]
    # layout independence
    out2 = (link_prediction(rd.from_pandas(df).repartition(4), "ok", "it",
                            min_cooc=2, top_k=10)
            .to_pandas().reset_index(drop=True))
    assert out.equals(out2)


def test_link_prediction_min_cooc_validation(ray_session):
    import pytest

    from markdown_lab_ray.stages.graph import link_prediction

    with pytest.raises(ValueError):
        link_prediction(rd.from_items([{"ok": 1, "it": 1}]), "ok", "it",
                        min_cooc=0)


def test_holt_trend_recursion(ray_session):
    from markdown_lab_ray.stages.analytics import holt_trend

    df = pd.DataFrame({
        "o_orderdate": pd.to_datetime(
            ["2020-01-01", "2020-01-02", "2020-01-03"]),
        "o_totalprice": [1.00, 2.00, 1.00]})
    out = holt_trend(rd.from_pandas(df), last_n=10)
    # y (milli-cents): 100000, 200000, 100000
    # l1 = 100000, b1 = 0
    # l2 = (200000 + 3*100000)//4 = 125000; b2 = (25000+0)//2 = 12500
    # l3 = (100000 + 3*137500)//4 = 128125; b3 = (3125+12500)//2 = 7812
    assert out["level_mc"].tolist() == [100000, 125000, 128125]
    assert out["trend_mc"].tolist() == [0, 12500, 7812]
    assert out["forecast_mc"].tolist() == [100000, 137500, 135937]


def test_clamped_balance_hand_case(ray_session):
    from markdown_lab_ray.stages.analytics import clamped_balance

    # user 1: +5.00, -8.00 (clamped to 0), +3.00 → final 300, max 500,
    # one clamp.  user 2: -1.00 first (clamped), +2.00 → final 200.
    df = pd.DataFrame({
        "user_id": [1, 1, 1, 2, 2],
        "ts": pd.to_datetime(["2020-01-01", "2020-01-02", "2020-01-03",
                              "2020-01-01", "2020-01-02"]),
        "event_id": [1, 2, 3, 4, 5],
        "event_type": ["click", "purchase", "view", "error", "signup"],
        "value": [5.00, 8.00, 3.00, 1.00, 2.00]})
    out = (clamped_balance(rd.from_pandas(df)).to_pandas()
           .sort_values("user_id").reset_index(drop=True))
    assert out.values.tolist() == [[1, 300, 500, 1], [2, 200, 200, 1]]
    # partial debit that does NOT hit the floor is not a clamp
    df2 = df[df["user_id"] == 1].copy()
    df2.loc[df2["event_id"] == 2, "value"] = 4.00
    out2 = clamped_balance(rd.from_pandas(df2)).to_pandas()
    assert out2.values.tolist() == [[1, 400, 500, 0]]

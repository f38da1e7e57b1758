"""Round-4j operators: late_ship_orders (EXISTS-inequality semi),
mann_whitney_u, dow_seasonality, daily_theilsen, dense_topk_per_group,
increasing_runs."""

import numpy as np
import pandas as pd
import ray.data as rd


def _orders(rows):
    df = pd.DataFrame(rows, columns=["o_orderkey", "o_orderdate",
                                     "o_orderpriority"])
    df["o_orderdate"] = pd.to_datetime(df["o_orderdate"])
    return rd.from_pandas(df)


def test_late_ship_orders_hand_case(ray_session):
    from markdown_lab_ray.stages.analytics import late_ship_orders

    orders = _orders([
        (1, "2020-01-01", "1-URGENT"),   # late line (+40d)
        (2, "2020-01-01", "1-URGENT"),   # on time (+10d)
        (3, "2020-01-01", "2-HIGH"),     # exactly +30d → NOT late (strict >)
        (4, "2020-01-01", "3-LOW"),      # no lineitems at all
        (5, "2020-01-01", "2-HIGH"),     # two lines, one late
    ])
    li = pd.DataFrame({
        "l_orderkey": [1, 1, 2, 3, 5, 5],
        "l_shipdate": pd.to_datetime([
            "2020-01-05", "2020-02-10",   # order 1: max +40d
            "2020-01-11",                 # order 2: +10d
            "2020-01-31",                 # order 3: +30d boundary
            "2020-01-02", "2020-03-01",   # order 5: max +60d
        ])})
    got = (late_ship_orders(orders, rd.from_pandas(li), late_days=30)
           .to_pandas().sort_values("o_orderpriority")
           .reset_index(drop=True))
    assert got["o_orderpriority"].tolist() == ["1-URGENT", "2-HIGH"]
    assert got["n_late"].tolist() == [1, 1]
    # layout independence (per-batch max partials are a true combiner)
    got5 = (late_ship_orders(orders.repartition(3),
                             rd.from_pandas(li).repartition(4),
                             late_days=30)
            .to_pandas().sort_values("o_orderpriority")
            .reset_index(drop=True))
    assert got.equals(got5)


def test_mann_whitney_hand_case_with_ties(ray_session):
    from markdown_lab_ray.stages.analytics import mann_whitney_u

    # a: [1, 2, 2], b: [2, 3]; pool sorted = [1, 2, 2, 2, 3]
    # avg ranks: 1 → 1; 2 → 3 (three-way tie); 3 → 5
    # R_a = 1 + 3 + 3 = 7 → U_a = 7 - 3*4/2 = 1 → u2_a = 2
    # R_b = 3 + 5 = 8 → U_b = 8 - 2*3/2 = 5 → u2_b = 10
    df = pd.DataFrame({"g": ["a", "a", "a", "b", "b", "c"],
                       "v": [0.01, 0.02, 0.02, 0.02, 0.03, 9.99]})
    got = mann_whitney_u(rd.from_pandas(df), "g", "v", "a", "b")
    assert got["n_a"].tolist() == [3]
    assert got["n_b"].tolist() == [2]
    assert got["u2_a"].tolist() == [2]
    assert got["u2_b"].tolist() == [10]
    assert got["u2_a"][0] + got["u2_b"][0] == 2 * 3 * 2
    got4 = mann_whitney_u(rd.from_pandas(df).repartition(4),
                          "g", "v", "a", "b")
    assert got.equals(got4)


def test_dow_seasonality_hand_case(ray_session):
    from markdown_lab_ray.stages.analytics import dow_seasonality

    # 1970-01-01 is a Thursday (ISO 4); +4 days → Monday (ISO 1)
    df = pd.DataFrame({
        "o_orderdate": pd.to_datetime(
            ["1970-01-01", "1970-01-01", "1970-01-05", "1970-01-12"]),
        "o_totalprice": [1.00, 2.00, 6.00, 0.00]})
    got = dow_seasonality(rd.from_pandas(df))
    assert got["dow"].tolist() == [1, 4]
    assert got["n_days"].tolist() == [2, 1]
    assert got["revenue_cents"].tolist() == [600, 300]
    # overall avg daily = 900/3 = 300; Mon avg = 300 → 1.0; Thu → 1.0
    assert got["index_micro"].tolist() == [1_000_000, 1_000_000]


def test_daily_theilsen_hand_case(ray_session):
    from markdown_lab_ray.stages.analytics import daily_theilsen

    # days 0,1,3 with cents 100, 300, 300 → slopes:
    # (300-100)/1=200, (300-100)/3≈66.67, (300-300)/2=0 → median 66.67
    df = pd.DataFrame({
        "o_orderdate": pd.to_datetime(
            ["1970-01-01", "1970-01-02", "1970-01-04"]),
        "o_totalprice": [1.00, 3.00, 3.00]})
    got = daily_theilsen(rd.from_pandas(df))
    assert got["n_pairs"].tolist() == [3]
    assert abs(got["ts_slope"][0] - 200.0 / 3) < 1e-12


def test_dense_topk_keeps_all_ties(ray_session):
    from markdown_lab_ray.stages.analytics import dense_topk_per_group

    df = pd.DataFrame({
        "g": ["x"] * 6 + ["y"] * 2,
        "id": [1, 2, 3, 4, 5, 6, 7, 8],
        "v": [9.00, 9.00, 8.00, 7.00, 7.00, 1.00, 5.00, 4.00]})
    got = (dense_topk_per_group(rd.from_pandas(df), "g", "v", "id", k=3)
           .to_pandas().reset_index(drop=True))
    x = got[got["g"] == "x"]
    # distinct top-3 for x: 900, 800, 700 — BOTH 900s and BOTH 700s kept
    assert x["id"].tolist() == [1, 2, 3, 4, 5]
    assert x["value_rank"].tolist() == [1, 1, 2, 3, 3]
    y = got[got["g"] == "y"]
    assert y["id"].tolist() == [7, 8]
    assert y["value_rank"].tolist() == [1, 2]
    # combiner soundness under different layouts
    got1 = (dense_topk_per_group(rd.from_pandas(df).repartition(8),
                                 "g", "v", "id", k=3)
            .to_pandas().reset_index(drop=True))
    assert got.equals(got1)


def test_increasing_runs_hand_case(ray_session):
    from markdown_lab_ray.stages.analytics import increasing_runs

    df = pd.DataFrame({
        "k": [1, 1, 1, 1, 1, 2, 2],
        "ts": pd.to_datetime(["2020-01-01", "2020-01-02", "2020-01-03",
                              "2020-01-04", "2020-01-05",
                              "2020-01-01", "2020-01-02"]),
        "id": [1, 2, 3, 4, 5, 6, 7],
        # key 1: 1 < 2 < 3, then 3 == 3 breaks, then 4 → runs 3, 2
        "v": [0.01, 0.02, 0.03, 0.03, 0.04, 0.05, 0.05]})
    got = (increasing_runs(rd.from_pandas(df), "k", "ts", "id", "v")
           .to_pandas().sort_values("k").reset_index(drop=True))
    assert got["k"].tolist() == [1, 2]
    assert got["max_run"].tolist() == [3, 1]
    got3 = (increasing_runs(rd.from_pandas(df).repartition(4),
                            "k", "ts", "id", "v")
            .to_pandas().sort_values("k").reset_index(drop=True))
    assert got.equals(got3)


def test_sequence_gaps_hand_case(ray_session):
    from markdown_lab_ray.stages.analytics import sequence_gaps

    # keys {1,2,3, 7, 10,11} → islands [1-3],[7],[10-11]; gaps 3 and 2
    df = pd.DataFrame({"k": [3, 1, 2, 7, 10, 11, 2, 7]})
    got = sequence_gaps(rd.from_pandas(df), "k")
    assert got["n_keys"].tolist() == [6]
    assert got["n_islands"].tolist() == [3]
    assert got["max_gap"].tolist() == [3]
    got4 = sequence_gaps(rd.from_pandas(df).repartition(5), "k")
    assert got.equals(got4)
    # dense sequence → one island, zero gap
    dense = sequence_gaps(rd.from_pandas(pd.DataFrame({"k": [1, 2, 3]})), "k")
    assert dense["n_islands"].tolist() == [1]
    assert dense["max_gap"].tolist() == [0]


def test_dow_residuals_hand_case(ray_session):
    from markdown_lab_ray.stages.analytics import dow_residuals

    # two Mondays (days 4, 11) with 100 and 300 cents → Monday mean 200
    # one Thursday (day 0) with 500 → residual 0 (own mean)
    df = pd.DataFrame({
        "o_orderdate": pd.to_datetime(
            ["1970-01-05", "1970-01-12", "1970-01-01"]),
        "o_totalprice": [1.00, 3.00, 5.00]})
    got = dow_residuals(rd.from_pandas(df), top_n=10)
    assert got["dn"].tolist() == [4, 11, 0]       # |±100| ties → dn asc
    assert got["residual_micro"].tolist() == [-100_000_000, 100_000_000, 0]
    assert got["dow"].tolist() == [1, 1, 4]


def test_abc_classification_hand_case(ray_session):
    from markdown_lab_ray.stages.analytics import abc_classification

    # spends: k1=80, k2=15, k3=4, k4=1 (total 100)
    # cum: 80 (A, =80%), 95 (B, =95%), 99 (C), 100 (C)
    df = pd.DataFrame({"k": [1, 1, 2, 3, 4],
                       "v": [0.50, 0.30, 0.15, 0.04, 0.01]})
    got = (abc_classification(rd.from_pandas(df), "k", "v")
           .to_pandas().sort_values("k").reset_index(drop=True))
    assert got["revenue_cents"].tolist() == [80, 15, 4, 1]
    assert got["abc_class"].tolist() == ["A", "B", "C", "C"]
    got3 = (abc_classification(rd.from_pandas(df).repartition(4), "k", "v")
            .to_pandas().sort_values("k").reset_index(drop=True))
    assert got.equals(got3)

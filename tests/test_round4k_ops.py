"""Round-4k TPC-H classic shapes: the pure batch kernels and the
layout-sensitive pieces that the sf-level oracle sweep can't isolate
(empty-side joins, zero-bucket synthesis, exact integer mirrors)."""

import numpy as np
import pandas as pd
import pyarrow as pa


def test_year_col_boundaries():
    from __ray_entry__ import _year_col

    ts = pa.chunked_array([pa.array(
        np.array(["1995-12-31T23:59:59", "1996-01-01T00:00:00",
                  "2001-11-04T12:00:00"], dtype="datetime64[us]"))])
    assert _year_col(ts).tolist() == [1995, 1996, 2001]


def test_probe_sorted_membership():
    from __ray_entry__ import _probe_sorted

    sk = np.array([2, 5, 9], np.int64)
    pos, ok = _probe_sorted(np.array([1, 2, 5, 7, 9, 11], np.int64), sk)
    assert ok.tolist() == [False, True, True, False, True, False]
    assert pos[ok].tolist() == [0, 1, 2]
    # empty lookup side: nothing matches, nothing crashes
    pos0, ok0 = _probe_sorted(np.array([1, 2], np.int64),
                              np.array([], np.int64))
    assert not ok0.any()


def test_customer_order_dist_zero_bucket(ray_session, tmp_path):
    import ray.data as rd

    from __ray_entry__ import q_customer_order_dist

    # 4 customers, two of them order (3 and 1 orders): buckets
    # {3:1, 1:1, 0:2} sorted by custdist desc, c_count desc
    pd.DataFrame({"c_custkey": [1, 2, 3, 4]}).to_parquet(
        tmp_path / "customer.parquet")
    pd.DataFrame({"o_custkey": [1, 1, 1, 3]}).to_parquet(
        tmp_path / "orders.parquet")
    out = q_customer_order_dist(str(tmp_path))
    assert out.values.tolist() == [[0, 2], [3, 1], [1, 1]]


def test_promo_revenue_exact_division(ray_session, tmp_path):
    from __ray_entry__ import q_promo_revenue

    pd.DataFrame({
        "l_partkey": [1, 2, 2],
        "l_extendedprice": [10.00, 20.00, 5.00],
        "l_discount": [0.0, 0.5, 0.0],
        "l_shipdate": pd.to_datetime(
            ["1996-09-15", "1996-09-20", "1996-10-01"]),  # 3rd: out
    }).to_parquet(tmp_path / "lineitem.parquet")
    pd.DataFrame({"p_partkey": [1, 2],
                  "p_type": ["PROMO", "STANDARD"]}).to_parquet(
        tmp_path / "part.parquet")
    out = q_promo_revenue(str(tmp_path))
    # promo 1000 cents of 2000 total → 5000 bp exactly (floor division)
    assert out.iloc[0].tolist() == [1000, 2000, 5000]


def test_brand_bracket_revenue_disjuncts(ray_session, tmp_path):
    from __ray_entry__ import q_brand_bracket_revenue

    pd.DataFrame({
        "p_partkey": [1, 2, 3, 4],
        "p_brand": ["Brand#3", "Brand#7", "Brand#12", "Brand#3"],
        "p_size": [5, 10, 16, 3],
    }).to_parquet(tmp_path / "part.parquet")
    pd.DataFrame({
        "l_partkey": [1, 2, 3, 4, 1],
        "l_quantity": [11.0, 10.0, 25.0, 12.0, 1.0],
        "l_extendedprice": [1.00, 2.00, 4.00, 8.00, 16.00],
        "l_discount": [0.0] * 5,
    }).to_parquet(tmp_path / "lineitem.parquet")
    # match: rows 1 (qty 11 ≤ 11), 2 (qty 10 in [10,20]), 5 (qty 1);
    # miss: row 3 (size 16 > 15), row 4 (qty 12 outside [1,11])
    out = q_brand_bracket_revenue(str(tmp_path))
    assert out["revenue_cents"].tolist() == [100 + 200 + 1600]


def test_idle_rich_cross_multiply_strictness(ray_session, tmp_path):
    from __ray_entry__ import q_idle_rich_customers

    pd.DataFrame({"n_nationkey": [0, 1],
                  "n_name": ["N0", "N1"]}).to_parquet(
        tmp_path / "nation.parquet")
    # positive balances: 100, 200, 300 cents → mean 200; strict >
    # keeps only 300.  The -5.00 row must not drag the mean.
    pd.DataFrame({
        "c_custkey": [1, 2, 3, 4],
        "c_nationkey": [0, 0, 1, 1],
        "c_acctbal": [1.00, 2.00, 3.00, -5.00],
    }).to_parquet(tmp_path / "customer.parquet")
    # customer 3 has only a pre-2000 order → still "idle"
    pd.DataFrame({
        "o_custkey": [3, 2],
        "o_orderdate": pd.to_datetime(["1999-06-01", "2000-06-01"]),
    }).to_parquet(tmp_path / "orders.parquet")
    out = q_idle_rich_customers(str(tmp_path))
    assert out.values.tolist() == [["N1", 1, 300]]


def test_nation_pair_volume_directions(ray_session, tmp_path):
    from __ray_entry__ import q_nation_pair_volume

    pd.DataFrame({"n_nationkey": [3, 8],
                  "n_name": ["NATION_3", "NATION_8"]}).to_parquet(
        tmp_path / "nation.parquet")
    pd.DataFrame({"s_suppkey": [1, 2],
                  "s_nationkey": [3, 8]}).to_parquet(
        tmp_path / "supplier.parquet")
    pd.DataFrame({"c_custkey": [10, 20],
                  "c_nationkey": [8, 3]}).to_parquet(
        tmp_path / "customer.parquet")
    pd.DataFrame({"o_orderkey": [100, 200],
                  "o_custkey": [10, 20]}).to_parquet(
        tmp_path / "orders.parquet")
    pd.DataFrame({
        "l_orderkey": [100, 200, 100],
        "l_suppkey": [1, 2, 1],
        "l_extendedprice": [10.00, 20.00, 40.00],
        "l_discount": [0.0, 0.0, 0.0],
        "l_shipdate": pd.to_datetime(
            ["1996-03-01", "1997-07-01", "1998-01-01"]),  # 3rd: out
    }).to_parquet(tmp_path / "lineitem.parquet")
    out = q_nation_pair_volume(str(tmp_path))
    # supp3→cust8 in 1996 (1000c), supp8→cust3 in 1997 (2000c)
    assert out.values.tolist() == [
        ["NATION_3", "NATION_8", 1996, 1000],
        ["NATION_8", "NATION_3", 1997, 2000]]


def test_product_profit_cost_term(ray_session, tmp_path):
    from __ray_entry__ import q_product_profit

    pd.DataFrame({"n_nationkey": [3], "n_name": ["NATION_3"]}).to_parquet(
        tmp_path / "nation.parquet")
    pd.DataFrame({"s_suppkey": [1], "s_nationkey": [3]}).to_parquet(
        tmp_path / "supplier.parquet")
    pd.DataFrame({"p_partkey": [1, 2],
                  "p_name": ["large widget", "blue rod"],
                  "p_retailprice": [2.00, 9.99]}).to_parquet(
        tmp_path / "part.parquet")
    pd.DataFrame({
        "l_partkey": [1, 2],       # rod filtered out by name
        "l_suppkey": [1, 1],
        "l_quantity": [3.0, 1.0],
        "l_extendedprice": [10.00, 5.00],
        "l_discount": [0.10, 0.0],
        "l_shipdate": pd.to_datetime(["1996-05-01", "1996-05-01"]),
    }).to_parquet(tmp_path / "lineitem.parquet")
    out = q_product_profit(str(tmp_path))
    # gross = 1000c × 90 = 90000; cost = 200c × 3 × 100 = 60000
    assert out.values.tolist() == [["NATION_3", 1996, 30000]]


def test_forecast_revenue_change_bands(ray_session, tmp_path):
    from __ray_entry__ import q_forecast_revenue_change

    pd.DataFrame({
        "l_shipdate": pd.to_datetime(
            ["1997-06-01", "1997-06-01", "1997-06-01", "1996-12-31"]),
        "l_extendedprice": [100.00, 100.00, 100.00, 100.00],
        "l_discount": [0.06, 0.04, 0.06, 0.06],   # 2nd: below band
        "l_quantity": [10.0, 10.0, 24.0, 10.0],   # 3rd: qty cap; 4th: year
    }).to_parquet(tmp_path / "lineitem.parquet")
    out = q_forecast_revenue_change(str(tmp_path))
    # only row 1 qualifies: 10000 cents × 6 = 60000 hundredths
    assert out["revenue_hund"].tolist() == [60000]


def test_returned_revenue_flag_and_window(ray_session, tmp_path):
    from __ray_entry__ import q_returned_revenue

    pd.DataFrame({"n_nationkey": [0], "n_name": ["N0"]}).to_parquet(
        tmp_path / "nation.parquet")
    pd.DataFrame({"c_custkey": [1, 2], "c_name": ["a", "b"],
                  "c_nationkey": [0, 0],
                  "c_acctbal": [1.23, 4.56]}).to_parquet(
        tmp_path / "customer.parquet")
    pd.DataFrame({
        "o_orderkey": [10, 11, 12],
        "o_custkey": [1, 2, 1],
        "o_orderdate": pd.to_datetime(
            ["1996-08-01", "1996-08-01", "1996-06-30"]),  # 12: pre-window
    }).to_parquet(tmp_path / "orders.parquet")
    pd.DataFrame({
        "l_orderkey": [10, 10, 11, 12],
        "l_returnflag": ["R", "N", "R", "R"],   # N never counts
        "l_extendedprice": [10.00, 99.0, 20.00, 50.00],
        "l_discount": [0.0, 0.0, 0.5, 0.0],
    }).to_parquet(tmp_path / "lineitem.parquet")
    out = q_returned_revenue(str(tmp_path))
    # cust1: 1000 (order 10's R line); cust2: 1000 (20.00 × 0.5)
    assert out["revenue_cents"].tolist() == [1000, 1000]
    assert out["c_custkey"].tolist() == [1, 2]    # tie → custkey asc
    assert out["bal_cents"].tolist() == [123, 456]

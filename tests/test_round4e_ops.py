"""Round-4e additions: banded big×big range join, weighted median."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd


# ---------------------------------------------------------------------------
# banded_range_join
# ---------------------------------------------------------------------------

def _pairs(points, intervals, band_width, **kw):
    from markdown_lab_ray.stages.joins import banded_range_join

    out = banded_range_join(points, intervals, point_col="pt",
                            lo_col="lo", hi_col="hi",
                            band_width=band_width, **kw).to_pandas()
    return sorted(zip(out["pid"], out["iid"]))


def _mk(points, intervals):
    p = rd.from_arrow(pa.table({
        "pid": pa.array(range(len(points)), pa.int64()),
        "pt": pa.array(points, pa.int64())}))
    i = rd.from_arrow(pa.table({
        "iid": pa.array(range(len(intervals)), pa.int64()),
        "lo": pa.array([a for a, _ in intervals], pa.int64()),
        "hi": pa.array([b for _, b in intervals], pa.int64())}))
    return p, i


def test_banded_range_join_matches_naive(ray_session):
    rng = np.random.RandomState(5)
    points = rng.randint(0, 1000, 200).tolist()
    lows = rng.randint(0, 950, 60)
    intervals = [(int(lo), int(lo + rng.randint(1, 120)))
                 for lo in lows]
    p, i = _mk(points, intervals)
    for w in (16, 100, 1024):  # narrow, typical, one-band-covers-all
        got = _pairs(p, i, w)
        want = sorted(
            (pid, iid)
            for pid, pt in enumerate(points)
            for iid, (lo, hi) in enumerate(intervals)
            if lo <= pt < hi)
        assert got == want, f"band_width={w}"


def test_banded_range_join_exclusive_hi_and_band_edges(ray_session):
    # point exactly at hi is OUT; point at lo is IN; interval spanning
    # a band boundary still meets its point exactly once
    p, i = _mk([10, 19, 20, 25], [(10, 20), (15, 26)])
    got = _pairs(p, i, 8)  # bands of 8: boundary at 16, 24
    assert got == [(0, 0), (1, 0), (1, 1), (2, 1), (3, 1)]


def test_banded_range_join_rejects_collisions_and_bad_width(ray_session):
    from markdown_lab_ray.stages.joins import banded_range_join

    ds = rd.from_arrow(pa.table({"x": pa.array([1], pa.int64())}))
    with pytest.raises(ValueError, match="collision"):
        banded_range_join(ds, ds, "x", "x", "x", 10)
    p, i = _mk([1], [(0, 2)])
    with pytest.raises(ValueError, match="band_width"):
        banded_range_join(p, i, "pt", "lo", "hi", 0)


# ---------------------------------------------------------------------------
# grouped_weighted_median
# ---------------------------------------------------------------------------

def test_weighted_median_integer_rule(ray_session):
    from markdown_lab_ray.stages.analytics import grouped_weighted_median

    t = pa.table({
        "k": pa.array(["a"] * 4 + ["b"] * 2),
        # a: values 1.00 w1, 2.00 w1, 3.00 w5, 4.00 w1 -> half of 8 is
        # 4 -> first value whose 2*cumw >= 8 is 3.00
        "v": pa.array([1.0, 2.0, 3.0, 4.0, 10.0, 20.0]),
        "w": pa.array([1, 1, 5, 1, 1, 1], pa.int64()),
    })
    out = (grouped_weighted_median(rd.from_arrow(t).repartition(3),
                                   "k", "v", "w")
           .to_pandas().set_index("k"))
    assert out.loc["a", "wmedian_cents"] == 300
    assert out.loc["a", "total_weight"] == 8
    # b: weights 1/1 -> 2*cumw=2 >= tot=2 at the FIRST value (lower
    # weighted median)
    assert out.loc["b", "wmedian_cents"] == 1000


def test_weighted_median_tie_values_order_independent(ray_session):
    from markdown_lab_ray.stages.analytics import grouped_weighted_median

    # duplicate values with different weights: any tie order crosses
    # the threshold inside the same value run
    t = pa.table({
        "k": pa.array(["x"] * 5),
        "v": pa.array([5.0, 5.0, 5.0, 1.0, 9.0]),
        "w": pa.array([2, 3, 1, 1, 1], pa.int64()),
    })
    out = grouped_weighted_median(rd.from_arrow(t), "k", "v", "w").to_pandas()
    assert out["wmedian_cents"].iloc[0] == 500


# ---------------------------------------------------------------------------
# locf_fill
# ---------------------------------------------------------------------------

def test_locf_fills_silent_days_with_last_value(ray_session):
    from markdown_lab_ray.stages.analytics import locf_fill

    day_us = 86_400_000_000
    t = pa.table({
        "id": pa.array([1, 2, 3, 4], pa.int64()),
        "ts": pa.array([0, 10, 3 * day_us, 3 * day_us + 5],
                       pa.int64()).cast(pa.timestamp("us")),
        "u": pa.array([7, 7, 7, 9], pa.int64()),
        "v": pa.array([1.5, 2.5, 9.0, 4.0]),
    })
    out = (locf_fill(rd.from_arrow(t).repartition(3), "u", "ts", "v", "id")
           .to_pandas().sort_values(["u", "day_id"]))
    u7 = out[out["u"] == 7]
    # day 0: last value 2.5 (ts tie-break by id); days 1-2 carried;
    # day 3: 9.0.  user 9: single-day series.
    assert u7["day_id"].tolist() == [19700101, 19700102, 19700103,
                                     19700104]
    assert u7["v"].tolist() == [2.5, 2.5, 2.5, 9.0]
    assert out[out["u"] == 9]["v"].tolist() == [4.0]


# ---------------------------------------------------------------------------
# daily_kl_drift
# ---------------------------------------------------------------------------

def test_daily_kl_zero_when_every_day_matches_corpus(ray_session):
    from markdown_lab_ray.stages.analytics import daily_kl_drift

    day_us = 86_400_000_000
    # two days with the identical mix -> corpus mix == day mix -> KL 0
    ts = [0, 1, 2, day_us, day_us + 1, day_us + 2]
    cats = ["a", "a", "b"] * 2
    t = pa.table({"ts": pa.array(ts, pa.int64()).cast(pa.timestamp("us")),
                  "c": pa.array(cats)})
    out = daily_kl_drift(rd.from_arrow(t), "ts", "c").to_pandas()
    assert out["kl_micro"].tolist() == [0, 0]


def test_daily_kl_detects_drifted_day(ray_session):
    import numpy as np

    from markdown_lab_ray.stages.analytics import daily_kl_drift

    day_us = 86_400_000_000
    # day 1 is all-"a", day 2 is balanced -> day 1 diverges more
    ts = [0, 1, 2, 3] + [day_us, day_us + 1, day_us + 2, day_us + 3]
    cats = ["a", "a", "a", "a", "a", "a", "b", "b"]
    t = pa.table({"ts": pa.array(ts, pa.int64()).cast(pa.timestamp("us")),
                  "c": pa.array(cats)})
    out = (daily_kl_drift(rd.from_arrow(t).repartition(4), "ts", "c")
           .to_pandas().sort_values("day_id"))
    # exact: global p(a)=6/8, p(b)=2/8
    kl1 = 1.0 * np.log(1.0 / (6 / 8))
    kl2 = 0.5 * np.log(0.5 / (6 / 8)) + 0.5 * np.log(0.5 / (2 / 8))
    assert out["kl_micro"].tolist() == [
        int(np.floor(kl1 * 1e6 + 0.5)), int(np.floor(kl2 * 1e6 + 0.5))]


# ---------------------------------------------------------------------------
# ann_recall audit
# ---------------------------------------------------------------------------

def test_ann_recall_bounds_and_brute_is_one(ray_session):
    import __ray_entry__ as entry

    out = entry.q_ann_recall("/root/testdata/sf0.001")
    assert set(out["method"]) == {"lsh", "ivf"}
    assert ((out["recall_micro"] >= 0)
            & (out["recall_micro"] <= 1_000_000)).all()

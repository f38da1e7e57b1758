"""Round-4g additions: gaps-and-islands streaks, identical-event runs,
daily lag-1 autocorrelation, Bollinger bands, per-user OLS trend,
Pareto revenue-concentration crossings."""

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

_US_DAY = 86_400_000_000
_US_HOUR = 3_600_000_000


def _events(rows):
    """rows: list of (event_id, user_id, ts_us, event_type, value)."""
    return rd.from_arrow(pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "user_id": pa.array([r[1] for r in rows], pa.int64()),
        "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
        "event_type": pa.array([r[3] for r in rows], pa.string()),
        "value": pa.array([float(r[4]) for r in rows], pa.float64()),
    }))


# ---------------------------------------------------------------------------
# user_streaks
# ---------------------------------------------------------------------------

def test_user_streaks_islands(ray_session):
    from markdown_lab_ray.stages.analytics import user_streaks

    rows = []
    eid = 0
    # user 1: days 0,1,2 then 5,6 -> streak 3 (two events on day 1)
    for d in (0, 1, 1, 2, 5, 6):
        rows.append((eid, 1, d * _US_DAY + 7, "view", 1.0))
        eid += 1
    # user 2: single day -> streak 1
    rows.append((eid, 2, 40 * _US_DAY, "view", 1.0))
    eid += 1
    # user 3: days 10..16 -> streak 7
    for d in range(10, 17):
        rows.append((eid, 3, d * _US_DAY + 123, "click", 2.0))
        eid += 1

    got = (user_streaks(_events(rows)).to_pandas()
           .sort_values("user_id").reset_index(drop=True))
    assert list(got["user_id"]) == [1, 2, 3]
    assert list(got["max_streak"]) == [3, 1, 7]


def test_user_streaks_random_vs_naive(ray_session):
    from markdown_lab_ray.stages.analytics import user_streaks

    rng = np.random.RandomState(7)
    rows = [(i, int(rng.randint(0, 12)),
             int(rng.randint(0, 40)) * _US_DAY + int(rng.randint(0, 1000)),
             "e", 1.0) for i in range(400)]
    got = (user_streaks(_events(rows), n_buckets=4).to_pandas()
           .sort_values("user_id").reset_index(drop=True))

    by_user = {}
    for _, u, ts, _t, _v in rows:
        by_user.setdefault(u, set()).add(ts // _US_DAY)
    want = {}
    for u, days in by_user.items():
        ds_ = sorted(days)
        best = cur = 1
        for a, b in zip(ds_, ds_[1:]):
            cur = cur + 1 if b - a == 1 else 1
            best = max(best, cur)
        want[u] = best
    assert dict(zip(got["user_id"], got["max_streak"])) == want


# ---------------------------------------------------------------------------
# event_type_runs
# ---------------------------------------------------------------------------

def test_event_type_runs_tiebreak(ray_session):
    from markdown_lab_ray.stages.analytics import event_type_runs

    # user 1: aa bb -> tie at 2, smallest type "a" wins
    rows = [(0, 1, 1_000, "a", 0.0), (1, 1, 2_000, "a", 0.0),
            (2, 1, 3_000, "b", 0.0), (3, 1, 4_000, "b", 0.0),
            # user 2: a b b b a -> ("b", 3)
            (4, 2, 1_000, "a", 0.0), (5, 2, 2_000, "b", 0.0),
            (6, 2, 3_000, "b", 0.0), (7, 2, 4_000, "b", 0.0),
            (8, 2, 5_000, "a", 0.0)]
    got = (event_type_runs(_events(rows)).to_pandas()
           .sort_values("user_id").reset_index(drop=True))
    assert list(got.itertuples(index=False)) == [
        (1, 2, "a"), (2, 3, "b")]


def test_event_type_runs_order_is_ts_then_id(ray_session):
    from markdown_lab_ray.stages.analytics import event_type_runs

    # same ts: event_id breaks the tie, making the run a,a,b not a,b,a
    rows = [(0, 1, 1_000, "a", 0.0), (1, 1, 1_000, "a", 0.0),
            (2, 1, 1_000, "b", 0.0)]
    got = event_type_runs(_events(rows)).to_pandas()
    assert list(got.itertuples(index=False)) == [(1, 2, "a")]


# ---------------------------------------------------------------------------
# daily_autocorr / bollinger_daily
# ---------------------------------------------------------------------------

def _one_event_per_day(series_cents):
    return _events([(i, 1, i * _US_DAY + 5, "x", c / 100.0)
                    for i, c in enumerate(series_cents)])


def test_daily_autocorr_alternating_is_negative(ray_session):
    from markdown_lab_ray.stages.analytics import daily_autocorr

    s = [100, 200] * 10  # perfectly alternating -> r = -1
    got = daily_autocorr(_one_event_per_day(s)).to_pandas()
    assert got.loc[0, "n_pairs"] == 19
    assert got.loc[0, "lag1_corr_micro"] == -1_000_000


def test_daily_autocorr_matches_naive(ray_session):
    from markdown_lab_ray.stages.analytics import daily_autocorr

    rng = np.random.RandomState(3)
    s = [int(rng.randint(50, 5000)) for _ in range(30)]
    got = daily_autocorr(_one_event_per_day(s)).to_pandas()
    x, y = s[:-1], s[1:]
    n = len(x)
    num = n * sum(a * b for a, b in zip(x, y)) - sum(x) * sum(y)
    d1 = n * sum(a * a for a in x) - sum(x) ** 2
    d2 = n * sum(b * b for b in y) - sum(y) ** 2
    want = int(math.floor(
        1e6 * float(num) / math.sqrt(float(d1) * float(d2)) + 0.5))
    assert got.loc[0, "lag1_corr_micro"] == want


def test_bollinger_constant_series_never_breaches(ray_session):
    from markdown_lab_ray.stages.analytics import bollinger_daily

    got = (bollinger_daily(_one_event_per_day([500] * 10)).to_pandas()
           .sort_values("day_id"))
    assert (got["breach"] == 0).all()
    assert (got["mean_micro"] == 500_000_000).all()
    assert (got["upper_micro"] == got["lower_micro"]).all()


def test_bollinger_spike_breaches_up(ray_session):
    from markdown_lab_ray.stages.analytics import bollinger_daily

    s = [100] * 9 + [10_000]
    got = (bollinger_daily(_one_event_per_day(s)).to_pandas()
           .sort_values("day_id").reset_index(drop=True))
    assert got.loc[9, "breach"] == 1
    assert (got.loc[:8, "breach"] == 0).all()


# ---------------------------------------------------------------------------
# user_trend
# ---------------------------------------------------------------------------

def test_user_trend_exact_line(ray_session):
    from markdown_lab_ray.stages.analytics import user_trend

    # user 1: +100 cents every hour -> exactly 100e6 micro-cents/hour
    rows = [(i, 1, i * _US_HOUR, "x", 1.0 * (i + 1)) for i in range(5)]
    # user 2: single event -> dropped
    rows.append((99, 2, 0, "x", 5.0))
    got = user_trend(_events(rows)).to_pandas()
    assert list(got["user_id"]) == [1]
    assert got.loc[0, "n"] == 5
    assert got.loc[0, "trend_micro"] == 100_000_000


def test_user_trend_matches_naive(ray_session):
    from markdown_lab_ray.stages.analytics import user_trend

    rng = np.random.RandomState(5)
    rows = [(i, int(rng.randint(0, 6)),
             int(rng.randint(0, 10 ** 12)),
             "x", float(rng.randint(1, 10_000)) / 100.0)
            for i in range(300)]
    got = (user_trend(_events(rows), n_buckets=4).to_pandas()
           .sort_values("user_id").reset_index(drop=True))

    by_user = {}
    for eid, u, ts, _t, v in rows:
        by_user.setdefault(u, []).append(
            (ts // 1_000_000, int(math.floor(v * 100 + 0.5))))
    want = {}
    for u, pts in by_user.items():
        t0 = min(p[0] for p in pts)
        xs = [p[0] - t0 for p in pts]
        ys = [p[1] for p in pts]
        n = len(pts)
        num = n * sum(a * b for a, b in zip(xs, ys)) - sum(xs) * sum(ys)
        den = n * sum(a * a for a in xs) - sum(xs) ** 2
        if n >= 2 and den > 0:
            want[u] = int(math.floor(
                3.6e9 * float(num) / float(den) + 0.5))
    assert dict(zip(got["user_id"], got["trend_micro"])) == want


# ---------------------------------------------------------------------------
# pareto_crossings
# ---------------------------------------------------------------------------

def test_pareto_crossings_hand_case(ray_session):
    from markdown_lab_ray.stages.analytics import pareto_crossings

    # spends: 50, 30, 15, 5 (totals in dollars -> cents below)
    t = pa.table({"o_custkey": pa.array([1, 2, 3, 4], pa.int64()),
                  "o_totalprice": pa.array([50.0, 30.0, 15.0, 5.0])})
    got = (pareto_crossings(rd.from_arrow(t), "o_custkey", "o_totalprice")
           .to_pandas().sort_values("pct").reset_index(drop=True))
    # cum%: 50, 80, 95, 100
    assert dict(zip(got["pct"], got["n_keys"])) == {
        50: 1, 80: 2, 90: 3, 95: 3}


def test_pareto_crossings_matches_naive(ray_session):
    from markdown_lab_ray.stages.analytics import pareto_crossings

    rng = np.random.RandomState(11)
    keys = np.arange(200, dtype=np.int64)
    vals = rng.randint(1, 100_000, size=200) / 100.0
    t = pa.table({"o_custkey": pa.array(keys),
                  "o_totalprice": pa.array(vals, pa.float64())})
    ds = rd.from_arrow(t).repartition(8)
    got = (pareto_crossings(ds, "o_custkey", "o_totalprice")
           .to_pandas().sort_values("pct").reset_index(drop=True))

    cents = [int(math.floor(v * 100 + 0.5)) for v in vals]
    order = sorted(zip(cents, keys), key=lambda kv: (-kv[0], kv[1]))
    total = sum(cents)
    want = {}
    for p in (50, 80, 90, 95):
        cum = 0
        for i, (c, _k) in enumerate(order, start=1):
            cum += c
            if cum * 100 >= total * p:
                want[p] = i
                break
    assert dict(zip(got["pct"], got["n_keys"])) == want


# ---------------------------------------------------------------------------
# source_fairness / daily_cusum / grouped_kendall_tau
# ---------------------------------------------------------------------------

def test_source_fairness_even_and_skewed(ray_session):
    from markdown_lab_ray.stages.analytics import source_fairness

    def docs(counts):
        src = [f"s{i}" for i, c in enumerate(counts) for _ in range(c)]
        return rd.from_arrow(pa.table({"source": pa.array(src)}))

    even = source_fairness(docs([10, 10, 10, 10])).to_pandas()
    assert even.loc[0, "n_cats"] == 4
    assert even.loc[0, "jain_micro"] == 1_000_000

    skew = source_fairness(docs([97, 1, 1, 1])).to_pandas()
    # J = 100^2 / (4 * (9409+3)) = 10000/37648
    want = int(math.floor(1e6 * 10000.0 / 37648.0 + 0.5))
    assert skew.loc[0, "jain_micro"] == want


def test_daily_cusum_closed_form_equals_recurrence(ray_session):
    from markdown_lab_ray.stages.analytics import daily_cusum

    rng = np.random.RandomState(2)
    s = [int(rng.randint(100, 10_000)) for _ in range(25)]
    got = (daily_cusum(_one_event_per_day(s)).to_pandas()
           .sort_values("day_id").reset_index(drop=True))
    mu = sum(s) // len(s)
    cur, want = 0, []
    for d in s:
        cur = max(0, cur + d - mu)
        want.append(cur)
    assert list(got["cusum_cents"]) == want


def test_kendall_tau_perfect_and_inverted(ray_session):
    from markdown_lab_ray.stages.analytics import grouped_kendall_tau

    # user u has u+1 events of 1.00 each -> spend and count perfectly
    # concordant -> tau = +1
    rows = [(u * 10 + j, u, (u * 10 + j) * 1_000, "x", 1.0)
            for u in range(5) for j in range(u + 1)]
    got = grouped_kendall_tau(_events(rows), "user_id").to_pandas()
    assert got.loc[0, "n_keys"] == 5
    assert got.loc[0, "tau_micro"] == 1_000_000

    # more events but proportionally LESS total spend -> tau = -1
    rows = [(u * 10 + j, u, (u * 10 + j) * 1_000, "x",
             (5 - u) ** 2 / (u + 1) * 1.0)
            for u in range(5) for j in range(u + 1)]
    got = grouped_kendall_tau(_events(rows), "user_id").to_pandas()
    assert got.loc[0, "tau_micro"] == -1_000_000


def test_kendall_tau_matches_scipy_free_naive(ray_session):
    from markdown_lab_ray.stages.analytics import grouped_kendall_tau

    rng = np.random.RandomState(9)
    rows = [(i, int(rng.randint(0, 20)), int(rng.randint(0, 10 ** 9)),
             "x", float(rng.randint(1, 500)) / 100.0)
            for i in range(600)]
    got = grouped_kendall_tau(_events(rows), "user_id").to_pandas()

    agg = {}
    for _i, u, _ts, _t, v in rows:
        c = int(math.floor(v * 100 + 0.5))
        s, n = agg.get(u, (0, 0))
        agg[u] = (s + c, n + 1)
    xs = [v[0] for v in agg.values()]
    ys = [v[1] for v in agg.values()]
    nc = nd = tx = ty = 0
    k = len(xs)
    for i in range(k):
        for j in range(i + 1, k):
            dx = (xs[i] > xs[j]) - (xs[i] < xs[j])
            dy = (ys[i] > ys[j]) - (ys[i] < ys[j])
            if dx * dy > 0:
                nc += 1
            elif dx * dy < 0:
                nd += 1
            if dx == 0:
                tx += 1
            if dy == 0:
                ty += 1
    n0 = k * (k - 1) // 2
    want = int(math.floor(
        1e6 * float(nc - nd)
        / math.sqrt(float(n0 - tx) * float(n0 - ty)) + 0.5))
    assert got.loc[0, "tau_micro"] == want


# ---------------------------------------------------------------------------
# group_split / class_weights
# ---------------------------------------------------------------------------

def test_group_split_no_leakage(ray_session):
    import hashlib

    from markdown_lab_ray.stages.trainprep import group_split_batch

    t = pa.table({"user_id": pa.array(list(range(50)) * 4, pa.int64())})
    tagged = (rd.from_arrow(t).repartition(8)
              .map_batches(group_split_batch, batch_format="pyarrow",
                           fn_kwargs=dict(key_col="user_id"))
              .to_pandas())
    # every user maps to exactly one split, and it is the md5 rule
    per_user = tagged.groupby("user_id")["split"].nunique()
    assert (per_user == 1).all()
    for u, s in tagged.drop_duplicates("user_id").itertuples(index=False):
        h = hashlib.md5(str(u).encode()).hexdigest()[:8]
        want = ("train" if h < "cccccccc"
                else "val" if h < "e6666666" else "test")
        assert s == want


def test_group_split_summary_counts(ray_session):
    from markdown_lab_ray.stages.trainprep import group_split_summary

    t = pa.table({"user_id": pa.array([1, 1, 1, 2, 2, 3], pa.int64()),
                  "event_id": pa.array(range(6), pa.int64())})
    got = (group_split_summary(rd.from_arrow(t), "user_id").to_pandas()
           .sort_values("split"))
    assert int(got["n_keys"].sum()) == 3
    assert int(got["n_rows"].sum()) == 6


def test_class_weights_balanced_and_skewed(ray_session):
    from markdown_lab_ray.stages.trainprep import class_weights

    def labels(counts):
        vals = [f"c{i}" for i, c in enumerate(counts) for _ in range(c)]
        return rd.from_arrow(pa.table({"label": pa.array(vals)}))

    bal = class_weights(labels([5, 5, 5])).to_pandas()
    assert (bal["weight_micro"] == 1_000_000).all()

    skew = class_weights(labels([8, 1, 1])).to_pandas().sort_values(
        "label").reset_index(drop=True)
    # N=10, K=3: w = 10/(3*8), 10/3, 10/3
    assert skew.loc[0, "weight_micro"] == int(
        math.floor(1e6 * 10 / 24 + 0.5))
    assert skew.loc[1, "weight_micro"] == int(
        math.floor(1e6 * 10 / 3 + 0.5))


def test_kendall_knight_path_equals_sign_matrix():
    from markdown_lab_ray.stages.analytics import kendall_pair_counts

    rng = np.random.RandomState(21)
    for k in (2, 3, 7, 100, 513, 1500):
        x = rng.randint(0, max(2, k // 5), size=k).astype(np.int64)
        y = rng.randint(0, max(2, k // 9), size=k).astype(np.int64)
        assert (kendall_pair_counts(x, y, small_cutoff=1)
                == kendall_pair_counts(x, y, small_cutoff=10 ** 9))
    # all-x-tied and perfectly sorted edges
    x = np.zeros(64, np.int64)
    y = np.arange(64, dtype=np.int64)
    assert (kendall_pair_counts(x, y, small_cutoff=1)
            == kendall_pair_counts(x, y, small_cutoff=10 ** 9))
    assert (kendall_pair_counts(y, y, small_cutoff=1)
            == kendall_pair_counts(y, y, small_cutoff=10 ** 9))

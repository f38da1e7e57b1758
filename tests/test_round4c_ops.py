"""Round-4c additions: date-spine fill, dwell-time attribution,
Benford digits, MAD outlier gate, degree histogram, reciprocity,
debounce, hapax rate — edge cases the DuckDB oracles don't reach."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd


def _events_table():
    # two users, ts ties, one single-event user
    ts = pa.array(
        np.array([0, 60, 60, 360, 1_000], dtype="int64") * 1_000_000
    ).cast(pa.timestamp("us"))
    return pa.table({
        "event_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "ts": ts,
        "user_id": pa.array([7, 7, 7, 7, 9], pa.int64()),
        "event_type": pa.array(["a", "b", "a", "c", "a"]),
    })


# ---------------------------------------------------------------------------
# date_spine_fill
# ---------------------------------------------------------------------------

def test_date_spine_fills_gaps_and_single_day(ray_session):
    from markdown_lab_ray.stages.analytics import date_spine_fill

    day_us = 86_400_000_000
    t = pa.table({
        "d": pa.array(np.array([0, 3 * day_us, 3 * day_us + 5]),
                      pa.int64()).cast(pa.timestamp("us")),
        "v": pa.array([1.0, 2.0, 3.0]),
    })
    out = (date_spine_fill(rd.from_arrow(t), "d", "v")
           .to_pandas().sort_values("day_id").reset_index(drop=True))
    # 1970-01-01 .. 1970-01-04: four dense rows, two zero-filled
    assert out["day_id"].tolist() == [19700101, 19700102,
                                      19700103, 19700104]
    assert out["revenue_cents"].tolist() == [100, 0, 0, 500]

    one = pa.table({"d": t.column("d").slice(0, 1), "v": pa.array([9.5])})
    res = date_spine_fill(rd.from_arrow(one), "d", "v").to_pandas()
    assert res["day_id"].tolist() == [19700101]
    assert res["revenue_cents"].tolist() == [950]


# ---------------------------------------------------------------------------
# state_dwell_time
# ---------------------------------------------------------------------------

def test_state_dwell_attributes_gap_to_earlier_event(ray_session):
    from markdown_lab_ray.stages.analytics import state_dwell_time

    out = (state_dwell_time(rd.from_arrow(_events_table()))
           .to_pandas().set_index("event_type"))
    # user 7 ordered (ts, id): e1(a,0) e2(b,60) e3(a,60) e4(c,360)
    # gaps: a->b 60s attributed to a; b->a 0s to b; a->c 300s to a
    # user 9 has no successor
    assert out.loc["a", "dwell_us"] == (60 + 300) * 1_000_000
    assert out.loc["a", "n_gaps"] == 2
    assert out.loc["b", "dwell_us"] == 0
    assert out.loc["b", "n_gaps"] == 1
    assert "c" not in out.index  # last event of its user: no gap


# ---------------------------------------------------------------------------
# benford_first_digit
# ---------------------------------------------------------------------------

def test_benford_string_digit_no_log_edge(ray_session):
    from markdown_lab_ray.stages.analytics import benford_first_digit

    # 10.00 -> cents 1000 (digit 1, exact power of ten), 0 dropped
    t = pa.table({"v": pa.array([10.0, 0.0, 9.99, 95.5, 1.01])})
    out = (benford_first_digit(rd.from_arrow(t), "v")
           .to_pandas().set_index("digit")["n"])
    assert out.to_dict() == {1: 2, 9: 2}


# ---------------------------------------------------------------------------
# mad_outliers
# ---------------------------------------------------------------------------

def test_mad_outliers_gate_and_zero_mad_key(ray_session):
    from markdown_lab_ray.stages.analytics import mad_outliers

    t = pa.table({
        "id": pa.array(list(range(8)), pa.int64()),
        "k": pa.array(["x"] * 5 + ["flat"] * 3),
        "v": pa.array([1.0, 1.1, 0.9, 1.0, 100.0, 5.0, 5.0, 5.0]),
    })
    out = (mad_outliers(rd.from_arrow(t), "k", "v", "id")
           .to_pandas().sort_values("id"))
    # key x: median 1.0, MAD 0.1 -> only 100.0 flagged
    # key flat: MAD 0 -> emits nothing even though all values "equal"
    assert out["id"].tolist() == [4]
    assert out["k"].tolist() == ["x"]


# ---------------------------------------------------------------------------
# degree_histogram
# ---------------------------------------------------------------------------

def test_degree_histogram_dedups_pairs_across_blocks(ray_session):
    from markdown_lab_ray.stages.graph import degree_histogram

    # node 1 sees neighbor 10 twice (dup pair), node 2 has two neighbors
    t = pa.table({
        "n": pa.array([1, 1, 1, 2, 2], pa.int64()),
        "m": pa.array([10, 10, 11, 10, 12], pa.int64()),
    })
    ds = rd.from_arrow(t).repartition(3)  # dup pair split across blocks
    out = (degree_histogram(ds, "n", "m")
           .to_pandas().set_index("degree")["n_nodes"])
    assert out.to_dict() == {2: 2}


# ---------------------------------------------------------------------------
# edge_reciprocity
# ---------------------------------------------------------------------------

def test_edge_reciprocity_counts_and_ignores_loops(ray_session):
    from markdown_lab_ray.stages.graph import edge_reciprocity

    edges = pa.table({
        "from_type": pa.array(["a", "b", "a", "c", "c"]),
        "to_type": pa.array(["b", "a", "c", "c", "d"]),
    })
    out = edge_reciprocity(rd.from_arrow(edges)).to_pandas().iloc[0]
    # distinct non-loop edges: a->b, b->a, a->c, c->d  (c->c dropped)
    assert out["n_edges"] == 4
    assert out["n_reciprocal"] == 2
    assert out["reciprocity"] == 0.5


# ---------------------------------------------------------------------------
# debounce_keep_first
# ---------------------------------------------------------------------------

def test_debounce_keeps_min_ts_id_per_window_across_blocks(ray_session):
    from markdown_lab_ray.stages.windows import debounce_keep_first

    # events 1-3 in the same 5-min window (ties on ts: id wins),
    # event 4 in the next window, user 9 independent
    ds = rd.from_arrow(_events_table()).repartition(4)
    out = (debounce_keep_first(ds).to_pandas()
           .sort_values("event_id"))
    assert out["event_id"].tolist() == [1, 4, 5]


def test_debounce_per_batch_combiner_matches_single_block(ray_session):
    from markdown_lab_ray.stages.windows import debounce_keep_first

    rng = np.random.RandomState(3)
    n = 500
    t = pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(rng.randint(0, 3_600_000_000, n)
                       .astype("int64")).cast(pa.timestamp("us")),
        "user_id": pa.array(rng.randint(0, 20, n).astype("int64")),
        "event_type": pa.array(["e"] * n),
    })
    a = (debounce_keep_first(rd.from_arrow(t)).to_pandas()
         .sort_values("event_id").reset_index(drop=True))
    b = (debounce_keep_first(rd.from_arrow(t).repartition(7)).to_pandas()
         .sort_values("event_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)


# ---------------------------------------------------------------------------
# hapax_stats
# ---------------------------------------------------------------------------

def test_hapax_rate_counts_global_singletons(ray_session):
    from markdown_lab_ray.stages.text import hapax_stats

    docs = pa.table({
        "lang": pa.array(["en", "en", "fr", "fr"]),
        "text": pa.array(["the cat sat", "the dog", "le chat", "  "]),
    })
    # en: the(2) cat(1) sat(1) dog(1) -> 4 terms, 3 hapax
    # fr: le(1) chat(1) -> 2 terms, 2 hapax (blank doc contributes none)
    out = (hapax_stats(rd.from_arrow(docs).repartition(3))
           .to_pandas().set_index("lang"))
    assert out.loc["en", "n_terms"] == 4
    assert out.loc["en", "n_hapax"] == 3
    assert out.loc["en", "hapax_micro"] == 750000
    assert out.loc["fr", "n_terms"] == 2
    assert out.loc["fr", "hapax_micro"] == 1000000

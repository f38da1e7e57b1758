"""Round-4 additions: weighted reservoir sampling (A-ES), per-group
HLL, and the audio multimodal plumbing."""

import numpy as np
import pyarrow as pa
import pytest


# ---------------------------------------------------------------------------
# weighted_sample_per_key (Efraimidis–Spirakis A-ES)
# ---------------------------------------------------------------------------

def _docs_table(n=400, n_keys=4):
    rng = np.random.RandomState(7)
    return pa.table({
        "source": pa.array([f"s{i % n_keys}" for i in range(n)]),
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "n_chars": pa.array(rng.randint(1, 5000, n).astype(np.int64)),
    })


def _local_aes_topk(table: pa.Table, k: int):
    """Single-process oracle: exact A-ES top-k per key."""
    import hashlib

    rows = table.to_pylist()
    pri = {}
    for r in rows:
        u = int(hashlib.md5(str(r["doc_id"]).encode()).hexdigest()[:8],
                16) / 2 ** 32
        pri[r["doc_id"]] = u ** (1.0 / r["n_chars"])
    out = {}
    for r in rows:
        out.setdefault(r["source"], []).append(r)
    picked = []
    for src, grp in out.items():
        grp.sort(key=lambda r: (-pri[r["doc_id"]], r["doc_id"]))
        picked.extend(grp[:k])
    return sorted((r["source"], r["doc_id"]) for r in picked)


def test_weighted_sample_matches_local_oracle(ray_session):
    import ray.data as rd

    from markdown_lab_ray.stages.sample import weighted_sample_per_key

    table = _docs_table()
    ds = rd.from_arrow(table).repartition(6)
    got = weighted_sample_per_key(ds, "source", "doc_id", "n_chars",
                                  k=5).take_all()
    assert sorted((r["source"], r["doc_id"]) for r in got) == \
        _local_aes_topk(table, 5)


def test_weighted_sample_layout_invariant(ray_session):
    """Block layout must not change the sample (priorities derive from
    ids, and the per-batch prune is a true combiner)."""
    import ray.data as rd

    from markdown_lab_ray.stages.sample import weighted_sample_per_key

    table = _docs_table(n=300, n_keys=3)
    picks = []
    for parts in (1, 4, 11):
        ds = rd.from_arrow(table).repartition(parts)
        got = weighted_sample_per_key(ds, "source", "doc_id",
                                      "n_chars", k=7).take_all()
        picks.append(sorted((r["source"], r["doc_id"]) for r in got))
    assert picks[0] == picks[1] == picks[2]


def test_weighted_sample_matches_duckdb_window(ray_session):
    """The documented SQL replication: pow(md5-hex-u, 1/w) window rank."""
    import duckdb
    import ray.data as rd

    from markdown_lab_ray.stages.sample import weighted_sample_per_key

    table = _docs_table(n=250, n_keys=5)
    con = duckdb.connect()
    con.register("documents", table)
    want = con.sql("""
        SELECT source, doc_id FROM (
          SELECT source, doc_id, row_number() OVER (
            PARTITION BY source
            ORDER BY pow(
              CAST(CAST(CONCAT('0x', substr(md5(CAST(doc_id AS VARCHAR)),
                                      1, 8)) AS BIGINT) AS DOUBLE)
              / 4294967296.0, 1.0 / n_chars) DESC, doc_id) AS rn
          FROM documents) WHERE rn <= 4
        ORDER BY source, doc_id
    """).fetchall()
    got = weighted_sample_per_key(rd.from_arrow(table).repartition(3),
                                  "source", "doc_id", "n_chars",
                                  k=4).take_all()
    assert sorted((r["source"], r["doc_id"]) for r in got) == \
        [tuple(w) for w in want]


def test_weighted_sample_favors_heavy_rows(ray_session):
    """Statistical sanity: with weights 1 vs 1000, the heavy half must
    dominate the sample."""
    import ray.data as rd

    from markdown_lab_ray.stages.sample import weighted_sample_per_key

    n = 600
    table = pa.table({
        "source": pa.array(["s"] * n),
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "n_chars": pa.array([1000 if i < n // 2 else 1
                             for i in range(n)], pa.int64()),
    })
    got = weighted_sample_per_key(rd.from_arrow(table), "source",
                                  "doc_id", "n_chars", k=50).take_all()
    heavy = sum(1 for r in got if r["doc_id"] < n // 2)
    assert heavy >= 45  # ~P[light picked] ≈ w_l/w_h per slot


def test_weighted_sample_rejects_bad_args(ray_session):
    import ray.data as rd

    from markdown_lab_ray.stages.sample import weighted_sample_per_key

    table = pa.table({"source": ["a"], "doc_id": [1], "n_chars": [0]})
    with pytest.raises(ValueError):
        weighted_sample_per_key(rd.from_arrow(table), "source",
                                "doc_id", "n_chars", k=0)
    ds = weighted_sample_per_key(rd.from_arrow(table), "source",
                                 "doc_id", "n_chars", k=1)
    with pytest.raises(Exception):  # surfaces the weights>0 ValueError
        ds.take_all()


# ---------------------------------------------------------------------------
# hll_distinct_per_group
# ---------------------------------------------------------------------------

def test_hll_per_group_within_error(ray_session):
    import ray.data as rd

    from markdown_lab_ray.stages.sketch import hll_distinct_per_group

    rng = np.random.RandomState(11)
    n = 6000
    keys = [f"t{i % 3}" for i in range(n)]
    vals = [int(v) for v in rng.randint(0, 900, n)]
    exact = {}
    for k, v in zip(keys, vals):
        exact.setdefault(k, set()).add(v)
    ds = rd.from_arrow(pa.table({"event_type": keys, "user_id": vals}))
    got = hll_distinct_per_group(ds.repartition(5), "event_type",
                                 "user_id", p=12).take_all()
    assert len(got) == 3
    for r in got:
        truth = len(exact[r["event_type"]])
        assert abs(r["n_distinct_approx"] - truth) / truth <= 0.05


def test_hll_per_group_layout_invariant(ray_session):
    """Max-merge is associative+commutative: repartition must not
    change any estimate."""
    import ray.data as rd

    from markdown_lab_ray.stages.sketch import hll_distinct_per_group

    n = 2000
    table = pa.table({
        "event_type": [f"t{i % 4}" for i in range(n)],
        "user_id": [i % 37 for i in range(n)],
    })
    outs = []
    for parts in (1, 7):
        got = hll_distinct_per_group(
            rd.from_arrow(table).repartition(parts), "event_type",
            "user_id", p=10).take_all()
        outs.append(sorted((r["event_type"], r["n_distinct_approx"])
                           for r in got))
    assert outs[0] == outs[1]


# ---------------------------------------------------------------------------
# audio plumbing
# ---------------------------------------------------------------------------

def test_audio_codec_roundtrip_exact_and_lossy():
    from markdown_lab_ray.stages.audio import (
        fake_audio_decode,
        fake_audio_encode,
        snr_db,
        synth_waveform,
    )

    wave = synth_waveform("aud-x", 16000, 16000)
    exact, sr, fmt = fake_audio_decode(fake_audio_encode(wave, 16000,
                                                         "pcm16"))
    assert sr == 16000 and fmt == "pcm16"
    assert np.array_equal(exact, wave)
    lossy, _, fmt2 = fake_audio_decode(fake_audio_encode(wave, 16000,
                                                         "lossy"))
    assert fmt2 == "lossy"
    assert not np.array_equal(lossy, wave)
    assert snr_db(wave, lossy) >= 35.0


def test_audio_features_match_numpy():
    from markdown_lab_ray.stages.audio import audio_features

    sr = 8000
    t = np.arange(sr, dtype=np.float64) / sr
    wave = np.clip(np.sin(2 * np.pi * 5 * t) * 32767, -32768,
                   32767).astype(np.int16)
    f = audio_features(wave, sr)
    assert f["duration_s"] == pytest.approx(1.0)
    # RMS of a full-scale sine ≈ 1/sqrt(2)
    assert f["rms"] == pytest.approx(1 / np.sqrt(2), rel=0.01)
    # 5 Hz over [0, 1): crossings at t=0.1..0.9 → exactly 9 sign flips
    assert f["zero_cross_rate"] == pytest.approx(9 / (sr - 1))


def test_audio_feature_stage_and_error_rows(ray_session):
    import ray.data as rd

    from markdown_lab_ray.stages.audio import AudioFeatures, build_audio_rows

    table = build_audio_rows(n=16)
    bad = pa.table({
        "audio_id": pa.array(["broken"]),
        "bytes": pa.array([b"not audio"], pa.binary()),
        "sr": pa.array([0], pa.int32()),
        "n_samples": pa.array([0], pa.int32()),
        "fmt": pa.array(["pcm16"]),
        "transcript": pa.array(["x"]),
    })
    ds = rd.from_arrow(pa.concat_tables([table, bad]))
    out = ds.map_batches(AudioFeatures, concurrency=2,
                         batch_size=8,
                         batch_format="pyarrow").take_all()
    assert len(out) == 17
    by_id = {r["audio_id"]: r for r in out}
    assert by_id["broken"]["decode_ok"] is False
    good = [r for r in out if r["decode_ok"]]
    assert len(good) == 16
    assert all(r["rms"] > 0 and r["duration_s"] > 0 for r in good)
    # duration must equal n_samples / sr from the source table
    src = {r["audio_id"]: r for r in table.to_pylist()}
    for r in good:
        assert r["duration_s"] == pytest.approx(
            src[r["audio_id"]]["n_samples"] / src[r["audio_id"]]["sr"])


def test_clip_sample_explodes_and_is_deterministic(ray_session):
    import ray.data as rd

    from markdown_lab_ray.stages.audio import (
        ClipSample,
        build_audio_rows,
        fake_audio_decode,
    )

    table = build_audio_rows(n=6)
    ds = rd.from_arrow(table)
    out = ds.map_batches(ClipSample(k=3, clip_s=0.25), concurrency=2,
                         batch_format="pyarrow").take_all()
    assert all(r["decode_ok"] for r in out)
    per = {}
    for r in out:
        per.setdefault(r["audio_id"], []).append(r)
    assert all(len(v) == 3 for v in per.values())
    # clips decode and are bounded to clip_s
    for r in out:
        samples, sr, _ = fake_audio_decode(r["clip"])
        assert len(samples) <= int(round(0.25 * sr))
    out2 = ds.map_batches(ClipSample(k=3, clip_s=0.25),
                          batch_format="pyarrow").take_all()
    key = lambda r: (r["audio_id"], r["clip_idx"])  # noqa: E731
    assert sorted((key(r), r["rms"]) for r in out) == \
        sorted((key(r), r["rms"]) for r in out2)


# ---------------------------------------------------------------------------
# weighted_sample_global (corpus-level A-ES)
# ---------------------------------------------------------------------------

def test_weighted_sample_global_matches_local(ray_session):
    import ray.data as rd

    from markdown_lab_ray.stages.sample import weighted_sample_global

    table = _docs_table()
    got = weighted_sample_global(rd.from_arrow(table).repartition(7),
                                 "doc_id", "n_chars", k=9)
    # local oracle: exact A-ES top-9 over the whole table
    import hashlib
    rows = table.to_pylist()
    pri = {r["doc_id"]: (int(hashlib.md5(str(r["doc_id"]).encode())
                             .hexdigest()[:8], 16) / 2 ** 32)
           ** (1.0 / r["n_chars"]) for r in rows}
    want = sorted(rows, key=lambda r: (-pri[r["doc_id"]], r["doc_id"]))[:9]
    assert sorted(got["doc_id"]) == sorted(r["doc_id"] for r in want)


def test_weighted_sample_global_layout_invariant(ray_session):
    import ray.data as rd

    from markdown_lab_ray.stages.sample import weighted_sample_global

    table = _docs_table(200)
    a = weighted_sample_global(rd.from_arrow(table).repartition(1),
                               "doc_id", "n_chars", k=5)
    b = weighted_sample_global(rd.from_arrow(table).repartition(13),
                               "doc_id", "n_chars", k=5)
    assert sorted(a["doc_id"]) == sorted(b["doc_id"])


def test_weighted_sample_global_rejects_bad_k(ray_session):
    import ray.data as rd

    from markdown_lab_ray.stages.sample import weighted_sample_global

    with pytest.raises(ValueError, match="k must be positive"):
        weighted_sample_global(rd.from_items([{"doc_id": 1,
                                               "n_chars": 2}]),
                               "doc_id", "n_chars", k=0)


# ---------------------------------------------------------------------------
# set_op_distinct (INTERSECT / EXCEPT)
# ---------------------------------------------------------------------------

def _set_op_sides():
    import ray.data as rd
    a = pa.table({"k": pa.array([1, 2, 2, 3, 5, 7, None], pa.int64())})
    b = pa.table({"k": pa.array([2, 3, 3, 4, 8, None], pa.int64())})
    return (rd.from_arrow(a).repartition(3),
            rd.from_arrow(b).repartition(2))


def test_set_op_intersect_matches_sql_semantics(ray_session):
    from markdown_lab_ray.stages.joins import set_op_distinct

    a, b = _set_op_sides()
    got = sorted(set_op_distinct(a, b, "k", "intersect")
                 .to_pandas()["k"].tolist())
    assert got == [2, 3]  # distinct; NULL keys excluded per the
    # documented contract (SQL INTERSECT would keep a NULL row here)


def test_set_op_except_matches_sql_semantics(ray_session):
    from markdown_lab_ray.stages.joins import set_op_distinct

    a, b = _set_op_sides()
    got = sorted(set_op_distinct(a, b, "k", "except")
                 .to_pandas()["k"].tolist())
    assert got == [1, 5, 7]


def test_set_op_rejects_unknown_op(ray_session):
    from markdown_lab_ray.stages.joins import set_op_distinct

    a, b = _set_op_sides()
    with pytest.raises(ValueError, match="intersect"):
        set_op_distinct(a, b, "k", "union")


def test_set_op_string_keys_and_empty_result(ray_session):
    import ray.data as rd

    from markdown_lab_ray.stages.joins import set_op_distinct

    a = rd.from_arrow(pa.table({"k": pa.array(["x", "y"])}))
    b = rd.from_arrow(pa.table({"k": pa.array(["x", "y", "z"])}))
    out = set_op_distinct(a, b, "k", "except")
    assert out.count() == 0
    assert out.schema().names == ["k"]


# ---------------------------------------------------------------------------
# funnel_steps (ordered first-touch funnel)
# ---------------------------------------------------------------------------

def _events_table(rows):
    import pandas as pd
    return pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([pd.Timestamp(r[1]) for r in rows],
                       pa.timestamp("us")),
        "event_type": pa.array([r[2] for r in rows], pa.string()),
    })


def test_funnel_order_and_ties(ray_session):
    import ray.data as rd

    from markdown_lab_ray.stages.analytics import funnel_steps

    rows = [
        # u1 completes all three in order
        (1, "2024-01-01 00:00", "view"),
        (1, "2024-01-01 00:01", "click"),
        (1, "2024-01-01 00:02", "purchase"),
        # u2 clicks BEFORE its first view → click doesn't count; no
        # click after the view → stops at 1
        (2, "2024-01-01 00:00", "click"),
        (2, "2024-01-01 00:01", "view"),
        (2, "2024-01-01 00:02", "purchase"),
        # u3: click at the SAME instant as first view → strictly-after
        # rule rejects it; a later click then a purchase → 3
        (3, "2024-01-01 00:00", "view"),
        (3, "2024-01-01 00:00", "click"),
        (3, "2024-01-01 00:05", "click"),
        (3, "2024-01-01 00:06", "purchase"),
        # u4 has only funnel-irrelevant position: purchase first → 0
        # steps (view never occurs)
        (4, "2024-01-01 00:00", "purchase"),
    ]
    ds = rd.from_arrow(_events_table(rows)).repartition(4)
    out = (funnel_steps(ds, ["view", "click", "purchase"]).to_pandas()
           .sort_values("user_id").reset_index(drop=True))
    assert out["user_id"].tolist() == [1, 2, 3, 4]
    assert out["steps_completed"].tolist() == [3, 1, 3, 0]


def test_funnel_rejects_empty_steps(ray_session):
    import ray.data as rd

    from markdown_lab_ray.stages.analytics import funnel_steps

    ds = rd.from_arrow(_events_table([(1, "2024-01-01", "view")]))
    with pytest.raises(ValueError, match="non-empty"):
        funnel_steps(ds, [])


# ---------------------------------------------------------------------------
# event_transitions / conversion_lag / retention_cohorts
# ---------------------------------------------------------------------------

def test_event_transitions_counts_and_tiebreak(ray_session):
    import pandas as pd
    import ray.data as rd

    from markdown_lab_ray.stages.analytics import event_transitions

    rows = pd.DataFrame({
        "user_id": [1, 1, 1, 2, 2, 3],
        # u1: a(t0,id0) -> b(t1) -> a(t2); u2 has a TIE on ts broken by
        # event_id: (b,id4) precedes (c,id5); u3 has a single event (no
        # pair emitted)
        "ts": pd.to_datetime(["2024-01-01 00:00", "2024-01-01 00:01",
                              "2024-01-01 00:02", "2024-01-01 00:00",
                              "2024-01-01 00:00", "2024-01-01 00:00"]),
        "event_id": [0, 1, 2, 4, 5, 6],
        "event_type": ["a", "b", "a", "b", "c", "a"],
    })
    out = (event_transitions(rd.from_pandas(rows).repartition(3))
           .to_pandas().sort_values(["from_type", "to_type"])
           .reset_index(drop=True))
    got = {(r.from_type, r.to_type): r.n for r in out.itertuples()}
    assert got == {("a", "b"): 1, ("b", "a"): 1, ("b", "c"): 1}
    assert out["n"].dtype == "int64"


def test_conversion_lag_strictly_after(ray_session):
    import pandas as pd
    import ray.data as rd

    from markdown_lab_ray.stages.analytics import conversion_lag

    rows = pd.DataFrame({
        "user_id": [1, 1, 2, 2, 3, 4, 4],
        "ts": pd.to_datetime([
            "2024-01-01 00:00", "2024-01-01 00:10",   # u1 converts, 600s
            "2024-01-01 00:05", "2024-01-01 00:05",   # u2 purchase AT tv
            "2024-01-01 00:00",                        # u3 view only
            "2024-01-01 00:02", "2024-01-01 00:01",   # u4 purchase BEFORE view
        ]),
        "event_type": ["view", "purchase", "view", "purchase", "view",
                       "view", "purchase"],
    })
    out = (conversion_lag(rd.from_pandas(rows).repartition(3))
           .to_pandas().sort_values("user_id").reset_index(drop=True))
    assert out["user_id"].tolist() == [1]
    assert out["lag_us"].tolist() == [600 * 1_000_000]


def test_monday_week_trunc_matches_duckdb():
    import duckdb
    import numpy as np
    import pandas as pd

    from markdown_lab_ray.stages.analytics import _monday_week_us

    rng = np.random.RandomState(7)
    ts = pd.to_datetime("2023-12-25") + pd.to_timedelta(
        rng.randint(0, 120 * 24 * 3600, size=500), unit="s")
    got = pd.Series(_monday_week_us(ts.values).astype("datetime64[us]"))
    want = duckdb.connect().execute(
        "SELECT CAST(date_trunc('week', ts) AS TIMESTAMP) AS wk "
        "FROM (SELECT unnest(?::TIMESTAMP[]) AS ts)",
        [list(ts)]).df()["wk"]
    assert (got.to_numpy() == want.to_numpy()).all()


def test_retention_cohorts_small(ray_session):
    import pandas as pd
    import ray.data as rd

    from markdown_lab_ray.stages.analytics import retention_cohorts

    # week0 starts Mon 2024-01-01; u1 active wk0+wk1, u2 wk0 only,
    # u3 cohort wk1 active wk1+wk3; duplicate events in a week count once
    rows = pd.DataFrame({
        "user_id": [1, 1, 1, 2, 3, 3],
        "ts": pd.to_datetime([
            "2024-01-03", "2024-01-03 12:00", "2024-01-09",
            "2024-01-01",
            "2024-01-08", "2024-01-24",
        ], format="mixed"),
    })
    out = (retention_cohorts(rd.from_pandas(rows).repartition(3))
           .to_pandas().sort_values(["cohort_week", "week_offset"])
           .reset_index(drop=True))
    wk0, wk1 = pd.Timestamp("2024-01-01"), pd.Timestamp("2024-01-08")
    got = {(r.cohort_week, r.week_offset): r.n_users
           for r in out.itertuples()}
    assert got == {(wk0, 0): 2, (wk0, 1): 1, (wk1, 0): 1, (wk1, 2): 1}
    assert out["n_users"].dtype == "int64"


def test_profile_columns_nulls_and_distinct(ray_session):
    import pandas as pd
    import ray.data as rd

    from markdown_lab_ray.stages.analytics import profile_columns

    rows = pd.DataFrame({
        "a": [1.0, 1.0, None, 2.0, None, 3.0],
        "b": ["x", "x", "x", None, "y", "z"],
    })
    out = profile_columns(rd.from_pandas(rows).repartition(3), ["a", "b"])
    got = {r.col_name: (r.n_rows, r.n_null, r.n_distinct)
           for r in out.itertuples()}
    assert got == {"a": (6, 2, 3), "b": (6, 1, 3)}
    assert list(out.columns) == ["col_name", "n_rows", "n_null",
                                 "n_distinct"]

    with pytest.raises(ValueError, match="non-empty"):
        profile_columns(rd.from_pandas(rows), [])


def test_profile_columns_all_null_column(ray_session):
    import pandas as pd
    import ray.data as rd

    from markdown_lab_ray.stages.analytics import profile_columns

    rows = pd.DataFrame({"a": [None, None], "b": [1, 2]})
    out = profile_columns(rd.from_pandas(rows), ["a", "b"])
    got = {r.col_name: (r.n_rows, r.n_null, r.n_distinct)
           for r in out.itertuples()}
    assert got == {"a": (2, 2, 0), "b": (2, 0, 2)}


# ---------------------------------------------------------------------------
# edit1_similar_pairs (PassJoin lev<=1 similarity self-join)
# ---------------------------------------------------------------------------

def test_edit1_pairs_matches_duckdb_levenshtein(ray_session):
    import duckdb
    import ray.data as rd

    from markdown_lab_ray.stages.dedup import edit1_similar_pairs

    names = ([f"user#{i:04d}" for i in range(60)]          # dense 1-digit edits
             + ["abcdef", "abcxef", "abxxef",              # dist 1 and 2
                "zbcdef", "abcdex",
                "short", "shore", "sport",
                "lengthy-name-a", "lengthy-name-b",
                "different-len", "unpaired"])
    table = pa.table({"c_name": pa.array(names, pa.string())})
    got = (edit1_similar_pairs(rd.from_arrow(table).repartition(5))
           .to_pandas().sort_values(["name_a", "name_b"])
           .reset_index(drop=True))
    want = duckdb.connect().execute("""
        SELECT DISTINCT a.n AS name_a, b.n AS name_b
        FROM (SELECT unnest(?::VARCHAR[]) AS n) a
        JOIN (SELECT unnest(?::VARCHAR[]) AS n) b
          ON length(a.n) = length(b.n) AND a.n < b.n
         AND levenshtein(a.n, b.n) <= 1
        ORDER BY 1, 2
    """, [names, names]).df()
    assert got["name_a"].tolist() == want["name_a"].tolist()
    assert got["name_b"].tolist() == want["name_b"].tolist()
    assert len(got) > 50  # the dense block actually produced pairs


def test_edit1_pairs_layout_invariant_and_cap(ray_session):
    import ray
    import ray.data as rd

    from markdown_lab_ray.stages.dedup import (
        edit1_similar_pairs,
        new_cap_stats,
        report_caps,
    )

    names = [f"x{i:03d}" for i in range(80)]
    table = pa.table({"c_name": pa.array(names)})
    outs = []
    for parts in (1, 7):
        df = (edit1_similar_pairs(rd.from_arrow(table).repartition(parts))
              .to_pandas())
        outs.append(sorted(zip(df["name_a"], df["name_b"])))
    assert outs[0] == outs[1] and len(outs[0]) > 0

    # a tiny cap drops pairs and the stats actor records it
    stats = new_cap_stats()
    capped = (edit1_similar_pairs(rd.from_arrow(table), bucket_cap=5,
                                  cap_stats=stats).to_pandas())
    buckets, dropped = report_caps(stats, "edit1_test")
    assert len(capped) < len(outs[0])
    assert buckets > 0 and dropped > 0


def test_edit1_pairs_rejects_non_ascii(ray_session):
    import ray.data as rd

    from markdown_lab_ray.stages.dedup import edit1_similar_pairs

    table = pa.table({"c_name": pa.array(["héllo", "hallo"])})
    with pytest.raises(Exception):
        edit1_similar_pairs(rd.from_arrow(table)).to_pandas()


def test_edit1_pairs_no_duplicates(ray_session):
    """Each qualifying pair collides in exactly one band, so the output
    carries no duplicate rows even without a distinct pass."""
    import ray.data as rd

    from markdown_lab_ray.stages.dedup import edit1_similar_pairs

    names = [f"n{i:03d}" for i in range(120)] * 2  # duplicated rows too
    table = pa.table({"c_name": pa.array(names)})
    df = (edit1_similar_pairs(rd.from_arrow(table).repartition(9))
          .to_pandas())
    pairs = list(zip(df["name_a"], df["name_b"]))
    assert len(pairs) == len(set(pairs)) > 0


# ---------------------------------------------------------------------------
# cooccurrence_edges + triangle_count
# ---------------------------------------------------------------------------

def _local_triangles(edges):
    """Brute-force oracle: each triangle is seen once per edge."""
    adj = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    return sum(len(adj[u] & adj[v]) for u, v in edges) // 3


def test_triangle_count_known_graphs(ray_session):
    import ray.data as rd

    from markdown_lab_ray.stages.graph import triangle_count

    # K4 has 4 triangles; an extra pendant edge adds none
    k4 = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 9)]
    ds = rd.from_arrow(pa.table({
        "u": pa.array([e[0] for e in k4], pa.int64()),
        "v": pa.array([e[1] for e in k4], pa.int64()),
    })).repartition(3)
    assert triangle_count(ds) == 4

    # triangle-free bipartite-ish graph
    b = [(1, 10), (2, 10), (1, 11), (2, 11)]
    ds2 = rd.from_arrow(pa.table({
        "u": pa.array([e[0] for e in b], pa.int64()),
        "v": pa.array([e[1] for e in b], pa.int64()),
    }))
    assert triangle_count(ds2) == 0


def test_triangle_count_random_vs_bruteforce(ray_session):
    import ray.data as rd

    from markdown_lab_ray.stages.graph import triangle_count

    rng = np.random.RandomState(3)
    edges = set()
    while len(edges) < 300:
        u, v = rng.randint(0, 40, 2)
        if u != v:
            edges.add((min(u, v), max(u, v)))
    edges = sorted(edges)
    ds = rd.from_arrow(pa.table({
        "u": pa.array([e[0] for e in edges], pa.int64()),
        "v": pa.array([e[1] for e in edges], pa.int64()),
    })).repartition(5)
    assert triangle_count(ds) == _local_triangles(edges)


def test_cooccurrence_edges_matches_duckdb(ray_session):
    import duckdb
    import pandas as pd
    import ray.data as rd

    from markdown_lab_ray.stages.graph import cooccurrence_edges

    rng = np.random.RandomState(5)
    df = pd.DataFrame({
        "oid": rng.randint(0, 50, 400).astype("int64"),
        "pid": rng.randint(0, 30, 400).astype("int64"),
    })
    got = (cooccurrence_edges(rd.from_pandas(df).repartition(4),
                              "oid", "pid")
           .to_pandas().sort_values(["u", "v"]).reset_index(drop=True))
    con = duckdb.connect()
    con.register("t", df)
    want = con.execute("""
        SELECT DISTINCT a.pid AS u, b.pid AS v
        FROM t a JOIN t b ON a.oid = b.oid AND a.pid < b.pid
        ORDER BY 1, 2
    """).df()
    assert got["u"].tolist() == want["u"].tolist()
    assert got["v"].tolist() == want["v"].tolist()


# ---------------------------------------------------------------------------
# bm25_scores
# ---------------------------------------------------------------------------

def test_bm25_matches_local_formula(ray_session):
    import math

    import ray.data as rd

    from markdown_lab_ray.stages.text import bm25_scores

    docs = ["cat dog cat", "dog dog dog fish", "bird bird", "   ",
            "cat fish cat cat"]
    table = pa.table({"doc_id": pa.array(range(5), pa.int64()),
                      "text": pa.array(docs, pa.string())})
    got = (bm25_scores(rd.from_arrow(table).repartition(3),
                       ["cat", "fish"]).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))

    # local oracle over the 4 non-empty docs
    toks = [d.split() for d in docs if d.strip()]
    n = len(toks)
    avgdl = sum(len(t) for t in toks) / n
    want = {}
    for doc_id, t in zip([0, 1, 2, 4], toks):
        s = 0.0
        for term in ("cat", "fish"):
            tf = t.count(term)
            if tf == 0:
                continue
            df = sum(1 for tt in toks if term in tt)
            idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
            s += idf * tf * 2.2 / (tf + 1.2 * (0.25 + (0.75 * len(t))
                                               / avgdl))
        if s > 0:
            want[doc_id] = math.floor(s * 1e6 + 0.5)
    assert dict(zip(got["doc_id"], got["bm25_micro"])) == want
    # doc 2 (no query terms) and doc 3 (whitespace) are absent
    assert set(got["doc_id"]) == {0, 1, 4}


def test_bm25_rejects_empty_terms(ray_session):
    import ray.data as rd

    from markdown_lab_ray.stages.text import bm25_scores

    ds = rd.from_arrow(pa.table({"doc_id": [1], "text": ["x"]}))
    with pytest.raises(ValueError, match="non-empty"):
        bm25_scores(ds, [])


def test_grouped_ols_matches_numpy(ray_session):
    import pandas as pd
    import ray.data as rd

    from markdown_lab_ray.stages.analytics import grouped_ols

    rng = np.random.RandomState(2)
    x = np.round(rng.uniform(1, 50, 500), 2)
    y = np.round(3.5 * x + 10 + rng.normal(0, 5, 500), 2)
    df = pd.DataFrame({"k": [f"g{i % 3}" for i in range(500)],
                       "x": x, "y": y})
    out = (grouped_ols(rd.from_pandas(df).repartition(4), "k", "x", "y")
           .to_pandas().sort_values("k").reset_index(drop=True))
    for _, r in out.iterrows():
        sub = df[df["k"] == r["k"]]
        # numpy oracle over exact cents, same derivation
        cx = np.floor(sub["x"].to_numpy() * 100 + 0.5)
        cy = np.floor(sub["y"].to_numpy() * 100 + 0.5)
        slope, intercept = np.polyfit(cx, cy, 1)
        assert abs(r["slope"] - slope) < 1e-4
        assert abs(r["intercept"] - intercept) < 1e-2
    # zero-variance key -> nulls
    dfz = pd.DataFrame({"k": ["z"] * 4, "x": [2.0] * 4,
                        "y": [1.0, 2.0, 3.0, 4.0]})
    outz = grouped_ols(rd.from_pandas(dfz), "k", "x", "y").to_pandas()
    assert outz["slope"].isna().all() and outz["intercept"].isna().all()


def test_skyline_2d_matches_bruteforce(ray_session):
    import pandas as pd
    import ray.data as rd

    from markdown_lab_ray.stages.analytics import skyline_2d

    rng = np.random.RandomState(9)
    df = pd.DataFrame({
        "id": np.arange(400, dtype=np.int64),
        "x": rng.randint(0, 60, 400).astype("int64"),
        "y": rng.randint(0, 60, 400).astype("int64"),
    })
    got = (skyline_2d(rd.from_pandas(df).repartition(7), "x", "y")
           .to_pandas().sort_values("id").reset_index(drop=True))

    def dominated(r):
        return (((df["x"] <= r.x) & (df["y"] >= r.y)
                 & ((df["x"] < r.x) | (df["y"] > r.y)))).any()

    want = df[[not dominated(r) for r in df.itertuples()]]
    assert got["id"].tolist() == want["id"].tolist()
    assert len(got) > 0


def test_skyline_2d_keeps_duplicate_optima(ray_session):
    import pandas as pd
    import ray.data as rd

    from markdown_lab_ray.stages.analytics import skyline_2d

    df = pd.DataFrame({"id": [1, 2, 3, 4],
                       "x": [5, 5, 5, 6],
                       "y": [9, 9, 3, 10]})
    got = (skyline_2d(rd.from_pandas(df).repartition(2), "x", "y")
           .to_pandas())
    # both (5,9) twins survive (ties don't dominate); (5,3) is
    # dominated; (6,10) survives (worse x, better y)
    assert sorted(got["id"].tolist()) == [1, 2, 4]


def test_cooccurrence_counts_support_filter(ray_session):
    import pandas as pd
    import ray.data as rd

    from markdown_lab_ray.stages.graph import cooccurrence_counts

    # baskets: {1,2,3}, {1,2}, {1,2,4}, {3,4}; pair (1,2) support 3
    df = pd.DataFrame({
        "oid": [10, 10, 10, 20, 20, 30, 30, 30, 40, 40],
        "pid": [1, 2, 3, 1, 2, 1, 2, 4, 3, 4],
    }).astype("int64")
    got = (cooccurrence_counts(rd.from_pandas(df).repartition(3),
                               "oid", "pid", min_support=2)
           .to_pandas().sort_values(["u", "v"]).reset_index(drop=True))
    assert list(zip(got["u"], got["v"], got["n"])) == [(1, 2, 3)]

    all_pairs = (cooccurrence_counts(rd.from_pandas(df), "oid", "pid",
                                     min_support=1).to_pandas())
    assert len(all_pairs) == 6  # (1,2),(1,3),(2,3),(1,4),(2,4),(3,4)

    with pytest.raises(ValueError):
        cooccurrence_counts(rd.from_pandas(df), "oid", "pid",
                            min_support=0)


def test_bfs_hops_small_graph(ray_session):
    import ray.data as rd

    from markdown_lab_ray.stages.graph import bfs_hops

    # 1→2→3→4→5 chain plus a shortcut 1→4 and a cycle 3→1
    edges = [(1, 2), (2, 3), (3, 4), (4, 5), (1, 4), (3, 1)]
    ds = rd.from_arrow(pa.table({
        "src": pa.array([e[0] for e in edges], pa.int64()),
        "dst": pa.array([e[1] for e in edges], pa.int64()),
    })).repartition(3)
    out = {r["node"]: r["hops"] for r in bfs_hops(ds, [1], 4).take_all()}
    assert out == {1: 0, 2: 1, 4: 1, 3: 2, 5: 2}

    # hop cap truncates
    out2 = {r["node"]: r["hops"]
            for r in bfs_hops(ds, [1], 1).take_all()}
    assert out2 == {1: 0, 2: 1, 4: 1}

    with pytest.raises(ValueError):
        bfs_hops(ds, [], 2)


def test_bfs_hops_matches_duckdb_recursive(ray_session):
    import duckdb
    import pandas as pd
    import ray.data as rd

    from markdown_lab_ray.stages.graph import bfs_hops

    rng = np.random.RandomState(4)
    edges = sorted({(int(a), int(b)) for a, b in
                    rng.randint(0, 30, (150, 2)) if a != b})
    df = pd.DataFrame(edges, columns=["src", "dst"]).astype("int64")
    got = (bfs_hops(rd.from_pandas(df).repartition(4), [0], 3)
           .to_pandas().sort_values("node").reset_index(drop=True))
    con = duckdb.connect()
    con.register("edges", df)
    want = con.execute("""
        WITH RECURSIVE walk(node, hops) AS (
          SELECT CAST(0 AS BIGINT), CAST(0 AS BIGINT)
          UNION
          SELECT e.dst, w.hops + 1 FROM walk w
          JOIN edges e ON e.src = w.node WHERE w.hops < 3)
        SELECT node, MIN(hops) AS hops FROM walk
        GROUP BY node ORDER BY node
    """).df()
    assert got["node"].tolist() == want["node"].tolist()
    assert got["hops"].tolist() == want["hops"].tolist()


def test_interval_coverage_merges_overlaps(ray_session):
    import pandas as pd
    import ray.data as rd

    from markdown_lab_ray.stages.analytics import interval_coverage

    rows = pd.DataFrame({
        "user_id": [1, 1, 1, 2, 2, 3],
        "ts": pd.to_datetime([
            "2024-01-01 00:00", "2024-01-01 00:10",   # overlap: 40 min
            "2024-01-01 02:00",                        # disjoint: +30
            "2024-01-01 00:00", "2024-01-01 00:00",   # duplicate: 30
            "2024-01-01 05:00",                        # single: 30
        ]),
    })
    out = (interval_coverage(rd.from_pandas(rows).repartition(3),
                             dur_us=30 * 60 * 1_000_000)
           .to_pandas().sort_values("user_id").reset_index(drop=True))
    mins = {r.user_id: r.covered_us // 60_000_000 for r in out.itertuples()}
    assert mins == {1: 70, 2: 30, 3: 30}

    with pytest.raises(ValueError):
        interval_coverage(rd.from_pandas(rows), dur_us=0)


def test_group_token_entropy_matches_local(ray_session):
    import math

    import ray.data as rd

    from markdown_lab_ray.stages.text import group_token_entropy

    docs = pa.table({
        "lang": pa.array(["en", "en", "de", "de"]),
        "text": pa.array(["a b a b", "a a a a", "x y z w", "x y z w"]),
    })
    out = (group_token_entropy(rd.from_arrow(docs).repartition(3))
           .to_pandas().sort_values("lang").reset_index(drop=True))

    def h(counts):
        n = sum(counts)
        return math.floor((math.log(n) - sum(c * math.log(c)
                                              for c in counts) / n)
                          * 1e6 + 0.5)

    want = {"en": h([6, 2]), "de": h([2, 2, 2, 2])}
    got = dict(zip(out["lang"], out["entropy_micro"]))
    assert got == want
    # uniform 4-token distribution = ln(4) nats
    assert abs(got["de"] - math.log(4) * 1e6) <= 1


def test_label_centroids_matches_numpy(ray_session):
    import ray.data as rd

    from markdown_lab_ray.stages.similarity import label_centroids

    rng = np.random.RandomState(6)
    n, d = 120, 8
    labels = rng.randint(0, 3, n)
    vecs = rng.normal(size=(n, d)).astype(np.float32)
    table = pa.table({
        "label": pa.array(labels, pa.int64()),
        "embedding": pa.array([v.tolist() for v in vecs],
                              pa.list_(pa.float32())),
    })
    got = (label_centroids(rd.from_arrow(table).repartition(5))
           .to_pandas())
    assert len(got) == 3 * d
    for lab in range(3):
        m = vecs[labels == lab].astype(np.float64).mean(axis=0)
        want = np.floor(m * 1e6 + 0.5).astype(np.int64)
        sub = got[got["label"] == lab].sort_values("dim")
        assert np.abs(sub["mean_micro"].to_numpy() - want).max() <= 1


def test_rolling_distinct_users_small(ray_session):
    import pandas as pd
    import ray.data as rd

    from markdown_lab_ray.stages.analytics import rolling_distinct_users

    rows = pd.DataFrame({
        "user_id": [1, 2, 1, 3, 1],
        "ts": pd.to_datetime(["2024-01-01", "2024-01-01 09:00",
                              "2024-01-03", "2024-01-03",
                              "2024-01-20"], format="mixed"),
    })
    out = (rolling_distinct_users(rd.from_pandas(rows).repartition(3),
                                  window_days=7)
           .to_pandas().sort_values("day").reset_index(drop=True))
    got = {r.day.strftime("%m-%d"): r.n_active for r in out.itertuples()}
    # 01-01: {1,2}; 01-03: {1,2,3} (window covers 01-01); 01-20: {1}
    assert got == {"01-01": 2, "01-03": 3, "01-20": 1}

    with pytest.raises(ValueError):
        rolling_distinct_users(rd.from_pandas(rows), window_days=0)


def test_winsorize_clips_to_percentiles(ray_session):
    import pandas as pd
    import ray.data as rd

    from markdown_lab_ray.stages.analytics import winsorize_per_key

    rng = np.random.RandomState(8)
    df = pd.DataFrame({
        "k": ["a"] * 200 + ["b"] * 200,
        "id": np.arange(400, dtype=np.int64),
        "v": np.round(np.concatenate([rng.normal(10, 3, 200),
                                      rng.normal(100, 30, 200)]), 2),
    })
    out = (winsorize_per_key(rd.from_pandas(df).repartition(4), "k",
                             "v", "id").to_pandas()
           .sort_values("id").reset_index(drop=True))
    assert len(out) == 400
    for key in ("a", "b"):
        vals = df[df["k"] == key]["v"].to_numpy()
        lo = round(float(np.percentile(vals, 5)), 6)
        hi = round(float(np.percentile(vals, 95)), 6)
        w = out[out["k"] == key]["value_w"].to_numpy()
        want = np.minimum(np.maximum(vals, lo), hi)
        assert np.array_equal(np.sort(w), np.sort(want))
        assert w.min() >= lo and w.max() <= hi

    with pytest.raises(ValueError):
        winsorize_per_key(rd.from_pandas(df), "k", "v", "id",
                          lo_q=0.9, hi_q=0.1)


def test_compression_ratio_separates_redundancy(ray_session):
    import zlib

    import ray.data as rd

    from markdown_lab_ray.stages.text import compression_ratio_batch

    repetitive = "spam ham " * 500
    rng = np.random.RandomState(1)
    noisy = " ".join("".join(chr(97 + c) for c in rng.randint(0, 26, 8))
                     for _ in range(500))
    table = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                      "text": pa.array([repetitive, noisy, ""])})
    out = (rd.from_arrow(table).repartition(2)
           .map_batches(compression_ratio_batch, batch_format="pyarrow")
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    r = dict(zip(out["doc_id"], out["compression_ratio"]))
    # local twin: exact same zlib call
    assert r[1] == round(len(zlib.compress(repetitive.encode(), 6))
                         / len(repetitive.encode()), 6)
    assert r[1] < 0.05 < r[2]          # boilerplate vs noise
    assert r[3] == 0.0                 # empty doc


def test_pmi_collocations_matches_local(ray_session):
    import math
    from collections import Counter

    import ray.data as rd

    from markdown_lab_ray.stages.text import pmi_collocations

    docs = ["new york is a big city", "new york has new parks",
            "big city big dreams", "york is new"] * 3
    table = pa.table({"doc_id": pa.array(range(len(docs)), pa.int64()),
                      "text": pa.array(docs)})
    got = (pmi_collocations(rd.from_arrow(table).repartition(3),
                            min_count=3)
           .to_pandas().sort_values(["w1", "w2"]).reset_index(drop=True))

    uni, big = Counter(), Counter()
    for d in docs:
        toks = d.split()
        uni.update(toks)
        big.update(zip(toks, toks[1:]))
    nu, nb = float(sum(uni.values())), float(sum(big.values()))
    want = {}
    for (a, b), c in big.items():
        if c >= 3:
            pmi = math.log((c * nu * nu) / (nb * uni[a] * uni[b]))
            want[(a, b)] = (c, math.floor(pmi * 1e6 + 0.5))
    assert {(r.w1, r.w2): (r.n, r.pmi_micro)
            for r in got.itertuples()} == want
    assert ("new", "york") in want  # the collocation is found


def test_grouped_means_matches_scipy_formulas(ray_session):
    import math

    import pandas as pd
    import ray.data as rd

    from markdown_lab_ray.stages.analytics import grouped_means

    rng = np.random.RandomState(12)
    df = pd.DataFrame({"k": ["a"] * 50 + ["b"] * 50,
                       "v": np.round(rng.uniform(0.5, 99.5, 100), 2)})
    out = (grouped_means(rd.from_pandas(df).repartition(4), "k", "v")
           .to_pandas().sort_values("k").reset_index(drop=True))
    for key in ("a", "b"):
        v = df[df["k"] == key]["v"].to_numpy(dtype=np.float64)
        cents = np.floor(v * 100 + 0.5)
        r = out[out["k"] == key].iloc[0]
        assert r["amean_micro"] == math.floor(
            cents.sum() / len(v) / 100.0 * 1e6 + 0.5)
        assert abs(r["gmean_micro"]
                   - math.floor(np.exp(np.log(v).sum() / len(v))
                                * 1e6 + 0.5)) <= 1
        assert abs(r["hmean_micro"]
                   - math.floor(len(v) / (1.0 / v).sum() * 1e6 + 0.5)) <= 1
        # AM >= GM >= HM
        assert r["amean_micro"] >= r["gmean_micro"] >= r["hmean_micro"]

    bad = pd.DataFrame({"k": ["a"], "v": [0.0]})
    with pytest.raises(Exception):
        grouped_means(rd.from_pandas(bad), "k", "v").to_pandas()


# ---------------------------------------------------------------------------
# dataset_diff
# ---------------------------------------------------------------------------

def test_dataset_diff_classifies(ray_session):
    import pandas as pd
    import ray.data as rd

    from markdown_lab_ray.stages.diff import dataset_diff

    a = pd.DataFrame({"k": [1, 2, 3, 4], "p": ["x", "y", "z", "w"]})
    b = pd.DataFrame({"k": [2, 3, 5], "p": ["y", "Z", "new"]})
    out = (dataset_diff(rd.from_pandas(a).repartition(2),
                        rd.from_pandas(b).repartition(2), "k", "p")
           .to_pandas().sort_values("k").reset_index(drop=True))
    got = dict(zip(out["k"], out["status"]))
    assert got == {1: "removed", 3: "changed", 4: "removed", 5: "added"}

    full = (dataset_diff(rd.from_pandas(a), rd.from_pandas(b), "k", "p",
                         include_same=True).to_pandas())
    assert dict(zip(full["k"], full["status"]))[2] == "same"


def test_dataset_diff_rejects_duplicate_keys(ray_session):
    import pandas as pd
    import ray.data as rd

    from markdown_lab_ray.stages.diff import dataset_diff

    a = pd.DataFrame({"k": [1, 1], "p": ["x", "y"]})
    b = pd.DataFrame({"k": [1], "p": ["x"]})
    with pytest.raises(Exception):
        dataset_diff(rd.from_pandas(a), rd.from_pandas(b),
                     "k", "p").to_pandas()


def test_pagerank_fast_path_matches_loop(ray_session):
    """The single-task small-graph path must be bit-identical to the
    distributed alternating loop (exact integer arithmetic)."""
    import ray.data as rd

    from markdown_lab_ray.stages.graph import pagerank_integer

    rng = np.random.RandomState(21)
    edges = sorted({(int(a), int(b)) for a, b in
                    rng.randint(0, 50, (200, 2)) if a != b})
    ds = rd.from_arrow(pa.table({
        "src": pa.array([e[0] for e in edges], pa.int64()),
        "dst": pa.array([e[1] for e in edges], pa.int64()),
    })).repartition(4)
    fast = {r["node"]: r["rank"]
            for r in pagerank_integer(ds, n_iter=3).take_all()}
    loop = {r["node"]: r["rank"]
            for r in pagerank_integer(ds, n_iter=3,
                                      small_cutoff=0).take_all()}
    assert fast == loop and len(fast) > 0


def test_grouped_gini_known_values(ray_session):
    import pandas as pd
    import ray.data as rd

    from markdown_lab_ray.stages.analytics import grouped_gini

    df = pd.DataFrame({
        # perfectly equal → 0; one-owner extreme → (n-1)/n = 0.75
        "k": ["eq"] * 4 + ["one"] * 4,
        "v": [5.0, 5.0, 5.0, 5.0, 0.0, 0.0, 0.0, 10.0],
    })
    out = (grouped_gini(rd.from_pandas(df).repartition(3), "k", "v")
           .to_pandas().sort_values("k").reset_index(drop=True))
    got = dict(zip(out["k"], out["gini_micro"]))
    assert got["eq"] == 0
    assert got["one"] == 750_000

    neg = pd.DataFrame({"k": ["a"], "v": [-1.0]})
    with pytest.raises(Exception):
        grouped_gini(rd.from_pandas(neg), "k", "v").to_pandas()


def test_grouped_gini_tie_order_invariant(ray_session):
    import pandas as pd
    import ray.data as rd

    from markdown_lab_ray.stages.analytics import grouped_gini

    rng = np.random.RandomState(17)
    vals = rng.choice([1.0, 2.0, 2.0, 5.0, 10.0], size=200)
    outs = []
    for seed in (1, 2):
        perm = np.random.RandomState(seed).permutation(len(vals))
        df = pd.DataFrame({"k": "g", "v": vals[perm]})
        out = grouped_gini(rd.from_pandas(df).repartition(5), "k",
                           "v").to_pandas()
        outs.append(int(out["gini_micro"].iloc[0]))
    assert outs[0] == outs[1]


def test_interarrival_cv_metronome_vs_bursty(ray_session):
    import pandas as pd
    import ray.data as rd

    from markdown_lab_ray.stages.analytics import interarrival_cv

    base = pd.Timestamp("2024-01-01")
    rows = []
    # metronome: exact 60s gaps -> cv 0
    for i in range(20):
        rows.append((1, base + pd.Timedelta(seconds=60 * i), i))
    # bursty: 10 events in 1s, then an hour gap, repeated
    eid = 100
    t = base
    for burst in range(5):
        for i in range(10):
            rows.append((2, t + pd.Timedelta(seconds=i * 0.1), eid))
            eid += 1
        t += pd.Timedelta(hours=1)
    df = pd.DataFrame(rows, columns=["user_id", "ts", "event_id"])
    out = (interarrival_cv(rd.from_pandas(df).repartition(4))
           .to_pandas().set_index("user_id"))
    assert out.loc[1, "cv_micro"] == 0
    assert out.loc[2, "cv_micro"] > 2_000_000  # heavily bursty
    assert out.loc[1, "n_gaps"] == 19 and out.loc[2, "n_gaps"] == 49


def test_grouped_mad_matches_numpy(ray_session):
    import pandas as pd
    import ray.data as rd

    from markdown_lab_ray.stages.analytics import grouped_mad

    rng = np.random.RandomState(23)
    df = pd.DataFrame({"k": ["a"] * 101 + ["b"] * 100,
                       "v": np.round(rng.normal(50, 10, 201), 2)})
    out = (grouped_mad(rd.from_pandas(df).repartition(4), "k", "v")
           .to_pandas().set_index("k"))
    for key in ("a", "b"):
        v = df[df["k"] == key]["v"].to_numpy()
        med = np.median(v)
        mad = np.median(np.abs(v - med))
        assert out.loc[key, "median"] == round(float(med), 6)
        assert out.loc[key, "mad"] == round(float(mad), 6)
        assert out.loc[key, "n"] == len(v)


def test_grouped_cat_entropy_known(ray_session):
    import math

    import pandas as pd
    import ray.data as rd

    from markdown_lab_ray.stages.analytics import grouped_cat_entropy

    df = pd.DataFrame({
        "user_id": [1] * 8 + [2] * 4,
        "event_type": ["a"] * 8 + ["a", "b", "c", "d"],
    })
    out = (grouped_cat_entropy(rd.from_pandas(df).repartition(3),
                               "user_id", "event_type")
           .to_pandas().set_index("user_id"))
    assert out.loc[1, "entropy_micro"] == 0
    assert abs(out.loc[2, "entropy_micro"]
               - math.floor(math.log(4) * 1e6 + 0.5)) <= 1

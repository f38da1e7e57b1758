"""Round-4m operators: FK referential-integrity audit, deterministic
hash-ranked negative sampling."""

import hashlib

import pandas as pd
import ray.data as rd


def test_fk_violations_detects_orphans(ray_session, tmp_path):
    from __ray_entry__ import q_fk_violations

    pd.DataFrame({"c_custkey": [1, 2]}).to_parquet(
        tmp_path / "customer.parquet")
    pd.DataFrame({"o_orderkey": [10, 11, 12],
                  "o_custkey": [1, 2, 99]}).to_parquet(   # 99 orphan
        tmp_path / "orders.parquet")
    pd.DataFrame({"l_orderkey": [10, 10, 77],             # 77 orphan
                  "l_partkey": [5, 6, 5]}).to_parquet(    # 6 orphan
        tmp_path / "lineitem.parquet")
    pd.DataFrame({"p_partkey": [5]}).to_parquet(tmp_path / "part.parquet")
    out = q_fk_violations(str(tmp_path)).set_index("fk_edge")["n_orphans"]
    assert out["orders.o_custkey -> customer"] == 1
    assert out["lineitem.l_orderkey -> orders"] == 1
    assert out["lineitem.l_partkey -> part"] == 1


def test_negative_samples_hand_case(ray_session):
    from markdown_lab_ray.stages.similarity import negative_samples

    # one bucket (n_buckets=1): anchors see every other-label candidate
    df = pd.DataFrame({"vec_id": [1, 2, 3, 4],
                       "label": [0, 0, 1, 1]})
    out = (negative_samples(rd.from_pandas(df), "vec_id", "label",
                            k=2, n_buckets=1)
           .to_pandas().sort_values(["vec_id", "rank"])
           .reset_index(drop=True))
    # every anchor gets exactly 2 negatives, none sharing its label
    assert out.groupby("vec_id")["rank"].apply(list).tolist() == \
        [[1, 2]] * 4
    lab = dict(zip(df["vec_id"], df["label"]))
    assert all(lab[a] != lab[n]
               for a, n in zip(out["vec_id"], out["neg_id"]))
    # rank order is the md5(a|c) order, bit-for-bit
    for a in (1, 2):
        hs = sorted((hashlib.md5(f"{a}|{c}".encode()).hexdigest(), c)
                    for c in (3, 4))
        want = [c for _, c in hs]
        got = out[out["vec_id"] == a].sort_values("rank")[
            "neg_id"].tolist()
        assert got == want, a
    # layout independence
    out2 = (negative_samples(rd.from_pandas(df).repartition(3),
                             "vec_id", "label", k=2, n_buckets=1)
            .to_pandas().sort_values(["vec_id", "rank"])
            .reset_index(drop=True))
    assert out.equals(out2)


def test_negative_samples_bucket_scoping_and_k_cut(ray_session):
    from markdown_lab_ray.stages.similarity import negative_samples

    # bucket 0: {0 (label 0), 2 (label 1)}; bucket 1: {1, 3} same label
    # → ids 1 and 3 have NO in-bucket negatives and emit nothing
    df = pd.DataFrame({"vec_id": [0, 1, 2, 3],
                       "label": [0, 0, 1, 0]})
    out = (negative_samples(rd.from_pandas(df), "vec_id", "label",
                            k=5, n_buckets=2)
           .to_pandas().sort_values("vec_id").reset_index(drop=True))
    assert out[["vec_id", "neg_id", "rank"]].values.tolist() == \
        [[0, 2, 1], [2, 0, 1]]


def test_dataset_fingerprint_order_insensitive(ray_session):
    from markdown_lab_ray.stages.analytics import dataset_fingerprint

    df = pd.DataFrame({"doc_id": [1, 2, 3],
                       "text": ["alpha", "beta", "gamma"]})
    a = dataset_fingerprint(rd.from_pandas(df), ["doc_id", "text"])
    b = dataset_fingerprint(
        rd.from_pandas(df.iloc[::-1].reset_index(drop=True))
        .repartition(3), ["doc_id", "text"])
    assert a.equals(b)
    assert a["n_rows"].iloc[0] == 3
    # known value: 60-bit prefix of md5("1|alpha")
    h = int(hashlib.md5(b"1|alpha").hexdigest()[:15], 16)
    one = dataset_fingerprint(rd.from_pandas(df.head(1)),
                              ["doc_id", "text"])
    assert one["sum_mod"].iloc[0] == h == one["xor_fp"].iloc[0]
    # any difference moves the fingerprint
    df2 = df.assign(text=["alpha", "beta", "gamma!"])
    c = dataset_fingerprint(rd.from_pandas(df2), ["doc_id", "text"])
    assert not a.equals(c)


def test_windowed_cooccurrence_hand_case(ray_session):
    from markdown_lab_ray.stages.analytics import windowed_cooccurrence

    base = pd.Timestamp("2020-01-01")
    df = pd.DataFrame({
        "user_id": [1, 1, 1, 1, 2, 2],
        "ts": [base, base,                             # tie: never pairs
               base + pd.Timedelta(minutes=30),
               base + pd.Timedelta(minutes=100),       # out of A's window
               base, base + pd.Timedelta(minutes=59)],
        "event_type": ["A", "B", "C", "D", "A", "C"]})
    out = (windowed_cooccurrence(rd.from_pandas(df))
           .to_pandas().sort_values(["type_a", "type_b"])
           .reset_index(drop=True))
    # user1: A→C, B→C (ties A,B both pair with C); C→D (70min>60? no —
    # 100−30=70min > 60 → NOT a pair). user2: A→C (59min).
    assert out[["type_a", "type_b", "n_pairs"]].values.tolist() == [
        ["A", "C", 2], ["B", "C", 1]]
    # layout independence
    out2 = (windowed_cooccurrence(rd.from_pandas(df).repartition(4))
            .to_pandas().sort_values(["type_a", "type_b"])
            .reset_index(drop=True))
    assert out.equals(out2)


def test_boilerplate_lines_and_strip(ray_session):
    from markdown_lab_ray.stages.text import boilerplate_lines, strip_boilerplate

    nav = "# Site Nav"
    foot = "(c) footer"
    docs = pd.DataFrame({
        "host": ["a", "a", "a", "b", "b"],
        "url": [f"u{i}" for i in range(5)],
        "payload": [
            f"{nav}\nunique one\n{foot}",
            f"{nav}\nunique two\n{foot}\n{foot}",   # dup line: counts once
            f"{nav}\nunique three",
            f"{nav}\nonly page b1",                 # host b: nav on 1 of 2
            "no nav here\n\n  \n",                  # blanks never count
        ]})
    ds = rd.from_pandas(docs)
    bp = (boilerplate_lines(ds, "host", "payload", "url",
                            min_ratio_bp=6000, min_pages=2)
          .to_pandas().sort_values(["host", "line_md5"]))
    # host a (3 pages): nav on 3/3 (100%), foot on 2/3 (66%) → both in;
    # host b (2 pages): nav on 1/2 (50%) → below 60% AND min_pages
    assert bp["host"].tolist() == ["a", "a"]
    assert sorted(bp["n_pages"]) == [2, 3]
    assert bp["group_pages"].tolist() == [3, 3]
    stripped = (strip_boilerplate(ds, "host", "payload", "url",
                                  min_ratio_bp=6000, min_pages=2)
                .to_pandas().sort_values("url").reset_index(drop=True))
    assert stripped["n_lines_dropped"].tolist() == [2, 3, 1, 0, 0]
    assert stripped["n_lines_kept"].tolist() == [1, 1, 1, 2, 1]
    assert stripped.loc[0, "n_chars_kept"] == len("unique one")
    # layout independence
    s2 = (strip_boilerplate(rd.from_pandas(docs).repartition(4),
                            "host", "payload", "url",
                            min_ratio_bp=6000, min_pages=2)
          .to_pandas().sort_values("url").reset_index(drop=True))
    assert stripped.equals(s2)


def test_score_percentiles_rank_ties(ray_session):
    from markdown_lab_ray.stages.analytics import score_percentiles

    df = pd.DataFrame({"doc_id": [1, 2, 3, 4, 5],
                       "n_chars": [10, 20, 20, 30, 40]})
    out = (score_percentiles(rd.from_pandas(df), "doc_id", "n_chars")
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    # strict-less counts: 0,1,1,3,4 → ×10000//4 = 0,2500,2500,7500,10000
    assert out["pct_bp"].tolist() == [0, 2500, 2500, 7500, 10000]
    # single row → denom guard
    one = score_percentiles(rd.from_pandas(df.head(1)), "doc_id",
                            "n_chars").to_pandas()
    assert one["pct_bp"].tolist() == [0]


def test_kmv_exact_below_k(ray_session):
    from markdown_lab_ray.stages.sketch import kmv_overlap

    # sets below k are EXACT: A users {1..6}, B users {4..9} → |A|=6,
    # |B|=6, |A∪B|=9, |A∩B|=3
    df = pd.DataFrame({
        "event_type": ["A"] * 6 + ["B"] * 6,
        "user_id": [1, 2, 3, 4, 5, 6, 4, 5, 6, 7, 8, 9]})
    out = kmv_overlap(rd.from_pandas(df), "event_type", "user_id", k=256)
    pair = out[(out["key_a"] == "A") & (out["key_b"] == "B")].iloc[0]
    assert (pair["est_a"], pair["est_b"]) == (6, 6)
    assert (pair["est_union"], pair["est_inter"]) == (9, 3)
    # layout independence
    out2 = kmv_overlap(rd.from_pandas(df).repartition(5),
                       "event_type", "user_id", k=256)
    assert out.equals(out2)


def test_kmv_estimate_accuracy_above_k(ray_session):
    from markdown_lab_ray.stages.sketch import kmv_overlap

    # 4000 distinct users split across two types with 2000 shared:
    # estimates at k=256 should land within 15%
    a = list(range(0, 3000))
    b = list(range(1000, 4000))
    df = pd.DataFrame({"event_type": ["A"] * len(a) + ["B"] * len(b),
                       "user_id": a + b})
    out = kmv_overlap(rd.from_pandas(df).repartition(8),
                      "event_type", "user_id", k=256)
    pair = out[(out["key_a"] == "A") & (out["key_b"] == "B")].iloc[0]
    assert abs(pair["est_a"] - 3000) / 3000 < 0.15
    assert abs(pair["est_union"] - 4000) / 4000 < 0.15
    assert abs(pair["est_inter"] - 2000) / 2000 < 0.30


def test_write_with_lineage_and_verify(ray_session, tmp_path):
    from markdown_lab_ray.sources.io import verify_lineage, write_with_lineage

    df = pd.DataFrame({"doc_id": range(20),
                       "text": [f"t{i}" for i in range(20)]})
    out = str(tmp_path / "sink")
    m = write_with_lineage(rd.from_pandas(df), out, "doc_id",
                           inputs=["synthetic://docs"],
                           pipeline="test_pipeline",
                           fingerprint_cols=["doc_id", "text"],
                           n_shards=4)
    assert m["n_rows"] == 20 and m["pipeline"] == "test_pipeline"
    assert set(m["fingerprint"]) == {"cols", "sum_mod", "xor_fp", "n_rows"}
    v = verify_lineage(out)
    assert v["ok"], v
    # corrupt one shard → verification must fail
    import glob
    victim = sorted(glob.glob(f"{out}/shard=*/*.parquet"))[0]
    shard_df = pd.read_parquet(victim)
    shard_df.loc[0, "text"] = "tampered"
    shard_df.to_parquet(victim)
    v2 = verify_lineage(out)
    assert not v2["ok"]
    assert v2["expected"]["n_rows"] == v2["actual"]["n_rows"]  # same rows


def test_matryoshka_known_vectors(ray_session):
    from markdown_lab_ray.stages.similarity import matryoshka_audit

    # vector [1,0,...,0] retains 100% at every prefix; [0.5]*4 pad 0
    # retains 2/4 at dim 2 → 5000 bp
    v1 = [1.0] + [0.0] * 7
    v2 = [0.5] * 4 + [0.0] * 4
    df = pd.DataFrame({"embedding": [v1, v2]})
    out = matryoshka_audit(rd.from_pandas(df), levels=(4, 2))
    out = out.set_index("dim")
    assert out.loc[4, "mean_retention_bp"] == 10_000     # both full
    # v1: 10000; v2 at dim2: 2·(5e5)²/4·(5e5)² = 5000 → mean 7500
    assert out.loc[2, "mean_retention_bp"] == 7500
    assert (out["n_vecs"] == 2).all()


def test_propagate_deletions_counts(ray_session):
    from markdown_lab_ray.stages.trainprep import propagate_deletions

    dels = rd.from_pandas(pd.DataFrame({"k": [2, 4, 99]}))
    art1 = rd.from_pandas(pd.DataFrame({"doc_id": [1, 2, 3, 4, 2]}))
    art2 = rd.from_pandas(pd.DataFrame({"vec_id": [5, 6]}))
    out = propagate_deletions(dels, [("docs", art1, "doc_id"),
                                     ("vecs", art2, "vec_id")])
    assert out.values.tolist() == [["docs", 5, 3, 2], ["vecs", 2, 0, 2]]


def test_personalized_pagerank_seed_mass(ray_session):
    from markdown_lab_ray.stages.graph import weighted_pagerank_integer

    # path graph 1—2—3 (unit weights both ways), seed {1}: all restart
    # mass enters at node 1 — the hub (2) receives the largest flow,
    # and the seed side (1) strictly dominates the far end (3), which
    # only ever sees second-hand mass
    edges = pd.DataFrame({"src": [1, 2, 2, 3], "dst": [2, 1, 3, 2],
                          "w": [1, 1, 1, 1]})
    out = (weighted_pagerank_integer(rd.from_pandas(edges), n_iter=3,
                                     seeds=[1]).to_pandas()
           .set_index("node")["rank"])
    assert out[2] > out[1] > out[3] > 0
    # without seeds: symmetric graph → node 2 (center) dominates
    full = (weighted_pagerank_integer(rd.from_pandas(edges), n_iter=3)
            .to_pandas().set_index("node")["rank"])
    assert full[2] > full[1] == full[3]
    # seeded scale path (tiny cutoff forces the Pregel loop) agrees
    loop = (weighted_pagerank_integer(rd.from_pandas(edges), n_iter=3,
                                      seeds=[1], small_cutoff=0)
            .to_pandas().set_index("node")["rank"])
    assert loop.sort_index().equals(out.sort_index())


def test_time_weighted_average_trapezoid(ray_session):
    from markdown_lab_ray.stages.analytics import time_weighted_average

    base = pd.Timestamp("2020-01-01")
    df = pd.DataFrame({
        "user_id": [1, 1, 1, 2],
        "ts": [base, base + pd.Timedelta(seconds=10),
               base + pd.Timedelta(seconds=30), base],
        "event_id": [1, 2, 3, 4],
        "value": [1.00, 3.00, 3.00, 9.99]})
    out = (time_weighted_average(rd.from_pandas(df)).to_pandas()
           .set_index("user_id"))
    # user1: seg1 (100+300)*10s + seg2 (300+300)*20s = 4e8+1.2e9 over
    # 2*30s span → (400*1e7 + 600*2e7) // (2*3e7) = 266 cents
    assert out.loc[1, "twap_cents"] == 266
    assert out.loc[1, "span_us"] == 30_000_000
    assert 2 not in out.index          # single sample → zero span


def test_markov_stationary_absorbing_and_flow(ray_session):
    from markdown_lab_ray.stages.analytics import markov_stationary

    # user path A→B→A→B…; C appears only as a terminal (no outgoing):
    # C keeps its mass (absorbing), A/B trade mass evenly
    base = pd.Timestamp("2020-01-01")
    df = pd.DataFrame({
        "user_id": [1] * 5 + [2, 2],
        "ts": [base + pd.Timedelta(seconds=i) for i in range(5)]
        + [base, base + pd.Timedelta(seconds=1)],
        "event_id": range(7),
        "event_type": ["A", "B", "A", "B", "A", "B", "C"]})
    out = markov_stationary(rd.from_pandas(df), n_iter=3).set_index(
        "event_type")["pi"]
    # transitions: A→B ×2, B→A ×2, B→C ×1; C absorbing
    assert out["C"] > 1_000_000          # accumulates leaked mass
    assert out["A"] > 0 and out["B"] > 0
    assert out.sum() <= 3_000_000        # mass conserved (floor losses)


def test_selectivity_estimate_deterministic(ray_session):
    from markdown_lab_ray.stages.analytics import selectivity_estimate

    df = pd.DataFrame({"value": [float(i) for i in range(1, 201)]})
    a = selectivity_estimate(rd.from_pandas(df), "value",
                             lo_cents=5_000, hi_cents=15_000, mod=16)
    b = selectivity_estimate(rd.from_pandas(df).repartition(7), "value",
                             lo_cents=5_000, hi_cents=15_000, mod=16)
    assert a.equals(b)                     # layout independence
    assert a["n_exact"].iloc[0] == 101     # 50.00..150.00
    assert a["n_estimate"].iloc[0] == a["n_sample_hits"].iloc[0] * 16

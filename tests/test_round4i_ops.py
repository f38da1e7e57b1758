"""Round-4i operators: roc_auc, welch_t, association_rules,
as-of nearest direction, cluster_silhouette."""

import numpy as np
import ray.data as rd


def test_roc_auc_tie_aware_hand_case(ray_session):
    import pandas as pd

    from markdown_lab_ray.stages.analytics import roc_auc

    # scores: pos {3, 2, 2}, neg {2, 1}; tie-aware Mann-Whitney:
    # ranks of sorted [1,2,2,2,3] = [1, 3, 3, 3, 5] (average ranks)
    # R+ = 5 + 3 + 3 = 11; AUC = (11 - 3*4/2) / (3*2) = 5/6
    df = pd.DataFrame({"pos": [1, 1, 1, 0, 0],
                       "value": [3.0, 2.0, 2.0, 2.0, 1.0]})
    got = roc_auc(rd.from_pandas(df), "pos", "value").to_pandas()
    assert got["n_pos"].tolist() == [3]
    assert got["n_neg"].tolist() == [2]
    assert got["auc_micro"].tolist() == [
        int(np.floor(1e6 * (5 / 6) + 0.5))]
    # block layout independence (per-batch partials are a combiner)
    got8 = roc_auc(rd.from_pandas(df).repartition(5),
                   "pos", "value").to_pandas()
    assert got.equals(got8)


def test_roc_auc_perfect_and_degenerate(ray_session):
    import pandas as pd

    from markdown_lab_ray.stages.analytics import roc_auc

    sep = pd.DataFrame({"pos": [0, 0, 1, 1],
                        "value": [1.0, 2.0, 3.0, 4.0]})
    assert roc_auc(rd.from_pandas(sep), "pos",
                   "value").to_pandas()["auc_micro"].tolist() == [1000000]
    one = pd.DataFrame({"pos": [1, 1], "value": [1.0, 2.0]})
    got = roc_auc(rd.from_pandas(one), "pos", "value").to_pandas()
    assert got["n_neg"].tolist() == [0]
    assert got["auc_micro"].tolist() == [0]


def test_welch_t_matches_direct_formula(ray_session):
    import pandas as pd

    from markdown_lab_ray.stages.analytics import welch_t

    # integer values so the dollar rounding is the identity
    a = np.array([10, 12, 9, 11, 13], dtype=np.float64)   # side 0
    b = np.array([20, 18, 22, 19], dtype=np.float64)      # side 1
    df = pd.DataFrame({"side": [0] * len(a) + [1] * len(b),
                       "value": np.concatenate([a, b])})
    got = welch_t(rd.from_pandas(df), "side", "value").to_pandas()
    v1, v2 = a.var(ddof=1), b.var(ddof=1)
    se1, se2 = v1 / len(a), v2 / len(b)
    t = (a.mean() - b.mean()) / np.sqrt(se1 + se2)
    dof = (se1 + se2) ** 2 / (se1 ** 2 / (len(a) - 1)
                              + se2 ** 2 / (len(b) - 1))
    assert got["n1"].tolist() == [5] and got["n2"].tolist() == [4]
    assert abs(got["t_micro"].iloc[0] - np.floor(1e6 * t + 0.5)) <= 1
    assert abs(got["df_micro"].iloc[0] - np.floor(1e6 * dof + 0.5)) <= 1
    got3 = welch_t(rd.from_pandas(df).repartition(4),
                   "side", "value").to_pandas()
    assert got.equals(got3)


def test_welch_t_undersized_group_yields_zero(ray_session):
    import pandas as pd

    from markdown_lab_ray.stages.analytics import welch_t

    df = pd.DataFrame({"side": [0, 0, 1], "value": [1.0, 2.0, 3.0]})
    got = welch_t(rd.from_pandas(df), "side", "value").to_pandas()
    assert got["t_micro"].tolist() == [0]
    assert got["df_micro"].tolist() == [0]


def test_association_rules_hand_case(ray_session):
    import pandas as pd

    from markdown_lab_ray.stages.graph import association_rules

    # baskets: 1:{a,b} 2:{a,b,c} 3:{a,c} 4:{b} 5:{a,b} (items as ints
    # a=1 b=2 c=3); duplicate (1,a) row must not double-count
    rows = [(1, 1), (1, 1), (1, 2), (2, 1), (2, 2), (2, 3),
            (3, 1), (3, 3), (4, 2), (5, 1), (5, 2)]
    df = pd.DataFrame(rows, columns=["basket", "item"])
    got = (association_rules(rd.from_pandas(df), "basket", "item",
                             min_support=2)
           .to_pandas().sort_values(["u", "v"]).reset_index(drop=True))
    # pair counts: (1,2)=3, (1,3)=2, (2,3)=1 → min_support=2 keeps 2
    # items: n(1)=4, n(2)=4, n(3)=2; baskets=5
    assert got[["u", "v", "n_uv", "n_u", "n_v"]].values.tolist() == [
        [1, 2, 3, 4, 4], [1, 3, 2, 4, 2]]
    # conf(1→2)=3/4, conf(2→1)=3/4, lift=5*3/(4*4)
    assert got["conf_uv_micro"].tolist() == [750000, 500000]
    assert got["conf_vu_micro"].tolist() == [750000, 1000000]
    assert got["lift_micro"].tolist() == [
        (2_000_000 * 5 * 3 + 16) // 32, (2_000_000 * 5 * 2 + 8) // 16]
    # block / bucket layout independence
    got2 = (association_rules(rd.from_pandas(df).repartition(6),
                              "basket", "item", min_support=2,
                              n_buckets=3)
            .to_pandas().sort_values(["u", "v"]).reset_index(drop=True))
    assert got.equals(got2)


def test_asof_nearest_matches_pandas_and_ties_backward(ray_session):
    import pandas as pd

    from markdown_lab_ray.stages.joins import bucketed_asof_join

    left = pd.DataFrame({"k": [1, 1, 1, 2], "lt": [5, 10, 14, 7],
                         "lid": [0, 1, 2, 3]})
    right = pd.DataFrame({"k": [1, 1, 2], "rt": [4, 16, 100],
                          "rv": [40, 160, 1000]})
    got = (bucketed_asof_join(
        rd.from_pandas(left), rd.from_pandas(right), key="k",
        left_on="lt", right_on="rt", n_buckets=2, direction="nearest")
        .to_pandas().sort_values("lid").reset_index(drop=True))
    exp = pd.merge_asof(left.sort_values("lt"), right.sort_values("rt"),
                        left_on="lt", right_on="rt", by="k",
                        direction="nearest").sort_values("lid")
    assert got["rv"].tolist() == exp["rv"].tolist()
    # lt=10 is equidistant from rt=4 (back 6) and rt=16 (fwd 6):
    # ties resolve backward → rv=40
    assert got.loc[got["lid"] == 1, "rv"].tolist() == [40]


def test_cluster_silhouette_hand_case(ray_session):
    import pandas as pd

    from markdown_lab_ray.stages.similarity import cluster_silhouette

    cents = np.array([[0.0, 0.0], [10.0, 0.0]])
    cids = np.array([7, 3])
    pts = np.array([[1.0, 0.0], [2.0, 0.0], [9.0, 0.0]])
    df = pd.DataFrame({"vec_id": [0, 1, 2],
                       "embedding": [list(p) for p in pts]})
    got = (cluster_silhouette(rd.from_pandas(df), cents, cids)
           .to_pandas().sort_values("centroid").reset_index(drop=True))
    # pt0: a=1 b=9 s=8/9; pt1: a=2 b=8 s=6/8; pt2: a=1 b=9 s=8/9
    s0 = int(np.floor(1e6 * (8 / 9) + 0.5))
    s1 = int(np.floor(1e6 * (6 / 8) + 0.5))
    assert got["centroid"].tolist() == [3, 7]
    assert got["n"].tolist() == [1, 2]
    assert got["sum_s_micro"].tolist() == [s0, s0 + s1]
    got4 = (cluster_silhouette(rd.from_pandas(df).repartition(3),
                               cents, cids)
            .to_pandas().sort_values("centroid").reset_index(drop=True))
    assert got.equals(got4)


def test_setsim_join_hand_case_and_paths(ray_session):
    import pandas as pd
    import pytest

    from markdown_lab_ray.stages.dedup import setsim_join

    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": ["the cat sat on the mat",        # {the,cat,sat,on,mat}
                 "the cat sat on a mat",          # {the,cat,sat,on,a,mat}
                 "dogs bark loudly",              # disjoint
                 "THE CAT SAT ON THE MAT!"]})     # == doc 1 tokens
    import ray.data as rd
    got = setsim_join(rd.from_pandas(docs), tau_micro=700000)
    # (1,2): inter=5 union=6 jac=5/6; (1,4): identical sets jac=1;
    # (2,4): 5/6; doc 3 matches nothing
    assert got[["a", "b"]].values.tolist() == [[1, 2], [1, 4], [2, 4]]
    assert got["inter_n"].tolist() == [5, 5, 5]
    assert got["union_n"].tolist() == [6, 5, 6]
    jac56 = (2_000_000 * 5 + 6) // 12
    assert got["jac_micro"].tolist() == [jac56, 1_000_000, jac56]
    # distributed path (small_cutoff=0) must match the fast path
    dist = setsim_join(rd.from_pandas(docs).repartition(3),
                       tau_micro=700000, n_buckets=4,
                       n_pair_buckets=4, small_cutoff=0)
    assert got.equals(dist)
    # threshold strictness: tau just above 5/6 drops the 5/6 pairs
    hi = setsim_join(rd.from_pandas(docs), tau_micro=833334)
    assert hi[["a", "b"]].values.tolist() == [[1, 4]]
    with pytest.raises(ValueError, match="tau_micro"):
        setsim_join(rd.from_pandas(docs), tau_micro=0)


def test_setsim_join_empty_and_no_matches(ray_session):
    import pandas as pd
    import ray.data as rd

    from markdown_lab_ray.stages.dedup import setsim_join

    docs = pd.DataFrame({"doc_id": [1, 2, 3],
                         "text": ["alpha beta", "gamma delta", ""]})
    got = setsim_join(rd.from_pandas(docs), tau_micro=500000)
    assert len(got) == 0
    assert list(got.columns) == ["a", "b", "inter_n", "union_n",
                                 "jac_micro"]
    # distributed path agrees on the empty result
    dist = setsim_join(rd.from_pandas(docs), tau_micro=500000,
                       n_buckets=2, small_cutoff=0)
    assert len(dist) == 0


def test_sssp_bounded_hand_case_and_paths(ray_session):
    import pandas as pd
    import pytest

    from markdown_lab_ray.stages.graph import sssp_bounded

    # 1→2 (w=10), 2→3 (w=1), 1→3 (w=100), 3→1 (w=1, cycle),
    # 4→5 (w=7, disconnected from source 1)
    edges = pd.DataFrame({"src": [1, 2, 1, 3, 4],
                          "dst": [2, 3, 3, 1, 5],
                          "w": [10, 1, 100, 1, 7]})
    ds = rd.from_pandas(edges)
    got = (sssp_bounded(ds, source=1, rounds=4).to_pandas()
           .sort_values("node").reset_index(drop=True))
    # shortest: d(1)=0, d(2)=10, d(3)=11 (via 2, 2 hops); 4/5 unreached
    assert got["node"].tolist() == [1, 2, 3]
    assert got["dist"].tolist() == [0, 10, 11]
    # hop bound: 1 round only reaches direct edges (3 costs 100)
    one = (sssp_bounded(ds, source=1, rounds=1).to_pandas()
           .sort_values("node").reset_index(drop=True))
    assert one["dist"].tolist() == [0, 10, 100]
    # distributed path equals the fast path
    dist = (sssp_bounded(ds.repartition(3), source=1, rounds=4,
                         n_buckets=2, small_cutoff=0).to_pandas()
            .sort_values("node").reset_index(drop=True))
    assert got.equals(dist)
    with pytest.raises(ValueError, match="rounds"):
        sssp_bounded(ds, source=1, rounds=0)


def test_sssp_bounded_missing_source_empty(ray_session):
    import pandas as pd

    from markdown_lab_ray.stages.graph import sssp_bounded

    edges = pd.DataFrame({"src": [1], "dst": [2], "w": [5]})
    got = sssp_bounded(rd.from_pandas(edges), source=99,
                       rounds=2).to_pandas()
    assert len(got) == 0


def test_last_touch_attribution_hand_case(ray_session):
    import pandas as pd

    from markdown_lab_ray.stages.analytics import last_touch_attribution

    base = pd.Timestamp("2024-01-01")
    # user 1: view, click, purchase(10) → click; purchase(5) with only
    #   purchases before it in between → still click (ffill skips conv)
    # user 2: purchase(7) with no prior touch → (none)
    # user 3: ts tie between view(id 8) and click(id 9) then purchase
    #   → id order breaks the tie, click is later → click
    rows = [
        (1, 0, 1, "view", 0.0), (2, 1, 1, "click", 0.0),
        (3, 2, 1, "purchase", 10.0), (4, 3, 1, "purchase", 5.0),
        (5, 0, 2, "purchase", 7.0),
        (8, 0, 3, "view", 0.0), (9, 0, 3, "click", 0.0),
        (10, 1, 3, "purchase", 2.0),
    ]
    df = pd.DataFrame(rows, columns=["event_id", "d", "user_id",
                                     "event_type", "value"])
    df["ts"] = base + pd.to_timedelta(df["d"], unit="h")
    got = last_touch_attribution(rd.from_pandas(df)).to_pandas()
    assert got["touch_type"].tolist() == ["(none)", "click"]
    assert got["attr_cents"].tolist() == [700, 1700]
    assert got["n_conv"].tolist() == [1, 3]
    # layout independence
    got2 = last_touch_attribution(rd.from_pandas(df).repartition(5),
                                  n_buckets=3).to_pandas()
    assert got.equals(got2)


def test_gains_table_hand_case(ray_session):
    import pandas as pd

    from markdown_lab_ray.stages.analytics import gains_table

    # scores 10..1 (ids 1..10), positives at scores 10, 9, 2
    df = pd.DataFrame({"event_id": range(1, 11),
                       "pos": [1, 1, 0, 0, 0, 0, 0, 0, 1, 0],
                       "value": [10.0, 9.0, 8.0, 7.0, 6.0,
                                 5.0, 4.0, 3.0, 2.0, 1.0]})
    got = gains_table(rd.from_pandas(df), "pos", "value", "event_id",
                      n_tiles=5).to_pandas()
    assert got["tile"].tolist() == [0, 1, 2, 3, 4]
    assert got["n"].tolist() == [2] * 5
    assert got["n_pos"].tolist() == [2, 0, 0, 0, 1]
    assert got["pos_rate_micro"].tolist() == [1000000, 0, 0, 0, 500000]
    # cumulative capture of the 3 positives: 2/3, 2/3, 2/3, 2/3, 3/3
    c23 = (2_000_000 * 2 + 3) // 6
    assert got["cum_capture_micro"].tolist() == [c23] * 4 + [1000000]
    got2 = gains_table(rd.from_pandas(df).repartition(4), "pos",
                       "value", "event_id", n_tiles=5).to_pandas()
    assert got.equals(got2)


def test_pmi_bigrams_hand_case(ray_session):
    import pandas as pd
    import pytest

    from markdown_lab_ray.stages.text import pmi_bigrams

    docs = pd.DataFrame({"doc_id": [1, 2],
                         "text": ["big data big data", "big apple"]})
    # tokens: N1=6; bigrams: (big,data)x2 (data,big)x1 (big,apple)x1 N2=4
    # counts: big=3 data=2 apple=1
    got = pmi_bigrams(rd.from_pandas(docs), min_count=1, top_k=10)
    assert len(got) == 3
    import numpy as np

    def pmi(nxy, nx, ny, n1=6, n2=4):
        return int(np.floor(1e6 * np.log((nxy / n2)
                                         / ((nx / n1) * (ny / n1))) + 0.5))
    exp = {("big", "apple"): pmi(1, 3, 1),
           ("big", "data"): pmi(2, 3, 2),
           ("data", "big"): pmi(1, 2, 3)}
    for _, r in got.iterrows():
        assert exp[(r["w1"], r["w2"])] == r["pmi_micro"]
        # (pmi desc, w1, w2) order
    assert got["pmi_micro"].is_monotonic_decreasing
    # min_count gate drops singletons
    only2 = pmi_bigrams(rd.from_pandas(docs), min_count=2, top_k=10)
    assert only2[["w1", "w2"]].values.tolist() == [["big", "data"]]
    with pytest.raises(ValueError, match="min_count"):
        pmi_bigrams(rd.from_pandas(docs), min_count=0)
    # empty corpus
    empty = pd.DataFrame({"doc_id": [1], "text": [""]})
    assert len(pmi_bigrams(rd.from_pandas(empty), min_count=1)) == 0


def test_kmeans_lloyd_hand_case(ray_session):
    import pandas as pd
    import pytest

    from markdown_lab_ray.stages.similarity import kmeans_lloyd

    # seeds (two smallest ids): c0 = [0,0], c1 = [10,0].
    # points: [0,0],[10,0],[1,0],[2,0],[9,0],[6,0]
    # iter1 assigns {0,1,2} (closer to 0) vs {10,9,6}:
    #   c0' = mean(0,1,2)=1, c1' = mean(10,9,6)=25/3
    # iter2: point 6 is nearer 25/3? |6-1|=5 > |6-25/3|=2.33 → stays;
    #   point 2: |2-1|=1 < |2-25/3| → stays. Same partition.
    df = pd.DataFrame({
        "vec_id": [1, 2, 3, 4, 5, 6],
        "embedding": [[0.0, 0.0], [10.0, 0.0], [1.0, 0.0],
                      [2.0, 0.0], [9.0, 0.0], [6.0, 0.0]]})
    got = kmeans_lloyd(rd.from_pandas(df), k=2, iters=2)
    # final sums: cell0 = {0,1,2}: dim1 s=3e6, dim2 0, n=3
    #             cell1 = {10,9,6}: dim1 s=25e6, n=3
    assert got.values.tolist() == [
        [0, 1, 3_000_000, 3], [0, 2, 0, 3],
        [1, 1, 25_000_000, 3], [1, 2, 0, 3]]
    got2 = kmeans_lloyd(rd.from_pandas(df).repartition(4), k=2, iters=2)
    assert got.equals(got2)
    with pytest.raises(ValueError, match="k >= 1"):
        kmeans_lloyd(rd.from_pandas(df), k=0)


def test_kmeans_lloyd_empty_cell_drops_and_seed_survives(ray_session):
    import pandas as pd

    from markdown_lab_ray.stages.similarity import kmeans_lloyd

    # both non-seed points sit on seed 1; seed 2's cell keeps only
    # itself (never empties since the seed is in the corpus)
    df = pd.DataFrame({"vec_id": [1, 2, 3],
                       "embedding": [[0.0], [100.0], [1.0]]})
    got = kmeans_lloyd(rd.from_pandas(df), k=2, iters=1)
    assert got.values.tolist() == [[0, 1, 1_000_000, 2],
                                   [1, 1, 100_000_000, 1]]


def test_logistic_gd_matches_local_reference(ray_session):
    import pandas as pd
    import pytest

    from markdown_lab_ray.stages.analytics import logistic_gd

    rng = np.random.RandomState(7)
    x1 = rng.uniform(-2, 2, 40)
    y = (x1 > 0.3).astype(np.int64)
    df = pd.DataFrame({"x1": x1, "y": y})
    got = logistic_gd(rd.from_pandas(df), ["x1"], "y",
                      iters=3, lr=0.1)
    # local replica of the exact contract
    w = np.zeros(2)
    n = len(df)
    for _ in range(3):
        z = np.full(n, w[0]) + w[1] * x1
        p = 1.0 / (1.0 + np.exp(-z))
        g0 = int(np.floor(((p - y) * 1.0) * 1e6 + 0.5).astype(
            np.int64).sum())
        g1 = int(np.floor(((p - y) * x1) * 1e6 + 0.5).astype(
            np.int64).sum())
        last = [g0, g1]
        w = w - 0.1 * ((np.array([g0, g1], np.float64) / 1e6) / n)
    assert got["dim"].tolist() == [0, 1]
    assert got["w_micro"].tolist() == [
        int(np.floor(w[0] * 1e6 + 0.5)), int(np.floor(w[1] * 1e6 + 0.5))]
    assert got["grad_micro"].tolist() == last
    # separable data: positive slope after descent
    assert got["w_micro"].iloc[1] > 0
    # layout independence (per-row quantization makes sums exact)
    got2 = logistic_gd(rd.from_pandas(df).repartition(8), ["x1"], "y",
                       iters=3, lr=0.1)
    assert got.equals(got2)
    with pytest.raises(ValueError, match="iters"):
        logistic_gd(rd.from_pandas(df), ["x1"], "y", iters=0)


def test_knn_ivf_accepts_lloyd_trained_centroids(ray_session):
    import pandas as pd

    from markdown_lab_ray.stages.similarity import kmeans_lloyd, knn_ivf

    rng = np.random.RandomState(0)
    # two tight clusters around +e1 and -e1
    a = rng.normal(0, 0.05, (30, 4)) + np.array([1, 0, 0, 0])
    b = rng.normal(0, 0.05, (30, 4)) + np.array([-1, 0, 0, 0])
    vecs = np.vstack([a, b])
    df = pd.DataFrame({"vec_id": range(60),
                       "embedding": [list(v) for v in vecs]})
    ds = rd.from_pandas(df)
    state = kmeans_lloyd(ds, k=2, iters=2)
    cents = np.stack([
        (state[state["cell"] == c].sort_values("dim")["s_micro"]
         .to_numpy(np.int64).astype(np.float64)
         / (1e6 * state[state["cell"] == c]["n"].iloc[0]))
        for c in sorted(state["cell"].unique())])
    got = knn_ivf(ds, [1.0, 0.0, 0.0, 0.0], k=5, n_lists=2, n_probe=1,
                  centroids=cents)
    # probing the +e1 list only: all hits from the first cluster
    assert (got["vec_id"] < 30).all() and len(got) == 5


def test_setsim_clusters_transitive(ray_session):
    import pandas as pd

    from markdown_lab_ray.stages.dedup import (
        connected_components_distributed,
        setsim_join,
    )

    # A~B (9/10), B~C (9/10), but A vs C = 8/11 < 0.8 — transitivity
    # through B must still merge all three; D is a singleton
    w = [f"w{i}" for i in range(12)]
    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": [" ".join(w[0:10]),          # A: w0..w9
                 " ".join(w[1:10] + [w[10]]),  # B: w1..w10
                 " ".join(w[2:10] + [w[10], w[11]]),  # C: w2..w11
                 "zebra yak"]})
    pairs = setsim_join(rd.from_pandas(docs), tau_micro=800000,
                        as_dataset=True)
    edges = pairs.map_batches(
        lambda b: b.select(["a", "b"]).rename_columns(["u", "v"]),
        batch_format="pyarrow")
    ids = rd.from_pandas(docs[["doc_id"]])
    labels = (connected_components_distributed(edges, ids_ds=ids)
              .to_pandas().sort_values("node").reset_index(drop=True))
    assert labels["label"].tolist() == [1, 1, 1, 4]


def test_peak_concurrency_hand_case(ray_session):
    import pandas as pd
    import pytest

    from markdown_lab_ray.stages.analytics import peak_concurrency

    base = pd.Timestamp("2024-01-01")
    # user 1: events at t=0, 10, 25 min with 30-min windows →
    #   all three overlap at t=25 → peak 3
    # user 2: t=0 and t=30 min exactly — half-open: no overlap → 1
    rows = [(1, 1, 0), (2, 1, 10), (3, 1, 25), (4, 2, 0), (5, 2, 30)]
    df = pd.DataFrame(rows, columns=["event_id", "user_id", "m"])
    df["ts"] = base + pd.to_timedelta(df["m"], unit="m")
    got = (peak_concurrency(rd.from_pandas(df),
                            dur_us=30 * 60 * 1_000_000)
           .to_pandas().sort_values("user_id").reset_index(drop=True))
    assert got["peak"].tolist() == [3, 1]
    got2 = (peak_concurrency(rd.from_pandas(df).repartition(4),
                             dur_us=30 * 60 * 1_000_000, n_buckets=2)
            .to_pandas().sort_values("user_id").reset_index(drop=True))
    assert got.equals(got2)
    with pytest.raises(ValueError, match="dur_us"):
        peak_concurrency(rd.from_pandas(df), dur_us=0)


def test_als_rank1_hand_case(ray_session):
    import pandas as pd

    from markdown_lab_ray.stages.analytics import als_rank1

    # ratings: u1: a×2, b×1 → u=3/2; u2: a×1 → u=1/1
    rows = [(1, "a"), (1, "a"), (1, "b"), (2, "a")]
    df = pd.DataFrame(rows, columns=["user_id", "event_type"])
    got = als_rank1(rd.from_pandas(df)).to_dict("records")
    # item a: num = q(2·1.5) + q(1·1) = 3e6 + 1e6; den = q(2.25)+q(1)
    na, da = 3_000_000 + 1_000_000, 2_250_000 + 1_000_000
    # item b: num = q(1·1.5); den = q(2.25)
    nb, db = 1_500_000, 2_250_000
    assert got[0] == {"item": "a", "n_raters": 2, "num_micro": na,
                      "den_micro": da,
                      "v_micro": (2_000_000 * na + da) // (2 * da)}
    assert got[1] == {"item": "b", "n_raters": 1, "num_micro": nb,
                      "den_micro": db,
                      "v_micro": (2_000_000 * nb + db) // (2 * db)}
    got2 = als_rank1(rd.from_pandas(df).repartition(3),
                     n_buckets=2).to_dict("records")
    assert got == got2


def test_salted_hash_join_equals_unsalted(ray_session):
    import pandas as pd
    import pytest

    from markdown_lab_ray.stages.joins import (
        bucketed_hash_join,
        salted_hash_join,
    )

    rng = np.random.RandomState(3)
    # key 7 is hot: 60 of 80 left rows
    keys = np.where(rng.uniform(size=80) < 0.75, 7,
                    rng.randint(0, 5, 80))
    left = pd.DataFrame({"k": keys.astype("int64"),
                         "rid": np.arange(80, dtype="int64"),
                         "x": rng.randint(0, 100, 80).astype("int64")})
    right = pd.DataFrame({"k": np.arange(0, 8, dtype="int64"),
                          "y": (np.arange(0, 8) * 10).astype("int64")})
    a = (salted_hash_join(rd.from_pandas(left), rd.from_pandas(right),
                          key="k", salt_col="rid", n_salt=4, n_buckets=4)
         .to_pandas().sort_values(["rid"]).reset_index(drop=True))
    b = (bucketed_hash_join(rd.from_pandas(left), rd.from_pandas(right),
                            key="k", n_buckets=4)
         .to_pandas().sort_values(["rid"]).reset_index(drop=True))
    assert a.equals(b)
    assert len(a) == 80  # every left key matched
    # layout independence
    c = (salted_hash_join(rd.from_pandas(left).repartition(5),
                          rd.from_pandas(right), key="k",
                          salt_col="rid", n_salt=3, n_buckets=2)
         .to_pandas().sort_values(["rid"]).reset_index(drop=True))
    assert a.equals(c)
    with pytest.raises(ValueError, match="n_salt"):
        salted_hash_join(rd.from_pandas(left), rd.from_pandas(right),
                         key="k", salt_col="rid", n_salt=0)
    with pytest.raises(ValueError, match="salt_col"):
        salted_hash_join(rd.from_pandas(left), rd.from_pandas(right),
                         key="k", salt_col="y")


def _bpe_local(texts, n_merges):
    import re
    freq = {}
    for t in texts:
        for w in re.findall(r"[a-z0-9]+", t.lower()):
            freq[w] = freq.get(w, 0) + 1
    vocab = {tuple(list(w) + ["</w>"]): n for w, n in freq.items()}
    merges = []
    for rank in range(n_merges):
        cnt = {}
        for syms, n in vocab.items():
            for p in zip(syms, syms[1:]):
                cnt[p] = cnt.get(p, 0) + n
        if not cnt:
            break
        best = min(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < 2:
            break
        (a, b), n = best
        merges.append((rank, a, b, n))
        new = {}
        for syms, cn in vocab.items():
            res, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i+1] == b:
                    res.append(a + b); i += 2
                else:
                    res.append(syms[i]); i += 1
            new[tuple(res)] = new.get(tuple(res), 0) + cn
        vocab = new
    return merges


def test_bpe_train_matches_local_replica(ray_session):
    import pandas as pd
    import pytest

    from markdown_lab_ray.stages.text import bpe_train

    texts = ["low lower lowest", "new newer newest newest",
             "low low new", "widest wide wider"]
    df = pd.DataFrame({"doc_id": range(4), "text": texts})
    got = bpe_train(rd.from_pandas(df), n_merges=8)
    exp = _bpe_local(texts, 8)
    assert [tuple(r) for r in got.values.tolist()] == exp
    # layout independence
    got2 = bpe_train(rd.from_pandas(df).repartition(3), n_merges=8)
    assert got.equals(got2)
    # early stop: corpus with no repeating pair
    tiny = pd.DataFrame({"doc_id": [0], "text": ["ab"]})
    assert len(bpe_train(rd.from_pandas(tiny), n_merges=5)) == 0
    with pytest.raises(ValueError, match="n_merges"):
        bpe_train(rd.from_pandas(df), n_merges=0)


def test_incremental_agg_equals_full_recompute(ray_session):
    import pandas as pd
    import pyarrow as pa

    from markdown_lab_ray.stages.analytics import incremental_agg

    base_raw = pd.DataFrame({"k": [1, 1, 2], "value": [1.0, 2.5, 4.0]})
    delta = pd.DataFrame({"k": [1, 3], "value": [0.5, 7.0]})
    base_agg = rd.from_arrow(pa.table({
        "k": pa.array([1, 2], pa.int64()),
        "n": pa.array([2, 1], pa.int64()),
        "sum_cents": pa.array([350, 400], pa.int64())}))
    got = (incremental_agg(base_agg, rd.from_pandas(delta), "k", "value")
           .to_pandas().sort_values("k").reset_index(drop=True))
    # full recompute: k1 n=3 c=400; k2 n=1 c=400; k3 n=1 c=700
    assert got["n"].tolist() == [3, 1, 1]
    assert got["sum_cents"].tolist() == [400, 400, 700]


def test_zorder_index_interleave_and_bounds(ray_session):
    import pandas as pd
    import pytest

    from markdown_lab_ray.stages.analytics import zorder_index

    df = pd.DataFrame({"x": [0, 1, 2, 3, 5], "y": [0, 1, 1, 0, 3]})
    got = (zorder_index(rd.from_pandas(df), "x", "y", bits=4)
           .to_pandas())
    # morton(x,y): x bits even, y bits odd
    # (0,0)=0 (1,1)=3 (2,1)=6 (3,0)=5 (5,3)=0b100111=39... check:
    # x=5=101 -> bits at 0,4; y=3=11 -> bits at 1,3 => 1+2+8+16=27? no:
    # x bit0=1->z0, x bit2=1->z4; y bit0=1->z1, y bit1=1->z3
    # z = 1 + 2 + 8 + 16 = 27
    assert got["zval"].tolist() == [0, 3, 6, 5, 27]
    with pytest.raises(Exception, match="outside"):
        zorder_index(rd.from_pandas(pd.DataFrame(
            {"x": [20], "y": [0]})), "x", "y", bits=4).to_pandas()
    with pytest.raises(ValueError, match="bits"):
        zorder_index(rd.from_pandas(df), "x", "y", bits=0)


def test_pruning_stats_hand_case(ray_session):
    import pandas as pd
    import pytest

    from markdown_lab_ray.stages.analytics import pruning_stats

    # 8 rows, blocks of 4 in id order: block0 x∈[0,3], block1 x∈[10,13]
    df = pd.DataFrame({"rid": range(8),
                       "x": [0, 1, 2, 3, 10, 11, 12, 13],
                       "y": [5] * 8})
    got = pruning_stats(rd.from_pandas(df), ["rid"], "x", "y",
                        x_lo=10, x_hi=20, y_lo=0, y_hi=9,
                        rows_per_block=4).to_pandas()
    # block0's x range misses [10,20] → pruned; block1 overlaps
    assert got.values.tolist() == [[2, 1, 4]]
    # y predicate misses everything → both blocks pruned
    got2 = pruning_stats(rd.from_pandas(df), ["rid"], "x", "y",
                         x_lo=0, x_hi=20, y_lo=6, y_hi=9,
                         rows_per_block=4).to_pandas()
    assert got2.values.tolist() == [[2, 2, 8]]
    with pytest.raises(ValueError, match="rows_per_block"):
        pruning_stats(rd.from_pandas(df), ["rid"], "x", "y",
                      0, 1, 0, 1, rows_per_block=0)


def test_grid_density_clusters_hand_case(ray_session):
    import pandas as pd
    import pytest

    from markdown_lab_ray.stages.similarity import grid_density_clusters

    rng = np.random.RandomState(1)
    # blob A spans cells around origin; blob B far away; one lone point
    pts = np.vstack([rng.uniform(0, 0.4, (20, 2)),
                     rng.uniform(2.0, 2.4, (20, 2)),
                     [[10.0, 10.0]]])
    df = pd.DataFrame({"vec_id": range(len(pts)),
                       "embedding": [list(p) + [0.0] for p in pts]})
    got = grid_density_clusters(rd.from_pandas(df), eps=0.25, min_pts=3)
    # two clusters; the lone point's cell (and <min_pts cells) drop
    assert got["cluster_id"].nunique() == 2
    assert ((10.0 // 0.25) not in got["cx"].tolist())
    # each blob's dense cells land in one component; blob A cells
    # have cx ≤ 1, blob B cells cx ≥ 8 — labels must split exactly there
    lab_by_side = got.groupby(got["cx"] >= 8)["cluster_id"].nunique()
    assert lab_by_side.tolist() == [1, 1]
    # layout independence
    got2 = grid_density_clusters(rd.from_pandas(df).repartition(5),
                                 eps=0.25, min_pts=3)
    assert got.equals(got2)
    with pytest.raises(ValueError, match="min_pts"):
        grid_density_clusters(rd.from_pandas(df), min_pts=0)
    with pytest.raises(ValueError, match="eps"):
        grid_density_clusters(rd.from_pandas(df), eps=0.0)
    # out-of-range coordinates raise, never wrap
    far = pd.DataFrame({"vec_id": [0],
                        "embedding": [[1e7, 0.0, 0.0]]})
    with pytest.raises(Exception, match="2\\^20"):
        grid_density_clusters(rd.from_pandas(far), eps=0.25,
                              min_pts=1)


def test_local_supplier_revenue_matches_duckdb_sf0001(ray_session):
    import duckdb

    import __ray_entry__ as E

    sf = "/root/testdata/sf0.001"
    got = E.queries()["local_supplier_revenue"](sf)
    con = duckdb.connect()
    for t in ["customer", "orders", "lineitem", "supplier",
              "nation", "region"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    exp = con.execute(
        E.oracle_sql()["local_supplier_revenue"]).df()
    assert got["n_name"].tolist() == exp["n_name"].tolist()
    assert got["revenue_cents"].tolist() == [
        int(v) for v in exp["revenue_cents"]]

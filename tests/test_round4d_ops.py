"""Round-4d additions: forward as-of join, discovery curve,
chi-square independence, k-means assignment, image channel stats."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd


# ---------------------------------------------------------------------------
# bucketed_asof_join direction="forward"
# ---------------------------------------------------------------------------

def test_asof_forward_picks_next_at_or_after(ray_session):
    from markdown_lab_ray.stages.joins import bucketed_asof_join

    left = rd.from_arrow(pa.table({
        "k": pa.array([1, 1, 1, 2], pa.int64()),
        "lt": pa.array([5, 20, 31, 7], pa.int64()),
        "lid": pa.array([0, 1, 2, 3], pa.int64()),
    }))
    right = rd.from_arrow(pa.table({
        "k": pa.array([1, 1, 2], pa.int64()),
        "rt": pa.array([10, 30, 7], pa.int64()),
        "pay": pa.array([100, 300, 700], pa.int64()),
    }))
    out = (bucketed_asof_join(left, right, key="k", left_on="lt",
                              right_on="rt", direction="forward")
           .to_pandas().sort_values("lid"))
    # lt=5 -> rt=10; lt=20 -> rt=30; lt=31 -> unmatched (inner drops);
    # lt=7 matches rt=7 (inclusive)
    assert out["lid"].tolist() == [0, 1, 3]
    assert out["pay"].tolist() == [100, 300, 700]


def test_asof_direction_validated(ray_session):
    from markdown_lab_ray.stages.joins import bucketed_asof_join

    ds = rd.from_arrow(pa.table({"k": pa.array([1], pa.int64()),
                                 "t": pa.array([1], pa.int64())}))
    with pytest.raises(ValueError, match="direction"):
        bucketed_asof_join(ds, ds, key="k", left_on="t", right_on="t",
                           direction="sideways")


# ---------------------------------------------------------------------------
# discovery_curve
# ---------------------------------------------------------------------------

def test_discovery_curve_running_distinct(ray_session):
    from markdown_lab_ray.stages.analytics import discovery_curve

    t = pa.table({
        "id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "ts": pa.array([10, 20, 30, 40, 10], pa.int64()),
        "u": pa.array([7, 7, 7, 7, 9], pa.int64()),
        "c": pa.array(["a", "b", "a", "c", "z"]),
    })
    out = (discovery_curve(rd.from_arrow(t).repartition(3),
                           "u", "c", "ts", "id")
           .to_pandas().sort_values("id"))
    assert out["n_distinct"].tolist() == [1, 2, 2, 3, 1]


# ---------------------------------------------------------------------------
# chi_square_independence
# ---------------------------------------------------------------------------

def test_chi_square_matches_local_formula_with_zero_cells(ray_session):
    from markdown_lab_ray.stages.analytics import chi_square_independence

    rng = np.random.RandomState(11)
    n = 600
    a = rng.choice(["x", "y", "z"], n)
    b = rng.choice([0, 1, 2, 3], n).astype(np.int64)
    b[a == "z"] = rng.choice([0, 1], (a == "z").sum())  # zero cells
    t = pa.table({"a": pa.array(a), "b": pa.array(b)})
    out = (chi_square_independence(rd.from_arrow(t).repartition(5),
                                   "a", "b")
           .to_pandas().iloc[0])

    piv = (pd.DataFrame({"a": a, "b": b}).groupby(["a", "b"])
           .size().unstack(fill_value=0))
    obs = piv.to_numpy(np.float64)
    exp = obs.sum(1, keepdims=True) @ obs.sum(0, keepdims=True) / obs.sum()
    chi2 = ((obs - exp) ** 2 / exp).sum()
    assert out["chi2_micro"] == int(np.floor(chi2 * 1e6 + 0.5))
    assert out["dof"] == (piv.shape[0] - 1) * (piv.shape[1] - 1)
    assert out["n"] == n


def test_chi_square_independent_uniform_is_small(ray_session):
    from markdown_lab_ray.stages.analytics import chi_square_independence

    # perfectly balanced table -> chi2 exactly 0
    a = ["p", "q"] * 50
    b = ([0] * 50 + [1] * 50)
    t = pa.table({"a": pa.array(a), "b": pa.array(b, pa.int64())})
    out = chi_square_independence(rd.from_arrow(t), "a", "b").to_pandas()
    assert out["chi2_micro"].iloc[0] == 0


# ---------------------------------------------------------------------------
# kmeans_assign
# ---------------------------------------------------------------------------

def test_kmeans_assign_nearest_and_tie_break(ray_session):
    from markdown_lab_ray.stages.similarity import kmeans_assign

    cents = np.array([[0.0, 0.0], [10.0, 0.0]])
    cids = np.array([5, 2], dtype=np.int64)
    vecs = pa.table({
        "vec_id": pa.array([1, 2, 3], pa.int64()),
        "embedding": pa.array([[1.0, 0.0], [9.0, 0.0], [5.0, 0.0]],
                              pa.list_(pa.float32())),
    })
    out = (kmeans_assign(rd.from_arrow(vecs), cents, cids)
           .to_pandas().sort_values("vec_id"))
    # vec 3 is exactly equidistant -> smaller centroid id (2) wins
    assert out["centroid"].tolist() == [5, 2, 2]
    assert out["dist"].tolist() == [1.0, 1.0, 5.0]


# ---------------------------------------------------------------------------
# channel_stats
# ---------------------------------------------------------------------------

def _images(n=24):
    from markdown_lab_ray.sources.synth import SiteSpec, build_images_table
    return build_images_table(SiteSpec(n_images=n))


def test_channel_stats_layout_invariant_and_exact(ray_session):
    from markdown_lab_ray.stages.images import channel_stats, fake_decode

    t = _images()
    a = channel_stats(rd.from_arrow(t)).to_pandas()
    b = channel_stats(rd.from_arrow(t).repartition(7)).to_pandas()
    pd.testing.assert_frame_equal(a, b)  # exact integer moments

    # single-process twin
    n = 0
    s = np.zeros(3, np.int64)
    q = np.zeros(3, np.int64)
    for data in t.column("bytes").to_pylist():
        px, _ = fake_decode(data)
        flat = px.reshape(-1, 3).astype(np.int64)
        n += flat.shape[0]
        s += flat.sum(0)
        q += (flat * flat).sum(0)
    row = a.iloc[0]
    assert row["n_pixels"] == n
    for i, ch in enumerate("rgb"):
        mean = s[i] / n
        var = q[i] / n - mean * mean
        assert row[f"mean_{ch}_micro"] == int(np.floor(mean * 1e6 + 0.5))
        assert row[f"std_{ch}_micro"] == int(
            np.floor(np.sqrt(max(var, 0.0)) * 1e6 + 0.5))

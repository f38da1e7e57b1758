"""Image–caption alignment scoring (stages/align.py): twin-exactness
vs a single-process numpy recompute, layout invariance, per-row error
tolerance, and the fused threshold gate."""

import numpy as np
import pyarrow as pa


def _images_table(n=60):
    from markdown_lab_ray.sources.synth import SiteSpec, build_images_table

    return build_images_table(SiteSpec(n_images=n))


def _local_scores(table: pa.Table, dim=64, seed=7):
    """Single-process twin: same math, no Ray."""
    from markdown_lab_ray.stages.align import (
        _image_features,
        _text_features,
        CaptionAlignScorer,
    )
    from markdown_lab_ray.stages.images import fake_decode

    scorer = CaptionAlignScorer(dim=dim, seed=seed)
    out = {}
    for row in table.to_pylist():
        t = _text_features(row["caption"]) @ scorer.text_proj
        v = _image_features(fake_decode(row["bytes"])[0]) @ scorer.img_proj
        t /= max(np.linalg.norm(t), 1e-12)
        v /= max(np.linalg.norm(v), 1e-12)
        out[row["image_id"]] = float(t @ v)
    return out


def test_alignment_matches_local_twin(ray_session):
    import ray.data as rd

    from markdown_lab_ray.stages.align import score_caption_alignment

    table = _images_table()
    want = _local_scores(table)
    got = score_caption_alignment(
        rd.from_arrow(table).repartition(5)).take_all()
    assert len(got) == table.num_rows
    for row in got:
        assert row["align_score"] == want[row["image_id"]]


def test_alignment_layout_invariant(ray_session):
    """Scores are per-row: block boundaries and row order don't matter."""
    import ray.data as rd

    from markdown_lab_ray.stages.align import score_caption_alignment

    table = _images_table(40)
    perm = np.random.RandomState(3).permutation(table.num_rows)
    a = score_caption_alignment(rd.from_arrow(table)).take_all()
    b = score_caption_alignment(
        rd.from_arrow(table.take(pa.array(perm))).repartition(7)).take_all()
    assert (sorted((r["image_id"], r["align_score"]) for r in a)
            == sorted((r["image_id"], r["align_score"]) for r in b))


def test_alignment_score_tracks_caption(ray_session):
    """Replacing a caption changes its score (the model is caption-
    sensitive), and only the edited row moves."""
    import ray.data as rd

    from markdown_lab_ray.stages.align import score_caption_alignment

    table = _images_table(20)
    captions = table.column("caption").to_pylist()
    swapped = list(captions)
    swapped[0] = "completely unrelated zebra tornado xylophone"
    edited = table.set_column(
        table.schema.get_field_index("caption"), "caption",
        pa.array(swapped))
    a = {r["image_id"]: r["align_score"] for r in
         score_caption_alignment(rd.from_arrow(table)).take_all()}
    b = {r["image_id"]: r["align_score"] for r in
         score_caption_alignment(rd.from_arrow(edited)).take_all()}
    ids = table.column("image_id").to_pylist()
    assert a[ids[0]] != b[ids[0]]
    for other in ids[1:]:
        assert a[other] == b[other]


def test_alignment_bad_bytes_score_nan(ray_session):
    import ray.data as rd

    from markdown_lab_ray.stages.align import score_caption_alignment

    table = _images_table(6)
    blobs = table.column("bytes").to_pylist()
    blobs[2] = b"not an image"
    broken = table.set_column(
        table.schema.get_field_index("bytes"), "bytes",
        pa.array(blobs, pa.binary()))
    got = score_caption_alignment(rd.from_arrow(broken)).take_all()
    ids = table.column("image_id").to_pylist()
    by_id = {r["image_id"]: r["align_score"] for r in got}
    assert np.isnan(by_id[ids[2]])
    assert all(np.isfinite(by_id[i]) for i in ids if i != ids[2])


def test_alignment_filter_threshold_and_fusion(ray_session):
    """The fused gate keeps exactly the rows whose score ≥ threshold
    (NaN dropped) and carries the original columns + align_score."""
    import ray.data as rd

    from markdown_lab_ray.stages.align import alignment_filter

    table = _images_table(50)
    want = _local_scores(table)
    thr = float(np.median(list(want.values())))
    got = alignment_filter(rd.from_arrow(table).repartition(4),
                           threshold=thr).take_all()
    kept = {r["image_id"] for r in got}
    assert kept == {i for i, s in want.items() if s >= thr}
    assert set(got[0]) >= {"image_id", "bytes", "caption", "align_score"}
    for r in got:
        assert r["align_score"] == want[r["image_id"]]

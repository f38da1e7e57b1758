"""Image-mixture pipeline (pipelines/mixture.py image_mixture): each
gate drops its target (corrupt bytes, wrong caption, near-dup losers),
survivors land in readable WebDataset shards."""

import pyarrow as pa


def _table(n=60):
    from markdown_lab_ray.sources.synth import SiteSpec, build_images_table

    spec = SiteSpec(n_images=n)
    return spec, build_images_table(spec)


def _run(table, spec, **kw):
    import ray.data as rd

    from markdown_lab_ray.pipelines.mixture import image_mixture
    from markdown_lab_ray.sources.synth import reference_pixels_fn

    ds = rd.from_arrow(table).repartition(3)
    out = image_mixture(ds, ref_fn=reference_pixels_fn(spec),
                        **kw).to_pandas()
    return out.sort_values("image_id").reset_index(drop=True)


def test_near_dup_losers_dropped(ray_session):
    """Every 10th synth image is a near-dup of its predecessor.  A
    dropped image must be accounted for by one of the gates: either it
    was misaligned (score below threshold — none at threshold 0 here
    unless negative) or it sits in a near-dup cluster (has a true
    Hamming-≤6 neighbor; LSH pairs are a subset of those).  And no two
    exact-phash twins may both survive (identical phash ⇒ identical
    band keys ⇒ pair always found ⇒ one winner)."""
    from tests.test_align import _local_scores

    spec, table = _table(60)
    out = _run(table, spec)
    survivors = set(out["image_id"])
    assert 0 < len(survivors) < table.num_rows  # something was dropped
    rows = {r["image_id"]: r for r in table.to_pylist()}
    from markdown_lab_ray.stages.images import hamming64

    scores = _local_scores(table)
    for dropped in set(rows) - survivors:
        misaligned = scores[dropped] < 0.0
        has_neighbor = any(
            hamming64(rows[dropped]["phash"], rows[o]["phash"]) <= 6
            for o in rows if o != dropped)
        assert misaligned or has_neighbor, dropped
    surv = sorted(survivors)
    for i, a in enumerate(surv):
        for b in surv[i + 1:]:
            assert rows[a]["phash"] != rows[b]["phash"], (a, b)


def test_corrupt_and_miscaptioned_dropped(ray_session):
    spec, table = _table(30)
    blobs = table.column("bytes").to_pylist()
    caps = table.column("caption").to_pylist()
    ids = table.column("image_id").to_pylist()
    blobs[3] = b"corrupt"
    caps[7] = caps[7] + " WRONG"
    table = table.set_column(table.schema.get_field_index("bytes"),
                             "bytes", pa.array(blobs, pa.binary()))
    # note: caption column feeds BOTH sides (alt is copied from caption
    # pre-validation), so to simulate a caption mismatch we set alt via
    # an explicit column instead
    table = table.append_column("alt", pa.array(
        [c + " WRONG" if i == 7 else c for i, c in enumerate(caps)],
        pa.string()))
    out = _run(table, spec)
    assert ids[3] not in set(out["image_id"])  # corrupt bytes
    assert ids[7] not in set(out["image_id"])  # caption mismatch


def test_shards_written_and_readable(ray_session, tmp_path):
    from markdown_lab_ray.sources.webdataset import read_webdataset_shards

    spec, table = _table(40)
    out_dir = str(tmp_path / "wds")
    out = _run(table, spec, out_dir=out_dir, n_shards=4)
    back = read_webdataset_shards(out_dir).to_pandas()
    assert sorted(back["key"]) == sorted(out["image_id"])
    src = {r["image_id"]: r["caption"] for r in table.to_pylist()}
    for _, row in back.iterrows():
        assert row["caption"] == src[row["key"]]

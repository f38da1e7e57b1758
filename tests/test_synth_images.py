import numpy as np
import pyarrow as pa
import pytest

from markdown_lab_ray.sources.synth import (
    SiteSpec,
    SyntheticWeb,
    build_images_table,
    image_meta,
    robots_body,
    sitemap_body,
)
from markdown_lab_ray.stages.images import (
    DecodeValidate,
    fake_decode,
    fake_encode,
    hamming64,
    perceptual_hash,
    psnr,
    synth_pixels,
)

SPEC = SiteSpec(n_hosts=9, pages_per_host=10, n_images=50)


def test_codec_roundtrip_png_exact():
    px = synth_pixels("img000001", 20, 30)
    decoded, fmt = fake_decode(fake_encode(px, "png"))
    assert fmt == "png"
    assert np.array_equal(decoded, px)


def test_codec_lossy_psnr_gate():
    px = synth_pixels("img000002", 32, 32)
    decoded, _ = fake_decode(fake_encode(px, "jpeg"))
    assert not np.array_equal(decoded, px)
    assert psnr(px, decoded) >= 40.0


def test_codec_rejects_garbage():
    with pytest.raises(ValueError):
        fake_decode(b"not an image at all")


def test_phash_near_dup_vs_distinct():
    a = synth_pixels("imgA", 32, 32)
    near = np.clip(a.astype(np.int16) +
                   np.random.RandomState(0).randint(-2, 3, a.shape),
                   0, 255).astype(np.uint8)
    b = synth_pixels("imgB", 32, 32)
    assert hamming64(perceptual_hash(a), perceptual_hash(near)) <= 6
    assert hamming64(perceptual_hash(a), perceptual_hash(b)) > 10


def test_images_table_schema_and_determinism():
    t1 = build_images_table(SPEC)
    t2 = build_images_table(SPEC)
    assert t1.num_rows == SPEC.n_images
    assert t1.equals(t2)
    assert t1.schema.names == ["image_id", "bytes", "w", "h", "fmt",
                               "caption", "phash"]


def test_decode_validate_stage():
    from markdown_lab_ray.sources.synth import reference_pixels_fn
    table = build_images_table(SPEC)
    out = DecodeValidate(ref_fn=reference_pixels_fn(SPEC))(table)
    assert all(out.column("pixels_ok").to_pylist())
    # phash stored == phash recomputed from decode
    assert out.column("phash").to_pylist() == \
        out.column("phash_decoded").to_pylist()


def test_decode_validate_caption_check():
    table = build_images_table(SiteSpec(n_images=5)).select(
        ["image_id", "bytes", "w", "h", "fmt", "caption", "phash"])
    good = table.append_column("alt", table.column("caption"))
    out = DecodeValidate()(good)
    assert all(out.column("caption_ok").to_pylist())
    bad = table.append_column("alt", pa.array(["wrong"] * 5))
    out = DecodeValidate()(bad)
    assert not any(out.column("caption_ok").to_pylist())


def test_web_resolve_pages_and_images():
    web = SyntheticWeb(SPEC)
    status, body = web.resolve(SPEC.page_url(0, 3))
    assert status == 200 and "<h1>" in body
    image_id, _, _, fmt, _ = image_meta(SPEC, 7)
    status, blob = web.resolve(f"https://img.example.com/{image_id}.{fmt}")
    assert status == 200 and isinstance(blob, bytes)
    assert web.resolve("https://nowhere.example.com/x")[0] == 404
    assert web.resolve(SPEC.page_url(0, 999))[0] == 404


def test_robots_and_sitemap_variants():
    assert "Sitemap:" in robots_body(SPEC, 0)
    assert "Sitemap:" not in robots_body(SPEC, 1)
    assert robots_body(SPEC, 2) is None
    # robots-declared host serves only the custom sitemap
    assert sitemap_body(SPEC, 0, "/custom_sitemap.xml") is not None
    assert sitemap_body(SPEC, 0, "/sitemap.xml") is None
    # index host: well-known #1 404s, #2 is an index
    assert sitemap_body(SPEC, 5, "/sitemap.xml") is None
    assert "sitemapindex" in sitemap_body(SPEC, 5, "/sitemap_index.xml")
    assert sitemap_body(SPEC, 5, "/sitemap_a.xml") is not None
    # plain host
    assert "urlset" in sitemap_body(SPEC, 1, "/sitemap.xml")


def test_sitemap_roundtrip_through_kernel():
    from markdown_lab_ray.kernels.sitemap import parse_sitemap_xml
    rows, children = parse_sitemap_xml(sitemap_body(SPEC, 1, "/sitemap.xml"))
    assert len(rows) == SPEC.pages_per_host
    assert children == []
    # j%7==0 entries carry no priority (None passes min_priority filters)
    assert rows[0]["priority"] is None
    assert rows[1]["priority"] == 0.3


def test_frame_sample_stage(ray_session):
    import ray.data as rd

    from markdown_lab_ray.stages.images import (
        FrameSample,
        fake_decode,
        fake_video_decode,
        fake_video_encode,
    )

    rows = []
    for v in range(4):
        frames = np.stack([synth_pixels(f"vid{v}_f{i}", 16, 16)
                           for i in range(8)])
        rows.append({"video_id": f"vid{v}", "bytes": fake_video_encode(frames)})
    ds = rd.from_items(rows)
    out = ds.map_batches(FrameSample, batch_format="pyarrow", batch_size=2,
                         concurrency=(1, 2),
                         fn_constructor_kwargs=dict(k=3)).take_all()
    assert len(out) == 12  # 4 videos × 3 frames
    assert all(r["decode_ok"] for r in out)
    # stills decode back to the sampled frame
    first = next(r for r in out if r["video_id"] == "vid0" and r["frame_idx"] == 0)
    still, _ = fake_decode(first["still"])
    original = fake_video_decode(rows[0]["bytes"])[0]
    assert np.array_equal(still, original)
    # garbage bytes → decode_ok False row, batch not aborted
    bad = rd.from_items([{"video_id": "x", "bytes": b"junk"}])
    out = bad.map_batches(FrameSample, batch_format="pyarrow",
                          concurrency=1).take_all()
    assert out[0]["decode_ok"] is False or out[0]["decode_ok"] == False  # noqa: E712


def test_read_image_table_parquet_contract(ray_session, tmp_path):
    """Round-trip the input_hint schema through the storage reader with
    column pruning, then run the decode-validate stage over it."""
    import pyarrow.parquet as pq
    import pytest

    from markdown_lab_ray.sources.io import read_image_table
    from markdown_lab_ray.sources.synth import SiteSpec, build_images_table
    from markdown_lab_ray.stages.images import DecodeValidate
    from markdown_lab_ray.sources.synth import reference_pixels_fn

    spec = SiteSpec(n_images=40)
    table = build_images_table(spec)
    p = str(tmp_path / "images.parquet")
    pq.write_table(table, p)

    pruned = read_image_table(p, columns=["image_id", "w", "h"])
    assert set(pruned.schema().names) == {"image_id", "w", "h"}
    assert pruned.count() == 40

    full = read_image_table(p).map_batches(
        DecodeValidate, batch_format="pyarrow", batch_size=16,
        concurrency=(1, 2),
        fn_constructor_kwargs=dict(ref_fn=reference_pixels_fn(spec)))
    out = full.to_pandas()
    assert len(out) == 40 and bool(out["pixels_ok"].all())

    with pytest.raises(ValueError):
        read_image_table(p, columns=["nope"])
    with pytest.raises(RuntimeError):
        read_image_table(str(tmp_path / "corpus.lance"))


def test_write_image_table_seam(ray_session, tmp_path):
    """Write twin of the read seam: parquet round-trips through
    read_image_table; a .lance path hits the pylance seam (actionable
    error here — this container has no pylance; the branch calls
    Dataset.write_lance when it is installed); contract violations
    fail fast."""
    import importlib.util

    import pytest
    import ray.data as rd

    from markdown_lab_ray.sources.io import (
        read_image_table,
        write_image_table,
    )
    from markdown_lab_ray.sources.synth import SiteSpec, build_images_table

    table = build_images_table(SiteSpec(n_images=12))
    ds = rd.from_arrow(table)

    out = str(tmp_path / "corpus_pq")
    write_image_table(ds, out)
    back = read_image_table(out).take_all()
    assert len(back) == 12
    assert sorted(r["image_id"] for r in back) == \
        sorted(table.column("image_id").to_pylist())

    if importlib.util.find_spec("lance") is None:
        with pytest.raises(RuntimeError, match="pylance"):
            write_image_table(ds, str(tmp_path / "corpus.lance"))
    else:  # pragma: no cover — real-cluster path
        write_image_table(ds, str(tmp_path / "corpus.lance"))
        assert read_image_table(
            str(tmp_path / "corpus.lance")).count() == 12

    with pytest.raises(ValueError, match="contract columns missing"):
        write_image_table(ds.drop_columns(["caption"]),
                          str(tmp_path / "bad"))


def test_sharded_parquet_manifest_guards_resume(ray_session, tmp_path):
    """ADVICE r03: resuming a sharded sink with different sharding
    parameters must fail fast, not silently mix layouts."""
    import pandas as pd
    import pytest
    import ray.data as rd

    from markdown_lab_ray.sources.io import (
        read_sharded_parquet,
        write_sharded_parquet,
    )

    df = pd.DataFrame({"k": [f"k{i}" for i in range(40)],
                       "v": range(40)})
    out = str(tmp_path / "shards")
    write_sharded_parquet(rd.from_pandas(df), out, key_col="k", n_shards=4)
    assert read_sharded_parquet(out).count() == 40

    with pytest.raises(ValueError, match="sharding parameters changed"):
        write_sharded_parquet(rd.from_pandas(df), out, key_col="k",
                              n_shards=8)
    with pytest.raises(ValueError, match="sharding parameters changed"):
        write_sharded_parquet(rd.from_pandas(df), out, key_col="v",
                              n_shards=4)
    # same parameters: clean no-op resume
    write_sharded_parquet(rd.from_pandas(df), out, key_col="k", n_shards=4)
    assert read_sharded_parquet(out).count() == 40
    # resume=False rewrites under the new layout
    write_sharded_parquet(rd.from_pandas(df), out, key_col="k", n_shards=8,
                          resume=False)
    assert read_sharded_parquet(out).count() == 40

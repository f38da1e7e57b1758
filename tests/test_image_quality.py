"""Round-4j image operators: ImageQuality gate, dhash64 + agreement
audit, ThumbnailPyramid accounting, patch_stats."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from markdown_lab_ray.sources.synth import SiteSpec, build_images_table
from markdown_lab_ray.stages.images import (
    ImageQuality,
    ThumbnailPyramid,
    dhash64,
    fake_decode,
    fake_encode,
    hash_agreement,
    image_quality_row,
    patch_stats,
    pyramid_accounting,
    synth_pixels,
)


def _table(n=40):
    return build_images_table(SiteSpec(n_images=n))


def test_image_quality_matches_single_process_twin(ray_session):
    table = _table()
    ds = rd.from_arrow(table)
    got = (ds.map_batches(ImageQuality, batch_format="pyarrow",
                          batch_size=16, concurrency=(1, 2))
           .to_pandas().sort_values("image_id").reset_index(drop=True))
    # exact twin: decode + the shared pure kernel, row by row
    for i in range(table.num_rows):
        blob = table.column("bytes")[i].as_py()
        pixels, _ = fake_decode(blob)
        want = image_quality_row(pixels)
        row = got[got["image_id"] == table.column("image_id")[i].as_py()]
        for k, v in want.items():
            assert row[k].iloc[0] == v
        assert bool(row["dims_ok"].iloc[0])
    # synthetic sinusoid+noise images are mid-brightness, contrasty,
    # sharp — the gate should pass everything in this corpus
    assert got["quality_ok"].all()


def test_image_quality_flags_bad_rows(ray_session):
    flat = np.full((64, 64, 3), 128, np.uint8)          # zero contrast
    dark = np.full((64, 64, 3), 3, np.uint8)            # too dark
    good = synth_pixels("ok", 64, 64)
    tbl = pa.table({
        "image_id": ["flat", "dark", "good", "badhdr"],
        "bytes": [fake_encode(flat, "png"), fake_encode(dark, "png"),
                  fake_encode(good, "png"), b"not-an-image"],
        "w": [64, 64, 64, 64], "h": [64, 64, 64, 64],
        "fmt": ["png"] * 4})
    got = (rd.from_arrow(tbl)
           .map_batches(ImageQuality, batch_format="pyarrow", concurrency=1)
           .to_pandas().set_index("image_id"))
    assert not got.loc["flat", "quality_ok"]
    assert not got.loc["dark", "quality_ok"]
    assert got.loc["good", "quality_ok"]
    assert not got.loc["badhdr", "dims_ok"]
    # dimension mismatch (declared ≠ decoded) is flagged
    tbl2 = pa.table({"image_id": ["mismatch"],
                     "bytes": [fake_encode(good, "png")],
                     "w": [128], "h": [64], "fmt": ["png"]})
    got2 = (rd.from_arrow(tbl2)
            .map_batches(ImageQuality, batch_format="pyarrow", concurrency=1).to_pandas())
    assert not got2["dims_ok"].iloc[0]
    assert not got2["quality_ok"].iloc[0]


def test_dhash_brightness_invariance_vs_ahash():
    from markdown_lab_ray.stages.images import perceptual_hash

    base = synth_pixels("inv", 64, 64)
    brighter = np.clip(base.astype(np.int32) + 40, 0, 255).astype(np.uint8)
    # dHash compares neighboring blocks → a uniform brightness shift
    # preserves every gradient direction exactly
    assert dhash64(base) == dhash64(brighter)
    assert isinstance(perceptual_hash(base), int)


def test_thumbnail_pyramid_levels_and_accounting(ray_session):
    pixels = synth_pixels("pyr", 128, 96)
    tbl = pa.table({"image_id": ["pyr"],
                    "bytes": [fake_encode(pixels, "png")],
                    "fmt": ["png"]})
    levels = (rd.from_arrow(tbl)
              .map_batches(ThumbnailPyramid(min_side=16),
                           batch_format="pyarrow").to_pandas()
              .sort_values("level").reset_index(drop=True))
    # 128×96 → 64×48 → 32×24 → stop (next would be 16×12, min side 12 < 16)
    assert levels["level"].tolist() == [1, 2]
    assert list(zip(levels["w"], levels["h"])) == [(64, 48), (32, 24)]
    # bytes are real re-encodes of the resized pixels
    assert (levels["n_bytes"] > 16).all()
    acct = (pyramid_accounting(rd.from_arrow(_table(20)), min_side=16)
            .to_pandas().sort_values("level"))
    assert (acct["n_images"] >= 1).all()
    assert (acct["total_bytes"] > 0).all()


def test_hash_agreement_panel(ray_session):
    ds = rd.from_arrow(_table(60))
    got = hash_agreement(ds, hamming_threshold=6)
    n_a, n_d, n_both = (int(got["n_ahash"][0]), int(got["n_dhash"][0]),
                        int(got["n_both"][0]))
    assert n_both <= min(n_a, n_d)
    union = n_a + n_d - n_both
    want_j = 0 if union == 0 else (n_both * 1_000_000) // union
    assert int(got["jaccard_micro"][0]) == want_j
    # the synthetic corpus plants near-dup copies — both hashes find some
    assert n_a > 0 and n_d > 0


def test_patch_stats_exact(ray_session):
    table = _table(50)
    ds = rd.from_arrow(table.select(["w", "h", "fmt"]))
    got = (patch_stats(ds, patch=16).to_pandas()
           .sort_values("fmt").reset_index(drop=True))
    import pandas as pd
    df = table.select(["w", "h", "fmt"]).to_pandas()
    df["patches"] = (-(-df["w"] // 16)) * (-(-df["h"] // 16))
    want = (df.groupby("fmt")
            .agg(n_images=("patches", "size"),
                 total_patches=("patches", "sum"),
                 max_patches=("patches", "max"))
            .reset_index().sort_values("fmt").reset_index(drop=True))
    assert got["fmt"].tolist() == want["fmt"].tolist()
    assert got["n_images"].tolist() == want["n_images"].tolist()
    assert got["total_patches"].tolist() == want["total_patches"].tolist()
    assert got["max_patches"].tolist() == want["max_patches"].tolist()


def test_border_stats_letterbox_crop():
    from markdown_lab_ray.stages.images import border_stats_row

    # 10×8 image: 2-row black letterbox top+bottom, content inside
    img = np.zeros((10, 8, 3), np.uint8)
    img[2:8] = 200
    out = border_stats_row(img)
    assert (out["crop_top"], out["crop_left"]) == (2, 0)
    assert (out["crop_h"], out["crop_w"]) == (6, 8)
    assert out["border_bp"] == 4000  # 32 of 80 pixels are border
    # pillarbox: uniform columns peel too
    img2 = np.full((6, 10, 3), 255, np.uint8)
    img2[:, 3:7] = 10
    out2 = border_stats_row(img2)
    assert (out2["crop_left"], out2["crop_w"]) == (3, 4)
    # flat single-color image: all border, empty crop
    flat = np.full((5, 5, 3), 7, np.uint8)
    assert border_stats_row(flat)["border_bp"] == 10_000
    # near-uniform border within tol still peels; beyond tol does not
    img3 = np.full((4, 4, 3), 100, np.uint8)
    img3[0] = 104          # within default tol 8 of corner
    img3[1:] = 180
    assert border_stats_row(img3)["crop_top"] == 1
    img3[0, 2] = 120       # row no longer uniform vs its corner
    assert border_stats_row(img3)["crop_top"] == 0


def test_color_profile_palette_and_grayscale():
    from markdown_lab_ray.stages.images import color_profile_row

    img = np.zeros((4, 4, 3), np.uint8)
    img[:2] = [16, 32, 48]   # quantized (1,2,3)
    out = color_profile_row(img)
    assert out["n_colors"] == 2
    assert out["dominant_bp"] == 5000
    assert not out["is_grayscale"]   # spread 32 > 8
    gray = np.repeat(np.arange(16, dtype=np.uint8).reshape(4, 4, 1), 3,
                     axis=2)
    out2 = color_profile_row(gray)
    assert out2["is_grayscale"]


def test_border_color_profile_stage_matches_twin(ray_session):
    import ray.data as rd

    from markdown_lab_ray.sources.synth import SiteSpec, build_images_table
    from markdown_lab_ray.stages.images import (
        BorderColorProfile, border_stats_row, color_profile_row, fake_decode)

    table = build_images_table(SiteSpec(n_images=30))
    out = (rd.from_arrow(table)
           .map_batches(BorderColorProfile, batch_format="pyarrow",
                        batch_size=8, concurrency=(1, 2))
           .to_pandas().sort_values("image_id").reset_index(drop=True))
    assert out["decode_ok"].all()
    # exact single-process twin over the same corpus
    for i in range(0, 30, 7):
        pixels, _ = fake_decode(table.column("bytes")[i].as_py())
        want = border_stats_row(pixels)
        want.update(color_profile_row(pixels))
        row = out[out["image_id"] == table.column("image_id")[i].as_py()]
        for k, v in want.items():
            assert row[k].iloc[0] == v, k

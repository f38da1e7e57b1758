"""End-to-end crawl → image join → PSNR/caption validation (the graft's
image+caption invariants over actually-crawled pages)."""

from markdown_lab_ray.config import EngineConfig
from markdown_lab_ray.sources.synth import (
    SiteSpec,
    SyntheticWeb,
    build_images_table,
    reference_pixels_fn,
)

SPEC = SiteSpec(n_hosts=4, pages_per_host=8, n_images=60)
CFG = EngineConfig(requests_per_second=1.0, round_seconds=60.0, max_rounds=1,
                   max_depth=0, seen_shards=2, fetch_concurrency=2)


def test_crawled_images_validate(ray_session, tmp_path):
    from markdown_lab_ray.pipelines.crawl import run_crawl_ray
    from markdown_lab_ray.pipelines.validate_images import validate_crawled_images

    out = str(tmp_path / "crawl")
    res = run_crawl_ray(lambda: SyntheticWeb(SPEC), SPEC.seed_urls(), out, CFG)
    assert res.fetched == 32

    validated = validate_crawled_images(
        out, build_images_table(SPEC), ref_fn=reference_pixels_fn(SPEC))
    rows = validated.take_all()
    assert rows, "pages must reference at least one image"
    # every referenced image decodes within the PSNR gate
    assert all(r["pixels_ok"] for r in rows)
    # alt text in the page equals the table caption (caption invariant)
    assert all(r["caption_ok"] for r in rows)
    # stored phash matches the phash recomputed from the decode
    assert all(r["phash"] == r["phash_decoded"] for r in rows)
    assert all(r["page_url"].startswith("https://h") for r in rows)


def test_caption_mismatch_detected(ray_session, tmp_path):
    import pyarrow as pa

    from markdown_lab_ray.pipelines.crawl import run_crawl_ray
    from markdown_lab_ray.pipelines.validate_images import validate_crawled_images

    out = str(tmp_path / "crawl2")
    run_crawl_ray(lambda: SyntheticWeb(SPEC), SPEC.seed_urls(), out, CFG)

    table = build_images_table(SPEC)
    corrupted = table.set_column(
        table.schema.get_field_index("caption"), "caption",
        pa.array(["WRONG"] * table.num_rows))
    validated = validate_crawled_images(out, corrupted,
                                        ref_fn=reference_pixels_fn(SPEC))
    rows = validated.take_all()
    assert rows and not any(r["caption_ok"] for r in rows)


def test_missing_image_refs_become_failure_rows(ray_session, tmp_path):
    from markdown_lab_ray.pipelines.crawl import run_crawl_ray
    from markdown_lab_ray.pipelines.validate_images import validate_crawled_images

    out = str(tmp_path / "crawl3")
    run_crawl_ray(lambda: SyntheticWeb(SPEC), SPEC.seed_urls(), out, CFG)
    truncated = build_images_table(SPEC).slice(0, 5)  # most ids missing
    rows = validate_crawled_images(out, truncated,
                                   ref_fn=reference_pixels_fn(SPEC)).take_all()
    missing = [r for r in rows if not r["pixels_ok"]]
    assert missing, "missing table entries must surface as failure rows"
    assert all(r["page_url"] for r in missing)


def test_seen_mark_idempotent_within_round():
    from markdown_lab_ray.state.seen import LocalSeen

    seen = LocalSeen(1 << 10)
    # round 3 marks; a task RETRY re-marks the same keys in round 3
    assert seen.check_and_add(["k1", "k2"], round_no=3) == [True, True]
    assert seen.check_and_add(["k1", "k2"], round_no=3) == [True, True]
    # a later round sees them as already-fetched
    assert seen.check_and_add(["k1", "k3"], round_no=4) == [False, True]
    # default (-1) marking is never retry-idempotent
    assert seen.check_and_add(["k9"]) == [True]
    assert seen.check_and_add(["k9"]) == [False]

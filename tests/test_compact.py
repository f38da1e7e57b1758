"""Checkpoint compaction (pipelines/compact.py): consolidated shards
equal the union of the round checkpoints; re-runs resume on the same
round set and fail fast on a different one."""

import glob
import json
import os

import pytest

from markdown_lab_ray.config import EngineConfig
from markdown_lab_ray.sources.synth import SiteSpec, SyntheticWeb

SPEC = SiteSpec(n_hosts=4, pages_per_host=8, n_images=20)
CFG = EngineConfig(requests_per_second=0.1, round_seconds=60.0,
                   max_rounds=2, max_depth=1, seen_shards=2)


@pytest.fixture(scope="module")
def crawl_out(ray_session, tmp_path_factory):
    from markdown_lab_ray.pipelines.crawl import run_crawl_ray

    out = str(tmp_path_factory.mktemp("crawl"))
    run_crawl_ray(lambda: SyntheticWeb(SPEC), SPEC.seed_urls(), out, CFG)
    return out


def test_compact_docs_equals_rounds_union(ray_session, crawl_out, tmp_path):
    import pyarrow.parquet as pq

    from markdown_lab_ray.pipelines.compact import compact_crawl_output
    from markdown_lab_ray.sources.io import read_sharded_parquet

    dest = str(tmp_path / "docs_compact")
    rounds, n_rows = compact_crawl_output(crawl_out, dest, what="docs",
                                          n_shards=4)
    assert rounds  # at least one complete round
    src_files = []
    for r in rounds:
        src_files += glob.glob(os.path.join(
            crawl_out, "rounds", f"round={r}", "docs", "*.parquet"))
    want = sorted(u for f in src_files
                  for u in pq.read_table(f, columns=["url"])
                  .column("url").to_pylist())
    got = sorted(read_sharded_parquet(dest, columns=["url"])
                 .to_pandas()["url"])
    assert got == want and n_rows == len(want)


def test_compact_rerun_same_rounds_is_resume(ray_session, crawl_out,
                                             tmp_path):
    from markdown_lab_ray.pipelines.compact import compact_crawl_output

    dest = str(tmp_path / "again")
    first = compact_crawl_output(crawl_out, dest, what="docs", n_shards=4)
    second = compact_crawl_output(crawl_out, dest, what="docs", n_shards=4)
    assert first[0] == second[0] and first[1] == second[1]


def test_compact_new_rounds_fail_fast(ray_session, crawl_out, tmp_path):
    from markdown_lab_ray.pipelines.compact import compact_crawl_output

    dest = str(tmp_path / "stale")
    compact_crawl_output(crawl_out, dest, what="docs", n_shards=4)
    # simulate a crawl that completed one more round since
    manifest = os.path.join(dest, "_COMPACTION.json")
    with open(manifest) as f:
        params = json.load(f)
    params["rounds"] = params["rounds"][:-1]
    with open(manifest, "w") as f:
        json.dump(params, f)
    with pytest.raises(ValueError, match="fresh dest_dir"):
        compact_crawl_output(crawl_out, dest, what="docs", n_shards=4)


def test_compact_chunks_and_bad_what(ray_session, crawl_out, tmp_path):
    from markdown_lab_ray.pipelines.compact import compact_crawl_output
    from markdown_lab_ray.sources.io import read_sharded_parquet

    dest = str(tmp_path / "chunks_compact")
    rounds, n_rows = compact_crawl_output(crawl_out, dest, what="chunks",
                                          n_shards=4)
    if n_rows:  # chunks sidecar present for fetched pages
        back = read_sharded_parquet(dest).to_pandas()
        assert "source_url" in back.columns and len(back) == n_rows
    with pytest.raises(ValueError, match="what must be"):
        compact_crawl_output(crawl_out, str(tmp_path / "x"), what="frontier")


def test_cli_compact_verb(ray_session, crawl_out, tmp_path, capsys):
    from markdown_lab_ray.cli import main

    dest = str(tmp_path / "via_cli")
    assert main(["compact", "--out", crawl_out, "--dest", dest,
                 "--shards", "2"]) == 0
    assert "compacted rounds=" in capsys.readouterr().out
    assert glob.glob(os.path.join(dest, "shard=*", "_SHARD_DONE"))

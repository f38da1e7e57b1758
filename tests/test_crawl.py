"""Crawl engine: oracle semantics, Ray parity, resume."""

import shutil

import pytest

from markdown_lab_ray.config import EngineConfig
from markdown_lab_ray.pipelines.crawl_spec import discover_seed_frontier
from markdown_lab_ray.pipelines.oracle import run_crawl_oracle
from markdown_lab_ray.sources.synth import SiteSpec, SyntheticWeb
from markdown_lab_ray.state.robots import LocalRobotsCache

SPEC = SiteSpec(n_hosts=6, pages_per_host=12, n_images=40)
CFG = EngineConfig(requests_per_second=0.1, round_seconds=60.0,  # budget 6/host
                   max_rounds=4, max_depth=2, seen_shards=4)


def _web():
    return SyntheticWeb(SPEC)


def test_discovery_robots_declared_host():
    web = _web()
    rows = discover_seed_frontier(web.resolve, LocalRobotsCache(web.resolve),
                                  "https://h000.example.com", 0)
    assert len(rows) == SPEC.pages_per_host
    assert rows[0]["loc"] == "https://h000.example.com/page/0"
    assert rows[0]["seq_no"] == 0
    assert rows[0]["priority"] is None  # j%7==0 has no <priority>
    assert rows[1]["priority"] == 0.3


def test_discovery_wellknown_and_index_hosts():
    web = _web()
    robots = LocalRobotsCache(web.resolve)
    rows = discover_seed_frontier(web.resolve, robots,
                                  "https://h001.example.com", 1)
    assert len(rows) == SPEC.pages_per_host
    assert rows[0]["seq_no"] == 1_000_000
    # host 5: /sitemap.xml 404s, /sitemap_index.xml two-level index
    rows5 = discover_seed_frontier(web.resolve, robots,
                                   "https://h005.example.com", 5)
    assert len(rows5) == SPEC.pages_per_host
    assert [r["loc"] for r in rows5] == [
        f"https://h005.example.com/page/{j}" for j in range(SPEC.pages_per_host)]


def test_discovery_filters():
    web = _web()
    rows = discover_seed_frontier(web.resolve, LocalRobotsCache(web.resolve),
                                  "https://h000.example.com", 0,
                                  min_priority=0.5, limit=4)
    assert len(rows) == 4
    assert all(r["priority"] is None or r["priority"] >= 0.5 for r in rows)


def test_oracle_runs_and_is_deterministic():
    r1 = run_crawl_oracle(_web().resolve, SPEC.seed_urls(), CFG)
    r2 = run_crawl_oracle(_web().resolve, SPEC.seed_urls(), CFG)
    assert r1["order"] == r2["order"]
    assert r1["seen"] == r2["seen"]
    assert r1["fetched"] > 0
    # politeness budget respected per host per round
    detail = r1["order_detail"]
    per = detail.groupby(["round", "host"]).size()
    assert per.max() <= 6


def test_oracle_budget_changes_order():
    fast = EngineConfig(requests_per_second=1.0, round_seconds=60.0,
                        max_rounds=2, max_depth=1)
    slow = EngineConfig(requests_per_second=0.05, round_seconds=60.0,
                        max_rounds=2, max_depth=1)
    r_fast = run_crawl_oracle(_web().resolve, SPEC.seed_urls()[:2], fast)
    r_slow = run_crawl_oracle(_web().resolve, SPEC.seed_urls()[:2], slow)
    assert r_fast["order"] != r_slow["order"]


@pytest.fixture()
def crawl_dir(tmp_path):
    yield str(tmp_path / "crawl")
    shutil.rmtree(tmp_path / "crawl", ignore_errors=True)


def test_ray_crawl_matches_oracle(ray_session, crawl_dir):
    from markdown_lab_ray.pipelines.crawl import read_crawl_order, run_crawl_ray

    oracle = run_crawl_oracle(_web().resolve, SPEC.seed_urls(), CFG)
    result = run_crawl_ray(lambda: SyntheticWeb(SPEC), SPEC.seed_urls(),
                           crawl_dir, CFG)
    order = read_crawl_order(crawl_dir)

    assert order["loc"].tolist() == oracle["order"]
    assert set(order["seen_key"]) == oracle["seen"]
    assert result.fetched == oracle["fetched"]
    assert result.failed == oracle["failed"]


def test_ray_crawl_resume(ray_session, tmp_path):
    """Kill after N rounds (simulated by max_rounds), resume, and get the
    same final state as an uninterrupted run."""
    import pandas as pd

    from markdown_lab_ray.pipelines.crawl import read_crawl_order, run_crawl_ray

    full_dir = str(tmp_path / "full")
    part_dir = str(tmp_path / "part")

    cfg_full = CFG
    run_crawl_ray(lambda: SyntheticWeb(SPEC), SPEC.seed_urls(), full_dir,
                  cfg_full)

    cfg_half = EngineConfig(**{**CFG.__dict__, "max_rounds": 2})
    run_crawl_ray(lambda: SyntheticWeb(SPEC), SPEC.seed_urls(), part_dir,
                  cfg_half)
    run_crawl_ray(lambda: SyntheticWeb(SPEC), SPEC.seed_urls(), part_dir,
                  cfg_full, resume=True)

    full = read_crawl_order(full_dir)
    resumed = read_crawl_order(part_dir)
    pd.testing.assert_frame_equal(full.reset_index(drop=True),
                                  resumed.reset_index(drop=True))


def test_resume_discards_partial_round(ray_session, tmp_path):
    """A kill mid-round leaves checkpoints without a manifest; resume
    must discard them and still converge to the uninterrupted result."""
    import os
    import shutil

    import pandas as pd

    from markdown_lab_ray.pipelines.crawl import read_crawl_order, run_crawl_ray

    full_dir = str(tmp_path / "full")
    part_dir = str(tmp_path / "part")
    run_crawl_ray(lambda: SyntheticWeb(SPEC), SPEC.seed_urls(), full_dir, CFG)

    cfg_half = EngineConfig(**{**CFG.__dict__, "max_rounds": 2})
    run_crawl_ray(lambda: SyntheticWeb(SPEC), SPEC.seed_urls(), part_dir,
                  cfg_half)
    # fabricate a partial round 2: schedule written, no manifest
    partial = os.path.join(part_dir, "rounds", "round=2")
    shutil.copytree(os.path.join(part_dir, "rounds", "round=1"), partial)
    os.remove(os.path.join(partial, "_MANIFEST.json"))

    run_crawl_ray(lambda: SyntheticWeb(SPEC), SPEC.seed_urls(), part_dir,
                  CFG, resume=True)
    pd.testing.assert_frame_equal(
        read_crawl_order(full_dir).reset_index(drop=True),
        read_crawl_order(part_dir).reset_index(drop=True))


def test_probe_rpc_count_scales_with_shards_not_groups(ray_session):
    """VERDICT r03 #6: the URL-seen probe runs pre-groupby per BLOCK, so
    shard RPC count is bounded by blocks × shards — independent of the
    number of host groups (200 hosts here, 4 blocks, 8 shards)."""
    import ray
    import ray.data as rd

    from markdown_lab_ray.state.seen import SeenProbe, create_seen_shards

    n_hosts, n_blocks, n_shards = 200, 4, 8
    shards = create_seen_shards(n_shards, 1 << 12)
    rows = [{"seen_key": f"https://h{i}.test/p", "host": f"h{i}.test"}
            for i in range(n_hosts)]
    ds = rd.from_items(rows).repartition(n_blocks)
    out = ds.map_batches(SeenProbe(shards, mode="filter_unseen"),
                         batch_format="pyarrow").materialize()
    assert out.count() == n_hosts  # nothing seen yet → all pass
    calls = sum(s["probe_calls"] for s in
                ray.get([sh.rpc_stats.remote() for sh in shards]))
    assert calls <= n_blocks * n_shards  # 32, not ∝ 200 host groups
    for sh in shards:
        ray.kill(sh)


def test_robots_actor_cache_exactly_once_and_parity(ray_session, tmp_path):
    """robots_cache="actor" (north rule: robots.txt cache actors): the
    shard tier fetches each host's robots.txt exactly ONCE cluster-wide
    and the crawl output is identical to worker mode."""
    import ray

    from markdown_lab_ray.pipelines.crawl import read_crawl_order, run_crawl_ray
    from markdown_lab_ray.state.robots import create_robots_shards

    cfg_actor = EngineConfig(**{**CFG.__dict__, "robots_cache": "actor",
                                "robots_shards": 3})
    a_dir, w_dir = str(tmp_path / "actor"), str(tmp_path / "worker")
    run_crawl_ray(lambda: SyntheticWeb(SPEC), SPEC.seed_urls(), a_dir,
                  cfg_actor)
    run_crawl_ray(lambda: SyntheticWeb(SPEC), SPEC.seed_urls(), w_dir, CFG)
    import pandas as pd
    pd.testing.assert_frame_equal(
        read_crawl_order(a_dir).reset_index(drop=True),
        read_crawl_order(w_dir).reset_index(drop=True))

    # exactly-once property, asserted directly on the shard tier
    shards = create_robots_shards(3, lambda: SyntheticWeb(SPEC))
    from markdown_lab_ray.state.robots import ActorRobotsCache
    client_a = ActorRobotsCache(shards)
    client_b = ActorRobotsCache(shards)  # second "worker process"
    hosts = SPEC.hosts()
    for client in (client_a, client_b, client_a):
        for h in hosts:
            client.rules_for(h)
    fetches = sum(ray.get([s.n_fetches.remote() for s in shards]))
    assert fetches == len(hosts)  # one real fetch per host, ever
    for s in shards:
        ray.kill(s)


def test_links_explode_vectorized_parity():
    """The Arrow-vectorized engine explode must equal the spec row-loop
    path (links_to_frontier_rows + dedup_candidates) as a SET of
    frontier rows — same scheme filter, trap cap, per-URL scalars and
    spec-2a pre-dedup — for every trap_cap setting."""
    import pyarrow as pa

    from markdown_lab_ray.pipelines.crawl import links_explode_batch
    from markdown_lab_ray.pipelines.crawl_spec import (
        dedup_candidates, links_to_frontier_rows)

    pages = [
        (0, ["http://a.com/x", "https://b.com/y#frag", "ftp://c.com/z",
             "javascript:void(0)", "http://a.com/x/", "http://a.com/x",
             "https://b.com/cal?d=1", "https://b.com/cal?d=2",
             "https://b.com/cal?d=3", "https://b.com/cal?d=4"]),
        (1, ["http://a.com/x", "http://d.com/p/0123456789ab",
             "http://d.com/p/ba9876543210", ""]),
        (2, []),
    ]
    batch = pa.table({
        "depth": pa.array([d for d, _ in pages], pa.int64()),
        "links": pa.array([l for _, l in pages],
                          pa.list_(pa.string())),
    })
    for trap_cap in (0, 2, 3):
        got = links_explode_batch(batch, trap_cap=trap_cap)
        rows = []
        for depth, links in pages:
            rows.extend(links_to_frontier_rows(depth, links, trap_cap))
        want = dedup_candidates(rows)
        got_set = {tuple(r[k] for k in ("loc", "host", "depth",
                                        "seq_no", "seen_key"))
                   for r in got.to_pylist()}
        want_set = {tuple(r[k] for k in ("loc", "host", "depth",
                                         "seq_no", "seen_key"))
                    for r in want}
        assert got_set == want_set, trap_cap
        assert got.num_rows == len(want), trap_cap
        # null metadata columns ride along with the right types
        assert got.schema.field("priority").type == pa.float64()
        assert got.column("lastmod").null_count == got.num_rows

    empty = pa.table({"depth": pa.array([], pa.int64()),
                      "links": pa.array([], pa.list_(pa.string()))})
    assert links_explode_batch(empty).num_rows == 0

    # Arrow edge shapes the row loop never saw: null list entries and
    # null items vanish (list_flatten drops them, the scheme filter
    # null-fills), large_list works like list
    nul = pa.table({
        "depth": pa.array([0, 1], pa.int64()),
        "links": pa.array([["http://a.com/x"], None],
                          pa.list_(pa.string()))})
    assert links_explode_batch(nul).num_rows == 1
    big = pa.table({
        "depth": pa.array([0], pa.int64()),
        "links": pa.array([["http://a.com/x", None, "https://b.com/y"]],
                          pa.large_list(pa.string()))})
    assert links_explode_batch(big).num_rows == 2

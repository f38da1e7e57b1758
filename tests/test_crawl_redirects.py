"""Redirect handling: 3xx targets ride the frontier (never followed
inline), engine/oracle parity, loop termination, HEAD location header."""

import shutil

import pytest

from markdown_lab_ray.config import EngineConfig
from markdown_lab_ray.kernels.urls import redirect_target
from markdown_lab_ray.pipelines.oracle import run_crawl_oracle
from markdown_lab_ray.sources.synth import SiteSpec, SyntheticWeb

SPEC = SiteSpec(n_hosts=6, pages_per_host=12, n_images=40,
                redirect_every=4)
CFG = EngineConfig(requests_per_second=0.1, round_seconds=60.0,
                   max_rounds=4, max_depth=2, seen_shards=4)


@pytest.fixture()
def crawl_dir(tmp_path):
    yield str(tmp_path / "crawl")
    shutil.rmtree(tmp_path / "crawl", ignore_errors=True)


def test_redirect_kernel():
    assert redirect_target(301, "https://b.com/x", "https://a.com/") == \
        "https://b.com/x"
    assert redirect_target(302, "/rel", "https://a.com/d/p") == \
        "https://a.com/rel"
    assert redirect_target(200, "https://b.com", "https://a.com/") is None
    assert redirect_target(301, "", "https://a.com/") is None
    assert redirect_target(404, "x", "https://a.com/") is None


def test_synthetic_web_redirects():
    web = SyntheticWeb(SPEC)
    status, body = web.resolve("https://h000.example.com/page/4")
    assert status == 301
    # page 4 (mod 8 != 0) is a same-host redirect to page 5
    assert body == "https://h000.example.com/page/5"
    # page 8 (mod 8 == 0) crosses hosts
    status8, body8 = web.resolve("https://h000.example.com/page/8")
    assert status8 == 301
    assert body8 == "https://h001.example.com/page/9"
    # HEAD surfaces the location header
    hstatus, headers = web.head("https://h000.example.com/page/4")
    assert hstatus == 301
    assert headers["location"] == body
    # redirect_every=0 web is unchanged (no accidental redirects)
    plain = SyntheticWeb(SiteSpec(n_hosts=6, pages_per_host=12, n_images=40))
    assert plain.resolve("https://h000.example.com/page/4")[0] == 200


def test_oracle_redirect_targets_enter_frontier():
    res = run_crawl_oracle(SyntheticWeb(SPEC).resolve, SPEC.seed_urls(), CFG)
    detail = res["order_detail"]
    redirects = detail[detail["status"] == 301]
    assert len(redirects) > 0
    # at least one redirect TARGET gets fetched in a later round
    fetched_locs = set(detail["loc"])
    spec_targets = {
        SPEC.redirect_target_url(i, j)
        for i in range(SPEC.n_hosts)
        for j in range(SPEC.pages_per_host) if SPEC.is_redirect_page(j)}
    hit = spec_targets & fetched_locs
    assert hit, "no redirect target was ever scheduled"
    # each URL fetched at most once (seen-set handles chains/loops)
    assert detail["loc"].is_unique


def test_ray_crawl_redirect_parity(ray_session, crawl_dir):
    from markdown_lab_ray.pipelines.crawl import read_crawl_order, run_crawl_ray

    oracle = run_crawl_oracle(SyntheticWeb(SPEC).resolve, SPEC.seed_urls(),
                              CFG)
    result = run_crawl_ray(lambda: SyntheticWeb(SPEC), SPEC.seed_urls(),
                           crawl_dir, CFG)
    order = read_crawl_order(crawl_dir)
    assert order["loc"].tolist() == oracle["order"]
    assert set(order["seen_key"]) == oracle["seen"]
    assert result.fetched == oracle["fetched"]
    assert result.failed == oracle["failed"]
    # redirects present (the scenario actually fired) — order parity
    # above then pins the engine to the same redirect-bearing schedule
    detail = oracle["order_detail"]
    assert (detail["status"] == 301).sum() > 0


def test_redirect_loop_terminates():
    """A → B → A: the seen set admits each URL once, so the crawl ends."""

    sitemap = ("<urlset><url><loc>https://loop.example.com/a</loc>"
               "</url></urlset>")

    class LoopWeb:
        def resolve(self, url):
            if url.endswith("/robots.txt"):
                return 404, ""
            if url == "https://loop.example.com/sitemap.xml":
                return 200, sitemap
            if url.endswith(".xml"):
                return 404, ""
            if url == "https://loop.example.com/a":
                return 301, "https://loop.example.com/b"
            if url == "https://loop.example.com/b":
                return 301, "https://loop.example.com/a"
            if url == "https://loop.example.com":
                return 301, "https://loop.example.com/a"
            return 404, ""

    cfg = EngineConfig(requests_per_second=1.0, round_seconds=60.0,
                       max_rounds=10, max_depth=10)
    res = run_crawl_oracle(LoopWeb().resolve,
                           ["https://loop.example.com"], cfg)
    order = res["order_detail"]["loc"].tolist()
    assert order.count("https://loop.example.com/a") == 1
    assert order.count("https://loop.example.com/b") == 1

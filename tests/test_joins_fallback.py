import pyarrow as pa
import pytest

from markdown_lab_ray.kernels.fallback_convert import fallback_html_to_markdown
from markdown_lab_ray.kernels.html_kernels import extract_title_fast


def test_fallback_converter_shapes():
    # mirrors the reference fallback semantics (markdown_lab_rs.py:20-156)
    html = ("<html><head><title>T</title><script>x()</script></head><body>"
            "<h1>Head</h1><h2>Sub</h2><p>para</p>"
            '<a href="/l">link</a><img src="/i.png" alt="pic">'
            "<pre><code>c = 1</code></pre>"
            "<blockquote>q1\nq2</blockquote>"
            "<ul><li>item</li></ul></body></html>")
    md = fallback_html_to_markdown(html, "https://e.com")
    assert md.startswith("# T\n\n")
    assert "# Head" in md and "## Sub" in md
    assert "[link](https://e.com/l)" in md
    assert "![pic](https://e.com/i.png)" in md
    assert "```\nc = 1\n```" in md
    assert "> q1\n> q2" in md
    assert "- item" in md
    assert "x()" not in md


def test_fallback_entities_decoded_before_strip():
    md = fallback_html_to_markdown("<p>a &amp; b</p>")
    assert "a & b" in md


def test_extract_title_fast():
    assert extract_title_fast("<title>My Title </title>") == "My Title"
    assert extract_title_fast("<h1>H1 here</h1>") == "H1 here"
    assert extract_title_fast("<p>none</p>") is None
    assert extract_title_fast("<TITLE>caps</TITLE>") == "caps"


def test_bucketed_hash_join(ray_session):
    import ray.data as rd

    from markdown_lab_ray.stages.joins import bucketed_hash_join

    left = rd.from_arrow(pa.table({
        "k": [1, 2, 3, 4, 2], "lval": ["a", "b", "c", "d", "b2"]}))
    right = rd.from_arrow(pa.table({
        "k": [2, 3, 5], "rval": [20, 30, 50]}))
    out = bucketed_hash_join(left, right, key="k", n_buckets=4).to_pandas()
    out = out.sort_values(["k", "lval"]).reset_index(drop=True)
    assert out[["k", "lval", "rval"]].values.tolist() == [
        [2, "b", 20], [2, "b2", 20], [3, "c", 30]]


def test_hash_join_collision_rejected(ray_session):
    import ray.data as rd

    from markdown_lab_ray.stages.joins import bucketed_hash_join

    a = rd.from_arrow(pa.table({"k": [1], "v": [1]}))
    b = rd.from_arrow(pa.table({"k": [1], "v": [2]}))
    with pytest.raises(ValueError):
        bucketed_hash_join(a, b, key="k")


def test_fetch_stage_payload_cache(ray_session):
    from markdown_lab_ray.pipelines.crawl import FetchStage
    from markdown_lab_ray.sources.synth import SiteSpec, SyntheticWeb

    spec = SiteSpec(n_hosts=2, pages_per_host=4)
    stage = FetchStage(lambda: SyntheticWeb(spec), cache_ttl=3600.0)
    batch = pa.table({"loc": [spec.page_url(0, 1), spec.page_url(0, 1)]})
    out = stage(batch)
    assert out.column("status").to_pylist() == [200, 200]
    assert stage.web.hits == 1  # second fetch of the same URL was cached


def test_fetch_stage_realtime_pacing():
    """Per-host token buckets space requests at pacing_rps; other hosts
    are not delayed by a hot host's bucket (injected clock, no sleep)."""
    from markdown_lab_ray.pipelines.crawl import FetchStage
    from markdown_lab_ray.sources.synth import SiteSpec, SyntheticWeb

    spec = SiteSpec(n_hosts=2, pages_per_host=4)
    clock = {"t": 0.0}
    sleeps = []

    def fake_sleep(dt):
        sleeps.append(round(dt, 3))
        clock["t"] += dt

    stage = FetchStage(lambda: SyntheticWeb(spec), pacing_rps=2.0,
                       clock=lambda: clock["t"], sleeper=fake_sleep)
    batch = pa.table({
        "loc": [spec.page_url(0, 0), spec.page_url(0, 1),
                spec.page_url(0, 2), spec.page_url(1, 0)],
        "host": [spec.host(0)] * 3 + [spec.host(1)],
    })
    out = stage(batch)
    assert out.column("status").to_pylist() == [200] * 4
    # host 0: first two requests use the 2-token burst, third waits 0.5s;
    # host 1 has its own fresh bucket → no wait
    assert sleeps == [0.5]

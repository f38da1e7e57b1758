from markdown_lab_ray.kernels.sitemap import (
    export_frontier_lines,
    filter_frontier_rows,
    parse_links_file,
    parse_sitemap_xml,
    sitemaps_from_robots,
    well_known_sitemap_urls,
)

URLSET = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
    <url>
        <loc>https://example.com/</loc>
        <lastmod>2023-05-17</lastmod>
        <changefreq>daily</changefreq>
        <priority>1.0</priority>
    </url>
    <url>
        <loc>https://example.com/about</loc>
        <lastmod>2023-05-16</lastmod>
        <changefreq>weekly</changefreq>
        <priority>0.8</priority>
    </url>
    <url>
        <loc>https://example.com/contact</loc>
        <changefreq>monthly</changefreq>
        <priority>0.5</priority>
    </url>
</urlset>
"""

INDEX = """<?xml version="1.0" encoding="UTF-8"?>
<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
    <sitemap><loc>https://example.com/sitemap1.xml</loc></sitemap>
    <sitemap><loc>https://example.com/sitemap2.xml</loc></sitemap>
</sitemapindex>
"""


def test_parse_urlset():
    # ref tests/unit/test_sitemap_utils.py:23-65
    rows, children = parse_sitemap_xml(URLSET)
    assert children == []
    assert len(rows) == 3
    assert rows[0] == {"loc": "https://example.com/", "lastmod": "2023-05-17",
                       "changefreq": "daily", "priority": 1.0}
    assert rows[2]["lastmod"] is None
    assert rows[2]["priority"] == 0.5


def test_parse_index():
    rows, children = parse_sitemap_xml(INDEX)
    assert rows == []
    assert children == ["https://example.com/sitemap1.xml",
                        "https://example.com/sitemap2.xml"]


def test_parse_no_namespace():
    xml = "<urlset><url><loc>https://e.com/a</loc></url></urlset>"
    rows, _ = parse_sitemap_xml(xml)
    assert rows[0]["loc"] == "https://e.com/a"


def test_parse_malformed():
    assert parse_sitemap_xml("<<<not xml") == ([], [])
    assert parse_sitemap_xml("<urlset><url></url></urlset>") == ([], [])


def test_robots_sitemap_lines():
    robots = ("User-agent: *\nDisallow: /admin\n"
              "  Sitemap: https://e.com/custom.xml  \n"
              "sitemap: https://e.com/second.xml\n")
    assert sitemaps_from_robots(robots) == [
        "https://e.com/custom.xml", "https://e.com/second.xml"]
    assert sitemaps_from_robots("User-agent: *\n") == []


def test_well_known_locations():
    locs = well_known_sitemap_urls("https://e.com")
    assert locs[0] == "https://e.com/sitemap.xml"
    assert len(locs) == 4


ROWS = [
    {"loc": "https://e.com/a", "lastmod": None, "changefreq": None, "priority": 0.9},
    {"loc": "https://e.com/blog/b", "lastmod": None, "changefreq": None, "priority": None},
    {"loc": "https://e.com/c", "lastmod": None, "changefreq": None, "priority": 0.2},
    {"loc": "https://e.com/blog/d", "lastmod": None, "changefreq": None, "priority": 0.8},
]


def test_filter_priority_none_passes():
    out = filter_frontier_rows(ROWS, min_priority=0.5)
    assert [r["loc"] for r in out] == [
        "https://e.com/a", "https://e.com/blog/b", "https://e.com/blog/d"]


def test_filter_include_exclude_limit():
    out = filter_frontier_rows(ROWS, include_patterns=["/blog/"])
    assert [r["loc"] for r in out] == ["https://e.com/blog/b", "https://e.com/blog/d"]
    out = filter_frontier_rows(ROWS, exclude_patterns=["/blog/"])
    assert [r["loc"] for r in out] == ["https://e.com/a", "https://e.com/c"]
    out = filter_frontier_rows(ROWS, limit=2)
    assert len(out) == 2
    assert out[0]["loc"] == "https://e.com/a"


def test_links_file():
    body = "# comment\n\nhttps://a.com\n  https://b.com  \n# other\n"
    assert parse_links_file(body) == ["https://a.com", "https://b.com"]


def test_export_lines():
    text = export_frontier_lines(ROWS[:2])
    assert text == "https://e.com/a,0.9\nhttps://e.com/blog/b\n"

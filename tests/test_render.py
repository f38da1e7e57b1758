import json

from markdown_lab_ray.kernels.html_kernels import parse_html_to_document
from markdown_lab_ray.kernels.render import (
    document_to_json,
    document_to_markdown,
    document_to_xml,
    format_json,
    format_markdown,
    format_xml,
    normalize_format,
    render_document,
)

BASIC_HTML = ("<html><head><title>Test Page</title></head><body>"
              "<h1>Main Title</h1><p>This is a test paragraph.</p>"
              "<ul><li>Item 1</li><li>Item 2</li></ul></body></html>")


def test_markdown_basic():
    # ref src/tests.rs:46-58
    md = document_to_markdown(parse_html_to_document(BASIC_HTML, "https://example.com"))
    assert "# Test Page" in md
    assert "# Main Title" in md
    assert "This is a test paragraph." in md
    assert "- Item 1" in md
    assert "- Item 2" in md


def test_markdown_links_and_images():
    # ref src/tests.rs:61-71
    html = '<div><a href="/test">Test Link</a><img src="/image.jpg" alt="Test Image"></div>'
    md = document_to_markdown(parse_html_to_document(html, "https://example.com"))
    assert "[Test Link](https://example.com/test)" in md
    assert "![Test Image](https://example.com/image.jpg)" in md


def test_markdown_code_blocks():
    # ref src/tests.rs:74-83
    html = '<pre><code class="language-rust">fn main() { println!("Hello, world!"); }</code></pre>'
    md = document_to_markdown(parse_html_to_document(html, "https://example.com"))
    assert "```rust" in md
    assert "fn main()" in md


def test_markdown_skips_unresolvable_links():
    # ref src/tests.rs:86-99
    html = ('<div><a href="javascript:void(0)">Skip JS</a>'
            '<a href="::::bad::::">Skip Bad</a><a href="/ok">OK</a></div>')
    md = document_to_markdown(parse_html_to_document(html, "https://example.com"))
    assert "Skip JS" not in md
    assert "::::bad::::" not in md
    assert "[OK](https://example.com/ok)" in md


def test_markdown_ordered_list_and_blockquote():
    doc = {
        "title": "T", "base_url": "https://e.com", "headings": [],
        "paragraphs": [], "links": [], "images": [],
        "lists": [{"ordered": True, "items": ["a", "b"]}],
        "code_blocks": [], "blockquotes": ["line1\nline2"],
    }
    md = document_to_markdown(doc)
    assert "1. a\n2. b" in md
    assert "> line1\n> line2" in md


def test_markdown_blank_line_collapse():
    doc = {
        "title": "T", "base_url": "https://e.com", "headings": [],
        "paragraphs": ["p1"], "links": [], "images": [],
        "lists": [{"ordered": False, "items": ["x"]}],
        "code_blocks": [], "blockquotes": [],
    }
    md = document_to_markdown(doc)
    assert "\n\n\n" not in md
    assert not md.endswith("\n")


def test_json_shape():
    doc = parse_html_to_document(BASIC_HTML, "https://example.com")
    out = json.loads(document_to_json(doc))
    assert list(out.keys()) == ["title", "base_url", "headings", "paragraphs",
                                "links", "images", "lists", "code_blocks",
                                "blockquotes"]
    assert out["title"] == "Test Page"
    assert out["headings"][0] == {"level": 1, "text": "Main Title"}


def test_xml_shape():
    # ref tests/integration/test_comprehensive.py:131-134 — <Document> root
    doc = parse_html_to_document(BASIC_HTML, "https://example.com")
    xml = document_to_xml(doc)
    assert "<Document>" in xml
    assert '<heading level="1">Main Title</heading>' in xml
    assert "<title>Test Page</title>" in xml


def test_normalize_format():
    assert normalize_format("MARKDOWN") == "markdown"
    assert normalize_format("bogus") == "markdown"
    assert normalize_format("xml") == "xml"
    assert normalize_format(None) == "markdown"


def test_render_dispatch():
    doc = parse_html_to_document(BASIC_HTML, "https://example.com")
    assert render_document(doc, "json").startswith("{")
    assert "<Document>" in render_document(doc, "xml")
    assert render_document(doc, "markdown").startswith("# Test Page")


def test_format_markdown_metadata():
    out = format_markdown("body", {"title": "T", "source_url": "https://u",
                                   "generated_at": "2020-01-01T00:00:00"})
    assert out.startswith("# T\n")
    assert "*Source: https://u*" in out
    assert "*Generated: 2020-01-01T00:00:00*" in out
    assert out.endswith("\n\nbody")
    assert format_markdown("", {"title": "T"}) == ""


def test_format_json_metadata_and_wrap():
    out = json.loads(format_json('{"a": 1}', {"title": "T"}))
    assert out["metadata"]["title"] == "T"
    assert out["metadata"]["format"] == "json"
    wrapped = json.loads(format_json("not json", {"title": "T"}))
    assert "error" in wrapped
    assert wrapped["content"] == "not json"


def test_format_xml_metadata_and_wrap():
    out = format_xml("<Document><title>x</title></Document>", {"title": "T"})
    assert "<metadata>" in out
    assert "<format>xml</format>" in out
    wrapped = format_xml("<<<bad", {"title": "T"})
    assert "<error>" in wrapped

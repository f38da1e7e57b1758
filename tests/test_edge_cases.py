"""Edge cases mirrored from the reference's tests/unit/test_edge_cases.py
(FIXTURES.md §2): malformed nesting, bombs, odd encodings, determinism."""

from markdown_lab_ray.kernels.chunker import create_semantic_chunks
from markdown_lab_ray.kernels.html_kernels import parse_html_to_document
from markdown_lab_ray.kernels.render import document_to_markdown

BASE = "https://e.com"


def test_unclosed_tags():
    doc = parse_html_to_document("<p>one<p>two<div><b>bold", BASE)
    assert "one" in doc["paragraphs"] and "two" in doc["paragraphs"]


def test_deep_nesting_50():
    html = "<div>" * 50 + "<p>deep</p>" + "</div>" * 50
    doc = parse_html_to_document(html, BASE)
    assert doc["paragraphs"] == ["deep"]


def test_div_bomb_10k():
    html = "<div>" * 10_000 + "<p>core</p>"
    doc = parse_html_to_document(html, BASE)
    assert doc["paragraphs"] == ["core"]


def test_empty_and_whitespace():
    for html in ("", "   \n\t  "):
        doc = parse_html_to_document(html, BASE)
        assert doc["title"] == "No Title"
        assert document_to_markdown(doc) == "# No Title"


def test_replacement_char_and_unicode():
    html = "<p>bad � char — café 中文</p>"
    doc = parse_html_to_document(html, BASE)
    assert "café" in doc["paragraphs"][0]
    assert "中文" in doc["paragraphs"][0]


def test_attribute_edge_cases():
    html = ('<a href>empty</a><a href="">blank</a>'
            '<img src="/x.png" alt="">')
    doc = parse_html_to_document(html, BASE)
    assert doc["links"] == []
    # empty alt falls back to "image" (rust unwrap_or applies only to
    # missing attr; empty string alt="" is falsy in our port — match
    # the reference default)
    assert doc["images"][0]["src"] == "https://e.com/x.png"


def test_convert_deterministic():
    html = ("<html><head><title>D</title></head><body><h1>H</h1>"
            "<p>text here</p><ul><li>i</li></ul></body></html>")
    out1 = document_to_markdown(parse_html_to_document(html, BASE))
    out2 = document_to_markdown(parse_html_to_document(html, BASE))
    assert out1 == out2
    c1 = create_semantic_chunks(out1, BASE)
    c2 = create_semantic_chunks(out2, BASE)
    assert [c["id"] for c in c1] == [c["id"] for c in c2]


def test_huge_single_line_chunking():
    md = "# T\n" + "word " * 5000
    chunks = create_semantic_chunks(md, BASE, chunk_size=500, chunk_overlap=100)
    assert len(chunks) > 5
    assert all(c["chunk_type"] == "content_chunk" for c in chunks)

import pytest

from markdown_lab_ray.kernels.chunker import (
    chunk_markdown,
    chunk_markdown_char,
    chunk_markdown_section,
    create_semantic_chunks,
    semantic_density,
    validate_chunk_params,
)


# -- char-budget (Rust rule-set) --------------------------------------------

def test_basic_chunking():
    # ref src/tests.rs:105-112
    md = ("# Title\n\n## Section 1\n\nThis is a test paragraph.\n\n"
          "## Section 2\n\n* List item 1\n* List item 2")
    chunks = chunk_markdown(md, 500, 50)
    assert chunks
    assert "# Title" in chunks[0]


def test_chunk_overlap_split():
    # ref src/tests.rs:115-127
    md = "# First\n\nContent 1\n\n# Second\n\nContent 2\n\n# Third\n\nContent 3"
    chunks = chunk_markdown(md, 20, 10)
    assert len(chunks) > 1
    assert "First" in chunks[0]
    assert "Second" in chunks[1]


def test_char_chunk_metadata():
    md = "# Head\nSome content with Data and 42 numbers."
    rows = chunk_markdown_char(md, 1000, 200)
    assert len(rows) == 1
    row = rows[0]
    assert row["heading"] == "Head"
    assert row["level"] == 1
    assert row["position"] == 0
    assert row["word_count"] == len(row["content"].split())
    assert row["char_count"] == len(row["content"])
    assert row["semantic_density"] > 0


def test_heading_starts_new_chunk():
    md = "intro line\n# H1\nbody"
    rows = chunk_markdown_char(md, 1000, 100)
    assert len(rows) == 2
    assert rows[0]["heading"] is None
    assert rows[1]["heading"] == "H1"
    assert rows[1]["content"].startswith("# H1")


def test_split_prefers_paragraph_boundary():
    body = "aaaa bbbb. cccc dddd\n\nnext para " + "x" * 30
    rows = chunk_markdown_char(body, 30, 10)
    # the first split lands just after the paragraph boundary
    assert rows[0]["content"].endswith("dddd\n\n") or "\n\n" not in rows[0]["content"]


def test_semantic_density_formula():
    assert semantic_density("") == 0.0
    # 2 words, one semantic keyword: 0.7/2 + 2/100 = 0.37
    assert abs(semantic_density("data word") - (0.35 + 0.02)) < 1e-9
    # capped at 1.0 + length bonus
    dense = "data " * 4
    assert semantic_density(dense) <= 1.2


def test_validation():
    for bad in [(0, 0), (-5, 1), (10, 10), (10, 11)]:
        with pytest.raises((ValueError, TypeError)):
            validate_chunk_params(*bad)
    with pytest.raises(TypeError):
        validate_chunk_params("10", 1)
    with pytest.raises(ValueError):
        chunk_markdown("x", 10, 10)


# -- section-aware (Python rule-set) ----------------------------------------

def test_create_chunks_from_markdown_sections():
    # ref tests/unit/test_chunk_utils.py:19-46
    md = ("# Title\n\n## Section 1\nThis is content for section 1.\n"
          "It has multiple lines.\n\n## Section 2\n"
          "This is content for section 2.\nIt also has multiple lines.\n")
    chunks = chunk_markdown_section(md, "https://example.com/test")
    assert len(chunks) == 2
    assert "# Title" in chunks[0]["content"]
    assert "## Section 1" in chunks[0]["content"]
    assert "## Section 2" in chunks[1]["content"]
    assert chunks[0]["heading"] == "# Title"
    assert chunks[1]["heading"] == "## Section 2"
    assert chunks[0]["source_url"] == "https://example.com/test"
    assert chunks[0]["chunk_type"] == "section"
    assert chunks[0]["domain"] == "example.com"


def test_large_section_splits_with_shared_heading():
    # ref tests/unit/test_chunk_utils.py:48-68
    md = "# Large Section\n" + "This is a word. " * 500
    chunks = chunk_markdown_section(md, "https://example.com/test",
                                    chunk_size=100, chunk_overlap=20)
    assert len(chunks) > 1
    assert all(c["heading"] == "# Large Section" for c in chunks)
    assert all(c["chunk_type"] == "content_chunk" for c in chunks)
    assert chunks[0]["position"] == 0
    assert chunks[1]["position"] == 1


def test_create_semantic_chunks_dispatch():
    # ref tests/unit/test_chunk_utils.py:110-122
    chunks = create_semantic_chunks("# Test\n\nThis is a test.",
                                    "https://example.com/test")
    assert len(chunks) == 1
    assert chunks[0]["heading"] == "# Test"

    chunks = create_semantic_chunks(
        "This is just plain text without any markdown headers.",
        "https://example.com/test")
    assert len(chunks) == 1
    assert chunks[0]["chunk_type"] == "text_chunk"


def test_chunk_ids_deterministic():
    md = "# A\ncontent"
    a = chunk_markdown_section(md, "https://e.com/x")
    b = chunk_markdown_section(md, "https://e.com/x")
    assert a[0]["id"] == b[0]["id"]
    c = chunk_markdown_section(md, "https://e.com/y")
    assert a[0]["id"] != c[0]["id"]


def test_h2_merge_rule():
    # first h2 under h1 merges; second starts a new section
    md = "# T\n## A\nbody\n## B\nbody2\n"
    chunks = chunk_markdown_section(md, "https://e.com")
    assert len(chunks) == 2
    assert "## A" in chunks[0]["content"]
    assert chunks[1]["heading"] == "## B"


def test_h3_stays_in_section():
    md = "# T\n## A\n### deep\nbody\n"
    chunks = chunk_markdown_section(md, "https://e.com")
    assert len(chunks) == 1
    assert "### deep" in chunks[0]["content"]

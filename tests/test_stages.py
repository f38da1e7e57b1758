import pyarrow as pa

from markdown_lab_ray.sources.synth import SiteSpec, SyntheticWeb, page_html
from markdown_lab_ray.stages.convert import (
    char_chunk_explode_batch,
    chunk_explode_batch,
    convert_fused_batch,
    extract_links_batch,
    parse_batch,
    render_batch,
)

SPEC = SiteSpec(n_hosts=3, pages_per_host=5, n_images=20)


def _pages_table(n=3):
    urls = [SPEC.page_url(0, j) for j in range(n)]
    htmls = [page_html(SPEC, 0, j) for j in range(n)]
    return pa.table({"url": urls, "html": htmls})


def test_parse_batch_schema_and_content():
    out = parse_batch(_pages_table())
    assert out.column_names == ["url", "doc"]
    doc = out.column("doc").to_pylist()[1]
    assert doc["title"].startswith("Page 1")
    assert any(h["level"] == 1 for h in doc["headings"])
    assert doc["paragraphs"]
    assert doc["images"]
    # strip-targets removed
    assert all("BUY" not in p for p in doc["paragraphs"])


def test_parse_batch_bad_html_tolerated():
    t = pa.table({"url": ["https://e.com/x"], "html": [None]})
    out = parse_batch(t)
    assert out.num_rows == 1
    assert out.column("doc").to_pylist()[0]["title"] == "No Title"


def test_render_batch_formats():
    docs = parse_batch(_pages_table(1))
    md = render_batch(docs, "markdown")
    assert md.column("payload").to_pylist()[0].startswith("# Page 0")
    xml = render_batch(docs, "xml")
    assert "<Document>" in xml.column("payload").to_pylist()[0]
    with_meta = render_batch(docs, "markdown", with_metadata=True)
    assert "*Source: https://h000.example.com/page/0*" in \
        with_meta.column("payload").to_pylist()[0]


def test_chunk_explode():
    docs = parse_batch(_pages_table(2))
    md = render_batch(docs, "markdown")
    chunks = chunk_explode_batch(md)
    assert chunks.num_rows >= 2
    assert set(chunks.column("source_url").to_pylist()) == \
        set(md.column("url").to_pylist())
    assert all(t in ("section", "content_chunk", "text_chunk")
               for t in chunks.column("chunk_type").to_pylist())


def test_char_chunk_explode():
    md = pa.table({"url": ["u1"], "payload": ["# H\n" + "word " * 400]})
    chunks = char_chunk_explode_batch(md, chunk_size=200, chunk_overlap=50)
    assert chunks.num_rows > 1
    assert chunks.column("heading").to_pylist()[0] == "H"
    densities = chunks.column("semantic_density").to_pylist()
    assert all(d >= 0 for d in densities)


def test_extract_links_batch():
    out = extract_links_batch(_pages_table(1))
    dsts = out.column("dst_url").to_pylist()
    assert dsts == sorted(set(dsts))
    assert all(d.startswith("http") for d in dsts)


def test_convert_fused():
    out = convert_fused_batch(_pages_table(3))
    assert out.num_rows == 3
    assert all(n > 0 for n in out.column("n_chunks").to_pylist())
    assert all(n > 0 for n in out.column("n_links").to_pylist())
    assert out.column("payload").to_pylist()[0].startswith("# Page 0")


def test_fused_on_dataset(ray_session):
    import ray.data as rd
    ds = rd.from_arrow(_pages_table(5)).map_batches(
        convert_fused_batch, batch_format="pyarrow", zero_copy_batch=True)
    rows = ds.take_all()
    assert len(rows) == 5
    assert all(r["n_chunks"] > 0 for r in rows)

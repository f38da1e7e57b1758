"""Flagship convert pipeline over the driver's ``documents`` table.

``documents.text`` (plain text corpus) is deterministically wrapped
into synthetic HTML pages (title/h1/paragraphs — FIXTURES.md §2 shape),
then run through the real parse → render → chunk stages.  This is the
reference's `mlab batch` lifecycle (SURVEY.md §3.3) restated as a
streaming Dataset pipeline.
"""

from __future__ import annotations

import pyarrow as pa

from ..config import EngineConfig
from .crawl_spec import SEED_STRIDE  # noqa: F401  (re-export convenience)


def doc_page_url(source: str, doc_id: int) -> str:
    return f"https://docs.example.com/{source}/{doc_id}"


def wrap_documents_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, text, source) → (url, html): deterministic page wrapper
    (title, h1, ~30-word paragraphs, a trailing list)."""
    ids = batch.column("doc_id").to_pylist()
    texts = batch.column("text").to_pylist()
    sources = batch.column("source").to_pylist()
    urls, htmls = [], []
    for doc_id, text, source in zip(ids, texts, sources):
        words = (text or "").split()
        paras = [" ".join(words[i:i + 30]) for i in range(0, len(words), 30)]
        body = "\n".join(f"<p>{p}</p>" for p in paras)
        items = "".join(f"<li>{w}</li>" for w in words[:3])
        htmls.append(
            f"<html><head><title>Doc {doc_id}</title></head><body>"
            f"<h1>Document {doc_id}</h1><h2>{source}</h2>\n{body}\n"
            f"<ul>{items}</ul></body></html>")
        urls.append(doc_page_url(source, doc_id))
    return pa.table({"url": pa.array(urls, pa.string()),
                     "html": pa.array(htmls, pa.string())})


def documents_pages(sf_dir: str, columns=("doc_id", "text", "source")):
    import ray
    import ray.data as rd

    # single-file parquet reads can come out as one block; force enough
    # blocks that the CPU-bound parse chain saturates the cluster
    n_blocks = max(8, int(ray.cluster_resources().get("CPU", 8)) * 2)
    return rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=list(columns),
                           override_num_blocks=n_blocks).map_batches(
        wrap_documents_batch, batch_format="pyarrow", zero_copy_batch=True)


def convert_documents(sf_dir: str, cfg: EngineConfig | None = None):
    """documents → fused convert (title, markdown payload, counts)."""
    from ..stages.convert import convert_fused_batch

    cfg = cfg or EngineConfig()
    return documents_pages(sf_dir).map_batches(
        convert_fused_batch, batch_format="pyarrow",
        batch_size=cfg.parse_batch_size,
        fn_kwargs=dict(chunk_size=cfg.chunk_size,
                       chunk_overlap=cfg.chunk_overlap))


def chunk_documents(sf_dir: str, cfg: EngineConfig | None = None):
    """documents → section-mode chunk rows (full three-stage path)."""
    from ..stages.convert import chunk_explode_batch, parse_batch, render_batch

    cfg = cfg or EngineConfig()
    return (documents_pages(sf_dir)
            .map_batches(parse_batch, batch_format="pyarrow",
                         batch_size=cfg.parse_batch_size,
                         zero_copy_batch=True)
            .map_batches(render_batch, batch_format="pyarrow")
            .map_batches(chunk_explode_batch, batch_format="pyarrow",
                         batch_size=cfg.chunk_batch_size,
                         fn_kwargs=dict(chunk_size=cfg.chunk_size,
                                        chunk_overlap=cfg.chunk_overlap)))

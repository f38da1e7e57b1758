"""Crawled-image validation: join page ``<img>`` references against the
image+caption table and check the per-row invariants (BASELINE.json
input_hint): decoded-pixel PSNR ≥ 40 dB (exact for png) and alt-text ==
caption.

Join strategy: the discovered (alt, src) pairs are exploded to rows,
``image_id`` is derived from the src URL, and the image table side is
probed via a *broadcast* id→row lookup (``ray.put`` once, read in every
task) — the image table at test scale is small.  At 10^10 scale the
broadcast flips to a hash join: bucket both sides by
``hash(image_id) % B`` and join per bucket (SURVEY §2.5).
"""

from __future__ import annotations

import os

import pyarrow as pa


def explode_image_refs_batch(batch: pa.Table) -> pa.Table:
    """docs rows (url, images list<struct{alt,src}>) → one row per image
    reference with the image_id parsed from the src URL."""
    urls, alts, srcs, ids = [], [], [], []
    for url, images in zip(batch.column("url").to_pylist(),
                           batch.column("images").to_pylist()):
        for ref in images or []:
            src = ref["src"]
            stem = src.rsplit("/", 1)[-1].rsplit(".", 1)[0]
            urls.append(url)
            alts.append(ref["alt"])
            srcs.append(src)
            ids.append(stem)
    return pa.table({
        "page_url": pa.array(urls, pa.string()),
        "alt": pa.array(alts, pa.string()),
        "src": pa.array(srcs, pa.string()),
        "image_id": pa.array(ids, pa.string()),
    })


class JoinImageTable:
    """Broadcast-join stage: attach bytes/w/h/fmt/caption/phash from the
    image table to each reference row (misses get nulls)."""

    def __init__(self, table_ref):
        import ray
        table: pa.Table = ray.get(table_ref)
        self.lookup = {row["image_id"]: row for row in table.to_pylist()}

    def __call__(self, batch: pa.Table) -> pa.Table:
        cols = {"bytes": [], "w": [], "h": [], "fmt": [],
                "caption": [], "phash": []}
        found = []
        for image_id in batch.column("image_id").to_pylist():
            row = self.lookup.get(image_id)
            found.append(row is not None)
            for key in cols:
                cols[key].append(row[key] if row else None)
        out = batch
        out = out.append_column("found", pa.array(found, pa.bool_()))
        out = out.append_column("bytes", pa.array(cols["bytes"], pa.binary()))
        out = out.append_column("w", pa.array(cols["w"], pa.int32()))
        out = out.append_column("h", pa.array(cols["h"], pa.int32()))
        out = out.append_column("fmt", pa.array(cols["fmt"], pa.string()))
        out = out.append_column("caption",
                                pa.array(cols["caption"], pa.string()))
        out = out.append_column("phash", pa.array(cols["phash"], pa.int64()))
        return out


def validate_crawled_images(crawl_out_dir: str, images_table: pa.Table,
                            ref_fn=None, batch_size: int = 64,
                            concurrency=(1, 4)):
    """Read every round's docs checkpoint, explode image refs, join the
    image table, decode+validate.  Returns the validation Dataset
    (page_url, image_id, found, psnr_db, pixels_ok, caption_ok, ...)."""
    import glob

    import ray
    import ray.data as rd

    from ..stages.images import DecodeValidate

    doc_files = sorted(glob.glob(
        os.path.join(crawl_out_dir, "rounds", "round=*", "docs", "*.parquet")))
    if not doc_files:
        raise FileNotFoundError(f"no docs checkpoints under {crawl_out_dir}")
    docs = rd.read_parquet(doc_files, columns=["url", "images"])

    refs = docs.map_batches(explode_image_refs_batch, batch_format="pyarrow")
    table_ref = ray.put(images_table)
    joined = refs.map_batches(
        JoinImageTable, batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency,
        fn_constructor_kwargs=dict(table_ref=table_ref)).materialize()
    matched = joined.filter(expr="found == True")
    validated = matched.map_batches(
        DecodeValidate, batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency,
        fn_constructor_kwargs=dict(ref_fn=ref_fn))

    def missing_row_batch(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table({
            "image_id": batch.column("image_id"),
            "fmt": pa.nulls(n, pa.string()),
            "psnr_db": pa.array([0.0] * n, pa.float64()),
            "pixels_ok": pa.array([False] * n, pa.bool_()),
            "caption_ok": pa.array([False] * n, pa.bool_()),
            "phash_decoded": pa.array([0] * n, pa.int64()),
            "phash": pa.nulls(n, pa.int64()),
            "page_url": batch.column("page_url"),
        })

    def conform_validated(batch: pa.Table) -> pa.Table:
        cols = {}
        for name, typ in (("image_id", pa.string()), ("fmt", pa.string()),
                          ("psnr_db", pa.float64()),
                          ("pixels_ok", pa.bool_()),
                          ("caption_ok", pa.bool_()),
                          ("phash_decoded", pa.int64()),
                          ("phash", pa.int64()),
                          ("page_url", pa.string())):
            col = (batch.column(name) if name in batch.column_names
                   else pa.nulls(batch.num_rows, typ))
            cols[name] = col.cast(typ) if col.type != typ else col
        return pa.table(cols)

    # references that miss the image table are FAILURE rows, not
    # silently dropped (found=False → pixels_ok/caption_ok False)
    missing = joined.filter(expr="found == False").map_batches(
        missing_row_batch, batch_format="pyarrow")
    return validated.map_batches(conform_validated,
                                 batch_format="pyarrow").union(missing)

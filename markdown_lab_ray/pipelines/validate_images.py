"""Crawled-image validation: join page ``<img>`` references against the
image+caption table and check the per-row invariants (BASELINE.json
input_hint): decoded-pixel PSNR ≥ 40 dB (exact for png) and alt-text ==
caption.

Join strategy (auto-switched by measured table size):

- **broadcast** — the image table fits the object store comfortably
  (in-memory ``pa.Table`` ≤ ``broadcast_max_bytes``): ``ray.put`` once,
  every task probes it with vectorized ``pc.index_in`` + ``take``
  (zero-copy read, no per-row Python).
- **bucketed** — anything larger, or any table given as a
  path/Dataset (the 100-TB Lance corpus case): the table side is first
  pruned to the *referenced* ids (distinct image_ids from the exploded
  refs, broadcast as a filter set when they fit — unreferenced image
  BYTES then never enter a shuffle), then joined via
  ``joins.bucketed_left_lookup_join`` — one bucketed shuffle, Arrow
  ``pc.index_in``+``take`` probe per bucket, never a full-table
  materialization on driver or actor.

Partitioning assumption of the bucketed path: one (bucket) group's rows
fit a task — raise ``n_buckets`` for bigger corpora (same contract as
``stages/joins.py``).
"""

from __future__ import annotations

import logging
import os

import pyarrow as pa

logger = logging.getLogger("markdown_lab_ray.validate_images")

# ordered output columns every join strategy conforms to
_JOINED_FIELDS = [
    ("page_url", pa.string()), ("alt", pa.string()), ("src", pa.string()),
    ("image_id", pa.string()), ("bytes", pa.binary()), ("w", pa.int32()),
    ("h", pa.int32()), ("fmt", pa.string()), ("caption", pa.string()),
    ("phash", pa.int64()), ("found", pa.bool_()),
]
_JOINED_SCHEMA = pa.schema(_JOINED_FIELDS)

_TABLE_COLS = ("bytes", "w", "h", "fmt", "caption", "phash")


def explode_image_refs_batch(batch: pa.Table) -> pa.Table:
    """docs rows (url, images list<struct{alt,src}>) → one row per image
    reference with the image_id parsed from the src URL.  Fully
    vectorized: list_flatten + parent-index take for the explode, regex
    substring kernels for the basename/stem — no Python loop in the
    flagship join's feed stage."""
    import pyarrow.compute as pc

    images = batch.column("images").combine_chunks()
    flat = pc.list_flatten(images)  # struct{alt, src} array
    parents = pc.list_parent_indices(images)
    urls = batch.column("url").take(parents)
    alts = pc.struct_field(flat, "alt")
    srcs = pc.struct_field(flat, "src")
    basenames = pc.replace_substring_regex(srcs, r"^.*/", "")
    stems = pc.replace_substring_regex(basenames, r"\.[^./]*$", "")
    return pa.table({
        "page_url": urls.cast(pa.string()) if urls.type != pa.string()
        else urls,
        "alt": alts.cast(pa.string()),
        "src": srcs.cast(pa.string()),
        "image_id": stems.cast(pa.string()),
    })


class JoinImageTable:
    """Broadcast-join stage (small table only): attach
    bytes/w/h/fmt/caption/phash from the image table to each reference
    row (misses get nulls + found=False).  Probe is vectorized
    ``pc.index_in`` + ``Table.take`` — no per-row Python dict."""

    def __init__(self, table_ref):
        import ray
        table: pa.Table = ray.get(table_ref)  # zero-copy from object store
        self.ids = table.column("image_id").combine_chunks()
        self.payload = table.select(list(_TABLE_COLS))

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        idx = pc.index_in(batch.column("image_id").combine_chunks(),
                          value_set=self.ids)
        picked = self.payload.take(idx)  # null index → all-null row
        out = batch
        for name in _TABLE_COLS:
            out = out.append_column(name, picked.column(name))
        return out.append_column("found", pc.is_valid(idx))


def _conform_joined(batch: pa.Table) -> pa.Table:
    cols = {}
    for name, typ in _JOINED_FIELDS:
        col = batch.column(name)
        cols[name] = col.cast(typ) if col.type != typ else col
    return pa.table(cols, schema=_JOINED_SCHEMA)


def choose_join_strategy(images, broadcast_max_bytes: int) -> str:
    """'broadcast' only when the table is in-memory AND measured-small;
    a path/Dataset (the 100-TB corpus case) always buckets."""
    if isinstance(images, pa.Table) and images.nbytes <= broadcast_max_bytes:
        return "broadcast"
    return "bucketed"


def attach_image_table(refs, images, *, strategy: str = "auto",
                       broadcast_max_bytes: int = 64 << 20,
                       n_buckets: int = 32,
                       prune_ids_cap: int = 2_000_000,
                       batch_size: int = 64, concurrency=(1, 4)):
    """refs Dataset (page_url, alt, src, image_id) × image table →
    joined Dataset with the ``_JOINED_SCHEMA`` columns (misses get
    nulls + found=False).  ``images`` is a ``pa.Table`` or a Dataset
    (e.g. from ``sources.io.read_image_table``)."""
    import ray
    import ray.data as rd

    if strategy == "auto":
        strategy = choose_join_strategy(images, broadcast_max_bytes)

    if strategy == "broadcast":
        if not isinstance(images, pa.Table):
            raise ValueError("broadcast strategy needs an in-memory table")
        table_ref = ray.put(images)
        joined = refs.map_batches(
            JoinImageTable, batch_format="pyarrow", batch_size=batch_size,
            concurrency=concurrency,
            fn_constructor_kwargs=dict(table_ref=table_ref))
    elif strategy == "bucketed":
        from ..stages.joins import bucketed_left_lookup_join

        table_ds = (rd.from_arrow(images) if isinstance(images, pa.Table)
                    else images)
        # prune the table side to REFERENCED ids before the join shuffle
        # so unreferenced image bytes never leave the scan.  The distinct
        # referenced-id set is bounded by pages×imgs-per-page this round
        # — tiny next to the corpus; when it exceeds the broadcast cap we
        # skip the prune (the join itself stays correct, just ships more)
        refs = refs.materialize()  # branched: id pass + join pass
        id_rows = (refs.select_columns(["image_id"])
                   .map_batches(_unique_ids_batch, batch_format="pyarrow")
                   .take_all())  # ≤ Σ per-batch uniques, id strings only
        if len(id_rows) <= prune_ids_cap:
            wanted = ray.put(pa.array(
                sorted({r["image_id"] for r in id_rows}), pa.string()))

            def keep_referenced(batch: pa.Table) -> pa.Table:
                import pyarrow.compute as pc
                return batch.filter(pc.is_in(
                    batch.column("image_id"), value_set=ray.get(wanted)))

            table_ds = table_ds.map_batches(keep_referenced,
                                            batch_format="pyarrow")
        else:
            logger.warning(
                "attach_image_table: %d referenced ids exceed "
                "prune_ids_cap=%d — joining the unpruned table",
                len(id_rows), prune_ids_cap)
        joined = bucketed_left_lookup_join(refs, table_ds, "image_id",
                                           n_buckets=n_buckets)
    else:
        raise ValueError(f"unknown strategy {strategy!r}")
    return joined.map_batches(_conform_joined, batch_format="pyarrow")


def _unique_ids_batch(batch: pa.Table) -> pa.Table:
    import pyarrow.compute as pc
    return pa.table({"image_id": pc.unique(
        batch.column("image_id").combine_chunks())})


def validate_crawled_images(crawl_out_dir: str, images_table=None,
                            ref_fn=None, batch_size: int = 64,
                            concurrency=(1, 4), *, images_path: str = None,
                            strategy: str = "auto",
                            broadcast_max_bytes: int = 64 << 20,
                            n_buckets: int = 32):
    """Read every round's docs checkpoint, explode image refs, join the
    image table (``images_table`` in-memory OR ``images_path`` read via
    ``read_image_table`` with column pruning), decode+validate.
    Returns the validation Dataset (page_url, image_id, found, psnr_db,
    pixels_ok, caption_ok, ...)."""
    import glob

    import ray.data as rd

    from ..stages.images import DecodeValidate

    doc_files = sorted(glob.glob(
        os.path.join(crawl_out_dir, "rounds", "round=*", "docs", "*.parquet")))
    if not doc_files:
        raise FileNotFoundError(f"no docs checkpoints under {crawl_out_dir}")
    docs = rd.read_parquet(doc_files, columns=["url", "images"])

    refs = docs.map_batches(explode_image_refs_batch, batch_format="pyarrow")
    if images_table is None:
        if images_path is None:
            raise ValueError("pass images_table or images_path")
        from ..sources.io import read_image_table
        images = read_image_table(
            images_path, columns=["image_id", *_TABLE_COLS])
    else:
        images = images_table
    joined = attach_image_table(
        refs, images, strategy=strategy,
        broadcast_max_bytes=broadcast_max_bytes, n_buckets=n_buckets,
        batch_size=batch_size, concurrency=concurrency).materialize()
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

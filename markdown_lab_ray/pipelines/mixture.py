"""Training-mixture curation pipeline: the end-to-end composition a
pretraining-data run performs before packaging shards.

    quality gate → exact dedup (keep-first) → benchmark
    decontamination → greedy sequence packing

Every stage is an existing, individually-oracled operator; this module
is the composition, streaming end-to-end:

- quality gate: stateless ``map_batches`` filter (no shuffle);
- exact dedup: one keyed shuffle over (md5, id) rows
  (``stages/dedup.exact_dedup``);
- decontamination: the benchmark n-gram set is broadcast once
  (``ray.put``) and the corpus side is a stateless pass
  (``stages/trainprep.decontaminate(project=False)`` so the text
  column rides along — no join-back shuffle);
- packing: the distributed prefix scan of
  ``stages/trainprep.pack_sequences`` (O(buckets) driver state).

Total wide ops: ONE raw-text-sized shuffle (the dedup groupby ships
md5+id, not text) + the packing's (id, tokens)-rows shuffle.  The
whole chain is oracle-checked as a single nested SQL query
(``training_mixture`` in ``__ray_entry__``).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def training_mixture(docs_ds, bench_ds, quality_threshold: float = 0.6,
                     ngram: int = 5, budget: int = 2000):
    """Curate ``docs_ds`` (doc_id, text) against benchmark ``bench_ds``
    and pack survivors.  Returns a Dataset of
    (doc_id, n_tokens, pack_id) — documents that cleared every gate,
    packed greedily in doc_id order at ``budget`` tokens per pack."""
    from ..stages.dedup import exact_dedup
    from ..stages.text import quality_batch, token_count_batch
    from ..stages.trainprep import decontaminate, pack_sequences

    def gate(batch: pa.Table) -> pa.Table:
        q = quality_batch(batch)
        keep = pc.greater_equal(q.column("quality"),
                                pa.scalar(quality_threshold))
        return batch.select(["doc_id", "text"]).filter(keep)

    gated = docs_ds.map_batches(gate, batch_format="pyarrow")
    deduped = exact_dedup(gated)
    scored = decontaminate(deduped, bench_ds, n=ngram, project=False)

    def clean_only(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.equal(batch.column("n_hits"), 0))

    clean = scored.map_batches(clean_only, batch_format="pyarrow")

    def tokens(batch: pa.Table) -> pa.Table:
        t = token_count_batch(batch)
        return pa.table({"doc_id": batch.column("doc_id"),
                         "n_tokens": t.column("n_tokens_ws")})

    counted = clean.map_batches(tokens, batch_format="pyarrow")
    return pack_sequences(counted, budget=budget)


def image_mixture(images_ds, out_dir: str | None = None,
                  align_threshold: float = 0.0, psnr_gate: float = 40.0,
                  hamming_threshold: int = 6, ref_fn=None,
                  n_shards: int = 8):
    """Image-payload curation — the multimodal twin of
    ``training_mixture`` over the input_hint image+caption table:

        decode-validate gate (PSNR ≥ gate vs reference + caption
        equality) → caption-alignment gate → phash near-dup dedup
        (keep best resolution per cluster) → WebDataset tar shards

    Stage shapes: validation and alignment are actor-pool
    ``map_batches`` (bytes never leave the pool; survivors join back by
    id — a bucketed SEMI join, so the binary column is read once per
    gate, never shuffled); the dedup is the bounded band-LSH → CC →
    keep-best composition of ``stages/images.image_dedup_keep_best``.
    When ``out_dir`` is given the survivors are packed into
    byte-deterministic tar shards (``sources/webdataset``).

    Returns the survivor Dataset (input_hint columns + ``align_score``).
    """
    from ..sources.synth import SiteSpec  # noqa: F401  (doc anchor)
    from ..stages.align import alignment_filter
    from ..stages.images import DecodeValidate, image_dedup_keep_best
    from ..stages.joins import bucketed_semi_join

    def with_alt(batch: pa.Table) -> pa.Table:
        # DecodeValidate checks caption equality when an alt column is
        # present; a standalone table validates caption-vs-itself shape
        # (alt arrives from the crawl join in the crawl pipelines)
        if "alt" in batch.column_names:
            return batch
        return batch.append_column("alt", batch.column("caption"))

    validated = images_ds.map_batches(
        with_alt, batch_format="pyarrow").map_batches(
        DecodeValidate, batch_format="pyarrow", batch_size=64,
        concurrency=(1, 4),
        fn_constructor_kwargs=dict(psnr_gate=psnr_gate, ref_fn=ref_fn))

    def valid_ids(batch: pa.Table) -> pa.Table:
        ok = pc.and_(batch.column("pixels_ok"),
                     pc.fill_null(batch.column("caption_ok"), True))
        return pa.table({"image_id": batch.filter(ok).column("image_id")})

    good = bucketed_semi_join(
        images_ds, validated.map_batches(valid_ids, batch_format="pyarrow"),
        key="image_id")
    # pinned: both the dedup and the final semi-join consume `aligned`;
    # unmaterialized it would re-run the decode+score pass per consumer
    aligned = alignment_filter(good, threshold=align_threshold,
                               batch_size=64, concurrency=(1, 4)
                               ).materialize()
    keep = image_dedup_keep_best(aligned,
                                 hamming_threshold=hamming_threshold)
    survivors = bucketed_semi_join(
        aligned,
        keep.map_batches(lambda b: pa.table(
            {"image_id": b.column("image_id")}), batch_format="pyarrow"),
        key="image_id")
    if out_dir is not None:
        from ..sources.webdataset import write_webdataset_shards
        write_webdataset_shards(
            survivors.map_batches(
                lambda b: b.drop_columns(["align_score"]),
                batch_format="pyarrow"),
            out_dir, n_shards=n_shards)
    return survivors

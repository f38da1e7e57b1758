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

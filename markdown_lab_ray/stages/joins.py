"""Partitioned hash join for two large Datasets (SURVEY §2.5).

Ray's native ``Dataset.join`` is young; the portable pattern (per the
Ray guide) is an explicit bucketed join: add ``bucket = hash(key) % B``
to both sides, conform them onto one wide schema (each side's missing
columns null), union, ``groupby(bucket)``, and join pairwise inside
``map_groups``.  One shuffle total; B bounds per-task memory; salt hot
keys by raising B.

Broadcast joins (small side) remain the first choice —
``q_segment_sales`` / ``q_region_customers`` show that path; this is
for genuinely large×large.
"""

from __future__ import annotations

import zlib

import pyarrow as pa


def bucketed_hash_join(left_ds, right_ds, key: str, n_buckets: int = 32,
                       how: str = "inner"):
    """Join two Datasets on ``key``.  Non-key column names must be
    disjoint (rename beforehand)."""
    import pandas as pd

    left_schema = left_ds.schema()
    right_schema = right_ds.schema()
    left_cols = list(left_schema.names)
    right_cols = list(right_schema.names)
    overlap = (set(left_cols) & set(right_cols)) - {key}
    if overlap:
        raise ValueError(f"column collision (rename first): {sorted(overlap)}")

    fields = list(zip(left_schema.names, left_schema.types)) + [
        (n, t) for n, t in zip(right_schema.names, right_schema.types)
        if n != key]
    wide = pa.schema(fields + [("__bucket", pa.int32()),
                               ("__side", pa.string())])

    def tag(batch: pa.Table, side: str) -> pa.Table:
        keys = batch.column(key).to_pylist()
        buckets = [zlib.crc32(str(k).encode()) % n_buckets for k in keys]
        cols = {}
        for fld in wide:
            if fld.name == "__bucket":
                cols[fld.name] = pa.array(buckets, pa.int32())
            elif fld.name == "__side":
                cols[fld.name] = pa.array([side] * len(keys), pa.string())
            elif fld.name in batch.column_names:
                cols[fld.name] = batch.column(fld.name)
            else:
                cols[fld.name] = pa.nulls(batch.num_rows, fld.type)
        return pa.table(cols, schema=wide)

    left_tagged = left_ds.map_batches(tag, batch_format="pyarrow",
                                      fn_kwargs=dict(side="l"))
    right_tagged = right_ds.map_batches(tag, batch_format="pyarrow",
                                        fn_kwargs=dict(side="r"))

    def join_bucket(df: pd.DataFrame) -> pd.DataFrame:
        lhs = df[df["__side"] == "l"][left_cols]
        rhs = df[df["__side"] == "r"][[key] + [c for c in right_cols
                                               if c != key]]
        return lhs.merge(rhs, on=key, how=how)

    both = left_tagged.union(right_tagged)
    return both.groupby("__bucket").map_groups(join_bucket,
                                               batch_format="pandas")

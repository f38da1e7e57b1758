"""Dataset version diffing — the audit step of an incremental corpus
pipeline: given two versions of a keyed table, classify every key as
added / removed / changed (payload hash differs).  The reference has no
counterpart; this extends SURVEY §2.11 (incremental dedup's sibling:
``new_documents`` finds additions only, the diff also finds deletions
and mutations).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

from .bucketing import key_buckets, tag_buckets_batch


def _payload_md5(values) -> list:
    return [hashlib.md5(str(v).encode("utf-8")).hexdigest()
            for v in values]


def dataset_diff(ds_a, ds_b, key_col: str, payload_col: str,
                 n_buckets: int = 64, include_same: bool = False):
    """Classify keys between version A (old) and version B (new):
    ``added`` (only in B), ``removed`` (only in A), ``changed`` (in
    both, md5(payload) differs); ``same`` rows are dropped unless
    ``include_same`` (at corpus scale they're the overwhelming bulk and
    downstream only acts on the delta).

    Scale shape: each side collapses to slim (key, md5) rows per batch
    — payloads never shuffle — then ONE bucketed shuffle on hash(key)
    brings both sides' rows together and the in-bucket classification
    is a vectorized outer merge.  Duplicate keys within a side are an
    input-contract violation and raise (a silent first-wins would make
    the diff layout-dependent).  Output: (key, status).
    """

    def slim(side: str):
        def fn(df: "pd.DataFrame") -> "pd.DataFrame":
            return pd.DataFrame({
                key_col: df[key_col].to_numpy(),
                "_h": _payload_md5(df[payload_col].to_numpy()),
                "_side": side,
            })
        return fn

    def classify(g: "pd.DataFrame") -> "pd.DataFrame":
        a = g[g["_side"] == "a"][[key_col, "_h"]]
        b = g[g["_side"] == "b"][[key_col, "_h"]]
        for side_name, side in (("A", a), ("B", b)):
            if side[key_col].duplicated().any():
                dup = side[key_col][side[key_col].duplicated()].iloc[0]
                raise ValueError(
                    f"dataset_diff: duplicate key {dup!r} in version "
                    f"{side_name} — diff requires unique keys per side")
        m = a.merge(b, on=key_col, how="outer", suffixes=("_a", "_b"))
        added = m["_h_a"].isna()
        removed = m["_h_b"].isna()
        changed = ~added & ~removed & (m["_h_a"] != m["_h_b"])
        status = np.where(added, "added",
                          np.where(removed, "removed",
                                   np.where(changed, "changed", "same")))
        out = pd.DataFrame({key_col: m[key_col], "status": status})
        if not include_same:
            out = out[out["status"] != "same"]
        return out.reset_index(drop=True)

    union = (ds_a.map_batches(slim("a"), batch_format="pandas")
             .union(ds_b.map_batches(slim("b"), batch_format="pandas")))
    tagged = union.map_batches(
        tag_buckets_batch, batch_format="pyarrow",
        fn_kwargs=dict(key_col=key_col, n_buckets=n_buckets))
    return tagged.groupby("_b").map_groups(classify, batch_format="pandas")

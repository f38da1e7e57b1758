"""Event-time window operators (streaming-shaped, SURVEY §2.9).

Ray Data has no native event-time windows; these follow the guide's
pattern: assign window ids in a vectorized ``map_batches`` (sliding
windows explode one row per covering window), then a keyed aggregate.
Tumbling windows are the ``window_id = ts // size`` special case used
by the ``events_window`` query; session windows live in the
``sessionize`` query (sorted per-group pandas).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def sliding_window_explode_batch(batch: pa.Table, window_us: int,
                                 step_us: int,
                                 ts_col: str = "ts") -> pa.Table:
    """One output row per (event, covering window): window ``w`` covers
    ``t`` iff ``w*step <= t < w*step + window`` ⇒ w ∈
    [(t - window)//step + 1, t//step] (integer microseconds, exact)."""
    micros = np.asarray(
        batch.column(ts_col).cast(pa.int64()).combine_chunks(), dtype=np.int64)
    lo = (micros - window_us) // step_us + 1
    hi = micros // step_us
    counts = (hi - lo + 1).clip(min=0)
    idx = np.repeat(np.arange(len(micros)), counts)
    # window ids: for each event, lo..hi — fully vectorized ramp
    # (global arange minus each row's segment start)
    total = int(counts.sum())
    starts = np.cumsum(counts) - counts
    offsets = np.arange(total, dtype=np.int64) - np.repeat(starts, counts)
    window_ids = np.repeat(lo, counts) + offsets
    out = batch.take(pa.array(idx))
    return out.append_column("window_id", pa.array(window_ids, pa.int64()))


def sliding_window_agg(ds, window_us: int, step_us: int,
                       key_col: str = "event_type",
                       value_col: str = "value", ts_col: str = "ts"):
    """Sliding-window count + sum per key.  Returns a Dataset with
    (key, window_id, n_events, sum_value rounded)."""
    from ray.data.aggregate import Count, Sum

    exploded = ds.map_batches(
        sliding_window_explode_batch, batch_format="pyarrow",
        fn_kwargs=dict(window_us=window_us, step_us=step_us, ts_col=ts_col))
    out = (exploded.groupby([key_col, "window_id"])
           .aggregate(Count(alias_name="n_events"),
                      Sum(value_col, alias_name="sum_raw")))

    def round_batch(df):
        df["sum_value"] = df.pop("sum_raw").round(2)
        return df

    return out.map_batches(round_batch, batch_format="pandas")

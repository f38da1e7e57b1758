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

    def round_batch(b: pa.Table) -> pa.Table:
        # numpy round (not pc.round): bit-identical to the pandas
        # .round(2) this replaced — pc.round's scaling differs by ulps
        raw = (b.column("sum_raw").combine_chunks()
               .to_numpy(zero_copy_only=False))
        return b.drop_columns(["sum_raw"]).append_column(
            "sum_value", pa.array(np.round(raw, 2), pa.float64()))

    return out.map_batches(round_batch, batch_format="pyarrow")


def debounce_keep_first(ds, key_col: str = "user_id", ts_col: str = "ts",
                        id_col: str = "event_id",
                        window_us: int = 300_000_000,
                        extra_cols: tuple = ("event_type",),
                        n_buckets: int = 64):
    """Event debounce / throttle: keep only the FIRST event per key per
    tumbling window (default 5 min) — the stream-cleaning gate that
    collapses double-clicks, retry storms and bot bursts before any
    downstream count trusts the data.

    Scale shape: a per-batch keep-first on (key, window) is a TRUE
    combiner (at most one survivor per cell per block), so the single
    bucketed key shuffle moves only pre-thinned rows; the in-bucket
    fold re-applies the same exact rule.  "First" = min (ts, id) —
    deterministic under ts ties in both engines.
    Output: (id, key, ts, *extra_cols) of kept rows.
    """
    import pandas as pd

    from .bucketing import key_buckets

    cols = [id_col, key_col, ts_col, *extra_cols]

    def first_per_cell(df: "pd.DataFrame") -> "pd.DataFrame":
        w = (df[ts_col].to_numpy().astype("datetime64[us]")
             .astype(np.int64) // window_us)
        out = (df.assign(_w=w)
               .sort_values([ts_col, id_col], kind="mergesort")
               .drop_duplicates([key_col, "_w"], keep="first"))
        return out[cols + ["_w"]]

    # fused: the _b tag rides the combiner's (already-pandas) output
    # instead of a second whole-block conversion pass
    def combine_and_tag(df: "pd.DataFrame") -> "pd.DataFrame":
        out = first_per_cell(df)
        return out.assign(_b=key_buckets(out[key_col].to_numpy(),
                                         n_buckets))

    tagged = ds.map_batches(combine_and_tag, batch_format="pandas")
    kept = tagged.groupby("_b").map_groups(
        lambda g: first_per_cell(g)[cols], batch_format="pandas")
    return kept


def late_event_stats(ds, key_col: str = "user_id", ts_col: str = "ts",
                     id_col: str = "event_id",
                     lateness_us: int = 3_600_000_000,
                     n_buckets: int = 64):
    """Watermark lateness accounting — the streaming-ingest audit:
    replay each key's events in ARRIVAL order (``id_col`` ascending,
    the ingest sequence) and count events whose event-time lands
    behind the key's watermark, ``max(ts of earlier arrivals) −
    lateness_us``.  High late counts mean a real streaming job with
    this allowed-lateness would have dropped data (Ray Data is batch;
    this measures what a watermarking engine would have done).

    Scale shape: lateness needs each key's full arrival sequence, so
    it is ONE bucketed key shuffle + a vectorized in-group cummax —
    exclusive-of-current via shift, exact integer µs compares, the
    SQL window twin's ``MAX(ts) OVER (... ROWS ... 1 PRECEDING)``.
    Output: (key, n_events, n_late) for keys with ≥ 1 late event.
    """
    import pandas as pd

    def fold(g: "pd.DataFrame") -> "pd.DataFrame":
        g = g.sort_values([key_col, id_col], kind="mergesort")
        ts = (g[ts_col].to_numpy().astype("datetime64[us]")
              .astype(np.int64))
        key = g[key_col].to_numpy()
        new_key = np.r_[True, key[1:] != key[:-1]]
        # exclusive per-key running max: cummax within key segments,
        # shifted one row, reset at key boundaries
        seg = np.cumsum(new_key) - 1
        cm = pd.Series(ts).groupby(seg).cummax().to_numpy()
        prev = np.r_[np.iinfo(np.int64).min, cm[:-1]]
        prev[new_key] = np.iinfo(np.int64).min
        late = (prev != np.iinfo(np.int64).min) & (
            ts < prev - lateness_us)
        out = pd.DataFrame({key_col: key, "_l": late.astype(np.int64),
                            "_n": np.int64(1)})
        agg = (out.groupby(key_col, sort=False)
               .agg(n_events=("_n", "sum"), n_late=("_l", "sum"))
               .reset_index())
        agg = agg[agg["n_late"] > 0]
        return agg.astype({"n_events": "int64", "n_late": "int64"})

    from .bucketing import tag_buckets_batch

    tagged = ds.map_batches(
        tag_buckets_batch, batch_format="pyarrow",
        fn_kwargs=dict(key_col=key_col, n_buckets=n_buckets))
    return tagged.groupby("_b").map_groups(fold, batch_format="pandas")


def daily_bounce_rate(ds, user_col: str = "user_id", ts_col: str = "ts",
                      id_col: str = "event_id",
                      gap_us: int = 1_800_000_000, n_buckets: int = 64):
    """Bounce rate per day: the fraction of sessions (30-min
    inactivity gap, the ``sessionize`` rule) that contain exactly ONE
    event, keyed by the day the session STARTED.

    Shape: one bucketed user shuffle builds whole sessions inside the
    bucket (all of a user's events co-locate), collapsing to per-day
    (n_sessions, n_bounce) partials; a tiny keyed Sum over days
    finishes.  Output: (day, n_sessions, n_bounce, bounce_micro).
    """
    import pandas as pd

    from ray.data.aggregate import Sum

    def per_day(g: "pd.DataFrame") -> "pd.DataFrame":
        g = g.sort_values([user_col, ts_col, id_col], kind="mergesort")
        ts = (g[ts_col].to_numpy().astype("datetime64[us]")
              .astype(np.int64))
        user = g[user_col].to_numpy()
        new_user = np.r_[True, user[1:] != user[:-1]]
        gap = np.r_[True, (ts[1:] - ts[:-1]) > gap_us]
        new_s = new_user | gap
        sid = np.cumsum(new_s)
        d = pd.DataFrame({"_sid": sid, "_day": ts // 86_400_000_000})
        per = (d.groupby("_sid", sort=False)
               .agg(day=("_day", "min"), n=("_day", "size"))
               .reset_index())
        out = (per.assign(_bounce=(per["n"] == 1).astype("int64"),
                          _one=np.int64(1))
               .groupby("day", sort=False)
               .agg(n_sessions=("_one", "sum"),
                    n_bounce=("_bounce", "sum")).reset_index())
        return out.astype({"day": "int64", "n_sessions": "int64",
                           "n_bounce": "int64"})

    from .bucketing import tag_buckets_batch

    tagged = ds.map_batches(
        tag_buckets_batch, batch_format="pyarrow",
        fn_kwargs=dict(key_col=user_col, n_buckets=n_buckets))
    partials = tagged.groupby("_b").map_groups(per_day,
                                               batch_format="pandas")

    def finish(b: pa.Table) -> pa.Table:
        ns = b.column("n_sessions").to_numpy(zero_copy_only=False)
        nb = b.column("n_bounce").to_numpy(zero_copy_only=False)
        r = np.floor(1e6 * nb / np.maximum(ns, 1) + 0.5).astype(np.int64)
        return pa.table({"day": b.column("day"),
                         "n_sessions": pa.array(ns, pa.int64()),
                         "n_bounce": pa.array(nb, pa.int64()),
                         "bounce_micro": pa.array(r, pa.int64())})

    return (partials.groupby("day")
            .aggregate(Sum("n_sessions", alias_name="n_sessions"),
                       Sum("n_bounce", alias_name="n_bounce"))
            .map_batches(finish, batch_format="pyarrow"))

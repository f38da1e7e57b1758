"""Per-host politeness: token buckets + round-budget scheduling.

The reference throttles with ONE global min-interval clock
(``markdown_lab/core/throttle.py:8-33``); the north rule upgrades this
to per-host budgets that become an explicit *scheduling input*, so
crawl order is a deterministic function of (seed list, politeness
budget) rather than of wall-clock completion (SURVEY.md §2.9, §4.1 T1).

Two pieces:

- ``TokenBucket``: classic token bucket (used by the realtime fetch
  path; pure + unit-testable, no sleeping inside).
- ``schedule_group``: the per-host BSP-round scheduler — sort the
  host's pending frontier rows by ``(-priority, seq_no, loc)`` and
  split them into (scheduled ≤ budget, deferred).  Applied inside
  ``groupby(host).map_groups`` so the only wide op per round is the
  host shuffle.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

DEFAULT_PRIORITY = 0.5  # sitemap-spec default when <priority> is absent


class TokenBucket:
    def __init__(self, rate: float, capacity: float | None = None):
        self.rate = max(rate, 1e-9)
        self.capacity = capacity if capacity is not None else max(1.0, rate)
        self.tokens = self.capacity
        self.updated = 0.0

    def try_acquire(self, now: float, n: float = 1.0) -> bool:
        self.tokens = min(self.capacity,
                          self.tokens + (now - self.updated) * self.rate)
        self.updated = now
        if self.tokens >= n:
            self.tokens -= n
            return True
        return False

    def next_available(self, now: float, n: float = 1.0) -> float:
        """Earliest time at which ``n`` tokens will be available."""
        tokens = min(self.capacity,
                     self.tokens + (now - self.updated) * self.rate)
        if tokens >= n:
            return now
        return now + (n - tokens) / self.rate


def round_budget(requests_per_second: float, round_seconds: float) -> int:
    """Fetches allowed per host per BSP round (≥1 so progress is made)."""
    return max(1, math.floor(requests_per_second * round_seconds))


def effective_budget(budget: int, round_seconds: float,
                     crawl_delay: float | None) -> int:
    """Per-host round budget under a robots ``Crawl-delay``: the
    host's own declared rate (1/delay) caps the engine's configured
    rate, never raises it; ≥1 so a polite host still makes progress."""
    if not crawl_delay or crawl_delay <= 0:
        return budget
    return min(budget, max(1, math.floor(round_seconds / crawl_delay)))


def order_key_frame(df: pd.DataFrame) -> pd.DataFrame:
    """Sort a host's frontier rows by the canonical scheduling order:
    priority desc (None → 0.5), then seq_no asc, then loc asc."""
    pri = df["priority"].astype(float).fillna(DEFAULT_PRIORITY)
    return (df.assign(_pri=pri)
              .sort_values(["_pri", "seq_no", "loc"],
                           ascending=[False, True, True], kind="mergesort")
              .drop(columns="_pri"))


def schedule_group(df: pd.DataFrame, budget: int) -> pd.DataFrame:
    """Per-host scheduling for one round: returns the group with a
    ``scheduled`` bool column and a ``fetch_order`` int column (position
    within the host's scheduled list, -1 for deferred rows)."""
    ordered = order_key_frame(df)
    n = len(ordered)
    take = min(budget, n)
    ordered = ordered.assign(
        scheduled=np.arange(n) < take,
        fetch_order=np.where(np.arange(n) < take, np.arange(n), -1).astype(np.int64),
    )
    return ordered


def breaker_update(prev_streak: int, n_ok: int, n_fail: int,
                   threshold: int) -> tuple[int, bool]:
    """Round-grained per-host circuit-breaker accounting (one call per
    host per BSP round it was scheduled in): any successful fetch in
    the round closes the streak; an all-failure round extends it by the
    round's failure count.  When the streak reaches ``threshold`` the
    breaker TRIPS — the caller opens the host for its cooldown window
    and the streak resets (half-open semantics: the host re-enters with
    a clean slate and trips again after ``threshold`` fresh failures).

    Pure and deterministic — the single source of truth shared by the
    sequential oracle and the distributed engine, like
    ``schedule_group``.  Returns (new_streak, tripped)."""
    streak = 0 if n_ok > 0 else prev_streak + n_fail
    tripped = threshold > 0 and streak >= threshold
    return (0 if tripped else streak), tripped

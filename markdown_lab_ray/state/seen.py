"""URL-seen set: cuckoo-filter shard actors with exact confirmation.

The reference's "seen" state is an exact in-process dict/set (request
cache ``core/cache.py``, ``processed_sitemaps`` set).  At 10^10-URL
scale an exact set per node is impossible, so the rebuild uses the
standard two-tier design (cf. PAPERS.md cuckoo-filter line):

- a **cuckoo filter** (4-slot buckets, 16-bit fingerprints, ~98%+ load
  capacity, no false negatives) answers "definitely new" in O(1);
- cuckoo *positives* are confirmed against an **exact per-shard store**
  so the semantics stay exactly-once (the reference's crawl-order /
  URL-seen equality gate demands exactness; the filter only exists to
  make the common "new URL" path cheap and the exact store append-only
  / spillable).

Shards are addressed by ``crc32(key) % num_shards``; each shard is a
Ray actor (``SeenShard``) created via ``create_seen_shards``.  The
``LocalSeen`` variant backs the single-process oracle and unit tests.
Shards checkpoint their exact store per crawl round for resume.
"""

from __future__ import annotations

import zlib

import numpy as np

_MAX_KICKS = 500


class CuckooFilter:
    """Partial-key cuckoo filter over string keys (numpy storage)."""

    def __init__(self, capacity: int, seed: int = 42):
        n_buckets = 1
        while n_buckets * 4 < capacity:
            n_buckets *= 2
        self.n_buckets = n_buckets
        self.slots = np.zeros((n_buckets, 4), dtype=np.uint16)
        self.rng = np.random.RandomState(seed)
        self.count = 0

    def _fingerprint_and_index(self, key: str) -> tuple[int, int]:
        h = zlib.crc32(key.encode())
        h2 = zlib.crc32(key.encode(), 0x9E3779B9)
        fp = (h2 & 0xFFFF) or 1
        return fp, h % self.n_buckets

    def _alt_index(self, index: int, fp: int) -> int:
        return (index ^ zlib.crc32(bytes([fp & 0xFF, fp >> 8]))) % self.n_buckets

    def contains(self, key: str) -> bool:
        fp, i1 = self._fingerprint_and_index(key)
        if fp in self.slots[i1]:
            return True
        i2 = self._alt_index(i1, fp)
        return fp in self.slots[i2]

    def add(self, key: str) -> bool:
        """Insert; False if the filter is saturated (caller must treat
        the key as seen-unknown and fall back to the exact store)."""
        fp, i1 = self._fingerprint_and_index(key)
        i2 = self._alt_index(i1, fp)
        for idx in (i1, i2):
            bucket = self.slots[idx]
            empty = np.flatnonzero(bucket == 0)
            if empty.size:
                bucket[empty[0]] = fp
                self.count += 1
                return True
        # evict loop
        idx = i1 if self.rng.randint(2) else i2
        for _ in range(_MAX_KICKS):
            slot = self.rng.randint(4)
            fp, self.slots[idx][slot] = int(self.slots[idx][slot]), fp
            idx = self._alt_index(idx, fp)
            bucket = self.slots[idx]
            empty = np.flatnonzero(bucket == 0)
            if empty.size:
                bucket[empty[0]] = fp
                self.count += 1
                return True
        return False

    def delete(self, key: str) -> bool:
        """Remove ONE stored copy of the key's fingerprint (cuckoo
        filters support deletion of previously-inserted keys).  Safe
        against false negatives because ``add`` stores one copy per
        insert: two distinct keys colliding on (fingerprint, bucket)
        hold two copies, and deleting one leaves the other's intact."""
        fp, i1 = self._fingerprint_and_index(key)
        for idx in (i1, self._alt_index(i1, fp)):
            bucket = self.slots[idx]
            hits = np.flatnonzero(bucket == fp)
            if hits.size:
                bucket[hits[0]] = 0
                self.count -= 1
                return True
        return False

    @property
    def load_factor(self) -> float:
        return self.count / (self.n_buckets * 4)


class _SeenCore:
    """Filter + exact confirmation; the logic both the actor and the
    local variant share.  The exact store maps key → the round that
    marked it, making per-round marking IDEMPOTENT: Ray may re-execute
    a mark→fetch→write task chain after a worker failure, and the
    retried batch must see "new" again for keys it itself marked
    (intra-round dedup guarantees a key lives in exactly one batch per
    round, so a same-round re-mark can only be a retry)."""

    def __init__(self, capacity: int = 1 << 20, seed: int = 42):
        self.filter = CuckooFilter(capacity, seed)
        self.exact: dict[str, int] = {}
        self.filter_ok = True
        # RPC accounting: one increment per contains_many/check_and_add
        # CALL (not per key) — lets tests assert the probe fan-out is
        # ∝ blocks × shards, never ∝ host groups × shards
        self.n_probe_calls = 0
        self.n_mark_calls = 0

    def _mark(self, key: str, round_no: int) -> None:
        self.exact[key] = round_no
        if self.filter_ok and not self.filter.add(key):
            self.filter_ok = False  # saturated: exact-only from here

    def check_and_add(self, keys: list[str], round_no: int = -1) -> list[bool]:
        """For each key: True iff it was NOT seen before (and mark it
        seen), OR it was marked in this same ``round_no`` (>= 0) — the
        task-retry idempotence case.  Exactly-once across rounds."""
        self.n_mark_calls += 1
        out = []
        for key in keys:
            if self.filter_ok and not self.filter.contains(key):
                # guaranteed-new fast path
                self._mark(key, round_no)
                out.append(True)
            else:
                # filter positive (or saturated) → exact confirmation
                marked = self.exact.get(key)
                if marked is None:
                    self._mark(key, round_no)
                    out.append(True)
                else:
                    out.append(round_no >= 0 and marked == round_no)
        return out

    def contains_many(self, keys: list[str]) -> list[bool]:
        self.n_probe_calls += 1
        out = []
        for key in keys:
            if self.filter_ok and not self.filter.contains(key):
                out.append(False)  # cuckoo negative is a true negative
            else:
                out.append(key in self.exact)
        return out

    def snapshot(self) -> list[str]:
        return sorted(self.exact)

    def restore(self, keys: list[str]) -> None:
        """Re-register keys from completed rounds (round -1: can never
        be a retry target)."""
        for key in keys:
            if key not in self.exact:
                self._mark(key, -1)

    def expire_before(self, round_cutoff: int) -> int:
        """Recrawl/freshness support: forget every key marked in a
        round < ``round_cutoff`` (restored keys carry round -1 — i.e.
        "an earlier run" — and expire too), so a continuous crawl
        refetches stale pages while recent rounds stay exactly-once.
        Expired fingerprints are deleted from the cuckoo filter
        (duplicate-copy semantics make that false-negative-safe for
        the surviving keys); a filter that ever saturated stays in
        exact-only mode — entries added after saturation were never
        in the filter, so re-enabling it would create false negatives.
        Returns the number of keys expired."""
        expired = [k for k, r in self.exact.items() if r < round_cutoff]
        for key in expired:
            del self.exact[key]
            if self.filter_ok:
                self.filter.delete(key)
        return len(expired)

    def size(self) -> int:
        return len(self.exact)

    def rpc_stats(self) -> dict:
        return {"probe_calls": self.n_probe_calls,
                "mark_calls": self.n_mark_calls}


class LocalSeen(_SeenCore):
    """In-process seen-set (oracle / tests)."""


def create_seen_shards(num_shards: int, capacity_per_shard: int = 1 << 20,
                       seed: int = 42):
    """Create the shard actor pool.  Import-time Ray dependency is kept
    out of module scope so kernels stay importable without Ray."""
    import ray

    # num_cpus=0: lightweight bookkeeping actors must never reserve
    # CPUs, or (shards × 0.1) + a fetch pool sized to (cpus - 2) can
    # leave no schedulable CPU for map tasks → pipeline deadlock
    @ray.remote(num_cpus=0)
    class SeenShard(_SeenCore):
        pass

    return [SeenShard.remote(capacity_per_shard, seed + i)
            for i in range(num_shards)]


def shard_of(key: str, num_shards: int) -> int:
    return zlib.crc32(key.encode()) % num_shards


class SeenProbe:
    """``map_batches`` stage over the shard actors.

    mode="mark": drop rows whose key was already seen AND mark the
    survivors seen (exactly-once across rounds; idempotent within
    ``round_no`` so Ray task retries don't drop rows) — used on the
    scheduled set.
    mode="filter_unseen": drop seen rows WITHOUT marking — used on
    round candidates before scheduling (deferred rows must stay
    fetchable next round).

    Groups each batch's keys by shard and issues one actor call per
    shard."""

    def __init__(self, shards, key_col: str = "seen_key", mode: str = "mark",
                 round_no: int = -1):
        assert mode in ("mark", "filter_unseen")
        self.shards = shards
        self.key_col = key_col
        self.mode = mode
        self.round_no = round_no

    def __call__(self, batch):
        import pyarrow as pa
        import ray

        keys = batch.column(self.key_col).to_pylist()
        n = len(keys)
        if n == 0:
            return batch
        num_shards = len(self.shards)
        by_shard: dict[int, list[int]] = {}
        for i, key in enumerate(keys):
            by_shard.setdefault(shard_of(key, num_shards), []).append(i)
        keep = np.zeros(n, dtype=bool)
        refs, idx_lists = [], []
        for shard_id, idxs in by_shard.items():
            shard = self.shards[shard_id]
            shard_keys = [keys[i] for i in idxs]
            if self.mode == "mark":
                refs.append(shard.check_and_add.remote(shard_keys,
                                                       self.round_no))
            else:
                refs.append(shard.contains_many.remote(shard_keys))
            idx_lists.append(idxs)
        for ref, idxs in zip(refs, idx_lists):
            for i, flag in zip(idxs, ray.get(ref)):
                keep[i] = flag if self.mode == "mark" else not flag
        return batch.filter(pa.array(keep))

"""Distributed crawl engine: BSP rounds over Ray Data (SURVEY.md §3.4).

Each round has exactly ONE wide operation: a ``groupby(host)`` whose
per-group function fuses intra-round dedup, URL-seen filtering, robots
checks and the politeness schedule (two keyed stages when
``schedule_salts`` bounds hot-host group sizes).  Everything else is
``map_batches`` streaming.  Every round checkpoints to parquet under
``out_dir/rounds/round=N/`` (schedule, docs, chunks, frontier_next)
plus a ``_MANIFEST.json``, so a killed run resumes from the last
complete round with per-partition lineage (north_rule: resumable with
metrics); partial checkpoints of an interrupted round are discarded on
re-entry.

Scale notes (10^10-URL frontier):
- frontier rows are metadata-sized; page payloads never cross a round
  boundary (docs/chunks are written, links are folded back to rows);
- URL-seen is O(urls) but sharded + cuckoo-prefiltered (state/seen.py);
- per-host budget caps each round's fetch volume, so a hot host defers
  rather than stalls; ``schedule_salts`` splits a hot host's scheduler
  work across (host, salt) groups without changing the outcome.
"""

from __future__ import annotations

import json
import logging
import os
from dataclasses import dataclass, field

import pyarrow as pa

logger = logging.getLogger("markdown_lab_ray.crawl")

_WARNED_SERIAL_CKPT = False

from ..config import EngineConfig
from ..kernels.html_kernels import extract_links, parse_html_to_document
from ..kernels.render import document_to_markdown
from ..state.politeness import (effective_budget, order_key_frame,
                                round_budget, schedule_group)
from ..state.robots import LocalRobotsCache
from ..state.seen import SeenProbe, create_seen_shards
from ..stages.convert import EMPTY_DOC, chunk_explode_batch
from .crawl_spec import discover_seed_frontier

from ..stages.schemas import FRONTIER_SCHEMA as _FRONTIER_PA_SCHEMA

FRONTIER_COLS = list(_FRONTIER_PA_SCHEMA.names)


# ---------------------------------------------------------------------------
# stages
# ---------------------------------------------------------------------------

def _worker_cached(cache: dict, factory, build):
    """Get-or-create a per-worker-process cached object keyed by the
    factory's pickled content (same factory content → same cache entry
    across tasks; shared by the discover/robots/fetch task stages)."""
    import hashlib

    from ray import cloudpickle

    key = hashlib.md5(cloudpickle.dumps(factory)).hexdigest()
    obj = cache.get(key)
    if obj is None:
        obj = cache[key] = build(factory)
    return obj


class DiscoverStage:
    """Actor stage: seed URL rows → frontier rows (robots → sitemap
    recursion → filters), reference discovery semantics."""

    def __init__(self, web_factory, min_priority=None, include_patterns=None,
                 exclude_patterns=None, limit=None):
        web = web_factory()
        self.resolve = web.resolve
        self.robots = LocalRobotsCache(self.resolve)
        self.filters = dict(min_priority=min_priority,
                            include_patterns=include_patterns,
                            exclude_patterns=exclude_patterns, limit=limit)

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = []
        for seed, idx in zip(batch.column("seed").to_pylist(),
                             batch.column("seed_idx").to_pylist()):
            rows.extend(discover_seed_frontier(
                self.resolve, self.robots, seed, idx, **self.filters))
        return frontier_rows_to_table(rows)


def discover_batch(batch: pa.Table, web_factory, **filters) -> pa.Table:
    """Task-pool variant of DiscoverStage: runs on the already-warm
    worker pool (no actor spawn), robots cache in a worker-process
    global.  Used when the resolver is cheap to construct (synthetic
    web); a real-network crawl keeps the actor stage for its session
    state."""
    cache = _worker_cached(_ROBOTS_CACHE, web_factory,
                           lambda f: LocalRobotsCache(f().resolve))
    rows = []
    for seed, idx in zip(batch.column("seed").to_pylist(),
                         batch.column("seed_idx").to_pylist()):
        rows.extend(discover_seed_frontier(
            cache.resolve_fn, cache, seed, idx, **filters))
    return frontier_rows_to_table(rows)


_ROBOTS_CACHE: dict[str, LocalRobotsCache] = {}


def robots_filter_batch(batch: pa.Table, web_factory) -> pa.Table:
    """Drop rows the host's robots rules disallow.  Stateless TASK (so
    it fuses with adjacent map_batches); the per-host rules cache lives
    in a worker-process global keyed by the factory's pickled content
    (deterministic content → per-worker caches agree; a real network
    deployment would consult the shared robots cache actor instead)."""
    cache = _worker_cached(_ROBOTS_CACHE, web_factory,
                           lambda f: LocalRobotsCache(f().resolve))
    hosts = batch.column("host").to_pylist()
    locs = batch.column("loc").to_pylist()
    keep = [cache.rules_for(h).allows(u) for h, u in zip(hosts, locs)]
    return batch.filter(pa.array(keep))


class FetchStage:
    """Actor-pool fetch: scheduled rows → +status, html.  For the
    synthetic web this is a pure lookup; a real deployment gives each
    actor a connection pool + retry/backoff (reference T2/T9) and the
    same signature.

    ``cache_ttl > 0`` wraps the resolver in the per-actor TTL/LRU
    payload cache (reference request-cache memory level, state/cache.py).
    ``pacing_rps > 0`` additionally enforces REALTIME per-host pacing
    via token buckets (reference T1 upgraded global→per-host) — the BSP
    round budget bounds volume per round; the pacer spaces requests
    within the round.  Clock/sleeper are injectable so tests don't
    sleep.  NOTE: per-host buckets are per-actor; co-locate a host's
    rows in one batch (the schedule stage's host grouping does) or
    divide rps by the pool size for a global guarantee.
    """

    def __init__(self, web_factory, cache_ttl: float = 0.0,
                 pacing_rps: float = 0.0, clock=None, sleeper=None,
                 robots_factory=None):
        import time as _t

        web = web_factory()
        if cache_ttl > 0:
            from ..state.cache import CachedResolver
            self.web = CachedResolver(
                web.resolve, ttl=cache_ttl,
                # opt-in ETag revalidation when the resolver supports it
                full_fn=getattr(web, "resolve_full", None),
                conditional_fn=getattr(web, "resolve_conditional", None))
        else:
            self.web = web
        self.pacing_rps = pacing_rps
        self.clock = clock or _t.monotonic
        self.sleeper = sleeper or _t.sleep
        # robots_factory (optional): a host's robots Crawl-delay caps
        # the realtime pacer below the configured rate, mirroring the
        # budget cap the scheduler applies (state cached per actor)
        self.robots_factory = robots_factory
        self._buckets: dict[str, object] = {}

    def _host_rate(self, host: str) -> float:
        rate = self.pacing_rps
        if self.robots_factory is not None and host:
            delay = _robots_rules(self.robots_factory, host).crawl_delay
            if delay and delay > 0:
                rate = min(rate, 1.0 / delay)
        return rate

    def _pace(self, host: str) -> None:
        from ..state.politeness import TokenBucket

        bucket = self._buckets.get(host)
        if bucket is None:
            rate = self._host_rate(host)
            bucket = self._buckets[host] = TokenBucket(
                rate, capacity=max(1.0, rate))
        # loop until a token is actually debited: re-read the clock after
        # sleeping (oversleep happens) and never assume the acquire
        # succeeded — float rounding can leave the bucket just short
        while True:
            now = self.clock()
            if bucket.try_acquire(now):
                return
            wait = bucket.next_available(now) - now
            self.sleeper(max(wait, 1e-4))

    def __call__(self, batch: pa.Table) -> pa.Table:
        statuses, htmls = [], []
        hosts = (batch.column("host").to_pylist()
                 if "host" in batch.column_names else None)
        methods = (batch.column("method").to_pylist()
                   if "method" in batch.column_names else None)
        for i, loc in enumerate(batch.column("loc").to_pylist()):
            is_head = methods is not None and methods[i] == "HEAD"
            # cache hits don't touch the network → no pacing needed;
            # a HEAD always touches the network (it bypasses the payload
            # cache), so it is ALWAYS paced
            if self.pacing_rps > 0 and (is_head or not (
                    hasattr(self.web, "has_fresh")
                    and self.web.has_fresh(loc))):
                self._pace(hosts[i] if hosts else "")
            if is_head:
                # reference client.head (client.py:100-114): status +
                # headers only, never a body
                status, _headers = _head(self.web, loc)
                statuses.append(status)
                htmls.append("")
            else:
                status, body = self.web.resolve(loc)
                statuses.append(status)
                htmls.append(body if isinstance(body, str) else "")
        return batch.append_column(
            "status", pa.array(statuses, pa.int32())
        ).append_column("html", pa.array(htmls, pa.string()))


_WEB_CACHE: dict[str, object] = {}


def _head(web, loc: str):
    """HEAD against a resolver: use its native ``head`` when present
    (real clients / SyntheticWeb), else fall back to resolve-and-drop
    (correct status, body discarded)."""
    target = getattr(web, "resolve_fn", None) or web  # unwrap CachedResolver
    if hasattr(target, "__self__") and hasattr(target.__self__, "head"):
        return target.__self__.head(loc)
    if hasattr(web, "head"):
        return web.head(loc)
    status, body = (web.resolve(loc) if hasattr(web, "resolve")
                    else web(loc))
    length = (len(body.encode()) if isinstance(body, str) else len(body))
    return status, {"content-length": length}


def fetch_head_batch(batch: pa.Table, web_factory) -> pa.Table:
    """Task-pool HEAD tier: frontier rows → +status, content_length —
    link-checking / freshness probes without ever shipping a body
    (reference S2).  Use on rows with ``method == "HEAD"`` or any
    frontier slice."""
    web = _worker_cached(_WEB_CACHE, web_factory, lambda f: f())
    statuses, lengths = [], []
    for loc in batch.column("loc").to_pylist():
        status, headers = _head(web, loc)
        statuses.append(status)
        lengths.append(int(headers.get("content-length", -1)))
    return batch.append_column(
        "status", pa.array(statuses, pa.int32())
    ).append_column("content_length", pa.array(lengths, pa.int64()))


def _write_chunk_sidecar(docs_tbl: pa.Table, chunk_sink: str,
                         chunk_size: int, chunk_overlap: int) -> None:
    """Write this batch's chunk rows straight from the convert task —
    IO fusion that removes the separate read-docs → explode → write
    pass (the chunks are derived data; a failed round's partial sidecar
    files are discarded with the round on resume)."""
    import hashlib

    import pyarrow.parquet as pq

    chunk_tbl = chunk_explode_batch(docs_tbl, chunk_size=chunk_size,
                                    chunk_overlap=chunk_overlap,
                                    url_col="url", text_col="payload")
    if chunk_tbl.num_rows == 0:
        return
    stem = hashlib.md5(
        chunk_tbl.column("chunk_id")[0].as_py().encode()).hexdigest()[:16]
    os.makedirs(chunk_sink, exist_ok=True)
    pq.write_table(chunk_tbl, os.path.join(chunk_sink, f"part-{stem}.parquet"),
                   compression="zstd")


def fetch_convert_batch(batch: pa.Table, web_factory, chunk_sink=None,
                        chunk_size: int = 1000,
                        chunk_overlap: int = 200) -> pa.Table:
    """Task-pool variant of FetchConvertStage for resolvers that are
    pure functions (the synthetic web): runs on the warm worker pool
    with a worker-process-global resolver, no actor spawn cost.
    Choose via ``EngineConfig.fetch_mode = "tasks"``; the actor pool
    (``"actors"``) remains the right tier for real HTTP fetching where
    each worker owns sessions/connection pools."""
    web = _worker_cached(_WEB_CACHE, web_factory, lambda f: f())
    statuses, htmls = [], []
    for loc in batch.column("loc").to_pylist():
        status, body = web.resolve(loc)
        statuses.append(status)
        htmls.append(body if isinstance(body, str) else "")
    fetched = batch.append_column(
        "status", pa.array(statuses, pa.int32())
    ).append_column("html", pa.array(htmls, pa.string()))
    docs_tbl = crawl_convert_batch(fetched)
    if chunk_sink:
        _write_chunk_sidecar(docs_tbl, chunk_sink, chunk_size, chunk_overlap)
    return docs_tbl


class FetchConvertStage(FetchStage):
    """Fused fetch + parse + render actor stage — the crawl's hot path.

    Fetched HTML never leaves the actor process (only the much smaller
    docs rows hit the object store), and one pool owns the round's CPU
    budget instead of a fetch pool starving a separate convert task
    stage.  ``FetchStage`` + ``crawl_convert_batch`` remain available as
    separate stages when the fetch tier must be sized independently
    (e.g. network-bound real fetches vs CPU-bound parsing)."""

    def __init__(self, web_factory, cache_ttl: float = 0.0,
                 pacing_rps: float = 0.0, clock=None, sleeper=None,
                 chunk_sink=None, chunk_size: int = 1000,
                 chunk_overlap: int = 200, robots_factory=None):
        super().__init__(web_factory, cache_ttl, pacing_rps, clock,
                         sleeper, robots_factory=robots_factory)
        self.chunk_sink = chunk_sink
        self.chunk_size = chunk_size
        self.chunk_overlap = chunk_overlap

    def __call__(self, batch: pa.Table) -> pa.Table:
        docs_tbl = crawl_convert_batch(super().__call__(batch))
        if self.chunk_sink:
            _write_chunk_sidecar(docs_tbl, self.chunk_sink,
                                 self.chunk_size, self.chunk_overlap)
        return docs_tbl


# per-worker-process memo for the fused convert path: a RECRAWL of an
# unchanged page (the 304 revalidation path serves the identical body
# from cache) skips the parse+render entirely.  Keyed by (md5(html),
# loc) — the base URL participates in link resolution, so the same
# body on two URLs renders differently and must not share an entry.
_CONVERT_MEMO: "OrderedDict[tuple, tuple]" = None  # type: ignore
_CONVERT_MEMO_CAP = 512


def _convert_memoized(html: str, loc: str):
    """(title, payload, links, images) for a 200 page, LRU-memoized per
    worker process."""
    import hashlib
    from collections import OrderedDict

    global _CONVERT_MEMO
    if _CONVERT_MEMO is None:
        _CONVERT_MEMO = OrderedDict()
    key = (hashlib.md5(html.encode()).hexdigest(), loc)
    hit = _CONVERT_MEMO.get(key)
    if hit is not None:
        _CONVERT_MEMO.move_to_end(key)
        return hit
    try:
        doc = parse_html_to_document(html, loc)
        links = extract_links(html, loc)
    except Exception:
        doc, links = dict(EMPTY_DOC, base_url=loc), []
    out = (doc["title"], document_to_markdown(doc), links, doc["images"])
    _CONVERT_MEMO[key] = out
    if len(_CONVERT_MEMO) > _CONVERT_MEMO_CAP:
        _CONVERT_MEMO.popitem(last=False)
    return out


def crawl_convert_batch(batch: pa.Table) -> pa.Table:
    """Fetched pages → docs rows: title, markdown payload, outgoing
    links (M3 semantics), image (alt, src) pairs.  One parse per page
    (memoized against recrawls of unchanged content); chunks and
    next-round frontier rows both derive from this table."""
    locs = batch.column("loc").to_pylist()
    htmls = batch.column("html").to_pylist()
    statuses = batch.column("status").to_pylist()
    depths = batch.column("depth").to_pylist()

    from ..kernels.urls import redirect_target

    titles, payloads, links_col, images_col = [], [], [], []
    for loc, html, status in zip(locs, htmls, statuses):
        if 300 <= status < 400:
            # the body is the Location; the target rides the links
            # column into the next round's frontier (kernels/urls.py
            # redirect_target documents why we never follow inline)
            target = redirect_target(status, html, loc)
            doc = dict(EMPTY_DOC, base_url=loc)
            title, payload, links, images = (
                doc["title"], document_to_markdown(doc),
                [target] if target else [], doc["images"])
        elif status != 200 or not html:
            doc = dict(EMPTY_DOC, base_url=loc)
            title, payload, links, images = (
                doc["title"], document_to_markdown(doc), [],
                doc["images"])
        else:
            title, payload, links, images = _convert_memoized(html, loc)
        titles.append(title)
        payloads.append(payload)
        links_col.append(links)
        images_col.append(images)

    return pa.table({
        "url": pa.array(locs, pa.string()),
        "host": batch.column("host"),
        "depth": pa.array(depths, pa.int64()),
        "status": pa.array(statuses, pa.int32()),
        "title": pa.array(titles, pa.string()),
        "payload": pa.array(payloads, pa.string()),
        "links": pa.array(links_col, pa.list_(pa.string())),
        "images": pa.array(images_col, pa.list_(pa.struct(
            [("alt", pa.string()), ("src", pa.string())]))),
    })


def _probe_contains(shards, keys: list[str]) -> list[bool]:
    """contains_many across the shard actors (one call per shard)."""
    import ray

    from ..state.seen import shard_of

    flags = [False] * len(keys)
    by_shard: dict[int, list[int]] = {}
    for i, key in enumerate(keys):
        by_shard.setdefault(shard_of(key, len(shards)), []).append(i)
    refs = [(idxs, shards[s].contains_many.remote([keys[i] for i in idxs]))
            for s, idxs in by_shard.items()]
    for idxs, ref in refs:
        for i, seen in zip(idxs, ray.get(ref)):
            flags[i] = seen
    return flags


def _group_to_arrow(df, schema: pa.Schema) -> pa.Table:
    """Group-fn output → Arrow block with the fixed schema.  The
    schedule stages return Arrow (not pandas) so string columns leave
    the group fn Arrow-typed: pandas object-dtype blocks defeat Ray's
    block-size estimator (``cannot call vectorize on size 0 inputs`` on
    every empty group) and make block accounting inaccurate."""
    return _conform(pa.Table.from_pandas(df, preserve_index=False), schema)


def make_host_processor(shards, robots_factory, budget: int,
                        round_seconds: float = 0.0,
                        open_hosts: frozenset | None = None,
                        host_boosts: dict | None = None):
    """The fused per-host round step (ONE groupby instead of three):
    intra-round dedup (same seen_key ⟹ same host, so host groups see
    all duplicates) → URL-seen contains-filter → robots allow →
    politeness schedule.  Returns the scheduled/deferred rows as an
    Arrow block.

    ``shards=None`` skips the in-group URL-seen probe: the driver runs
    the probe as a ``SeenProbe(mode="filter_unseen")`` map_batches stage
    BEFORE the groupby instead (reads are idempotent, so filtering
    before intra-round dedup is equivalent), which batches the shard
    RPCs per BLOCK — probe call count ∝ blocks × shards, not host
    groups × shards."""
    empty = _SCHEDULE_PA_SCHEMA.empty_table()

    def process(df):
        if open_hosts and df["host"].iloc[0] in open_hosts:
            # circuit breaker open: the whole group defers untouched
            # (no dedup/seen/robots work — it re-runs on re-entry)
            return _group_to_arrow(schedule_group(df, 0),
                                   _SCHEDULE_PA_SCHEMA)
        df = (df.sort_values(["seq_no", "loc"], kind="mergesort")
              .drop_duplicates("seen_key", keep="first"))
        if shards is not None:
            flags = _probe_contains(shards, df["seen_key"].tolist())
            df = df[[not f for f in flags]]
        if df.empty:
            return empty
        host_rules = _robots_rules(robots_factory, df["host"].iloc[0])
        keep = [host_rules.allows(u) for u in df["loc"]]
        df = df[keep]
        if df.empty:
            return empty
        boost = host_boosts.get(df["host"].iloc[0], 1) if host_boosts else 1
        host_budget = effective_budget(budget * boost, round_seconds,
                                       host_rules.crawl_delay)
        return _group_to_arrow(schedule_group(df, host_budget),
                               _SCHEDULE_PA_SCHEMA)

    return process


def add_salt_batch(batch: pa.Table, n_salts: int) -> pa.Table:
    """Salt column for two-stage scheduling: derived from seen_key so
    duplicate URLs land in the same (host, salt) group."""
    import zlib

    salts = [zlib.crc32(k.encode()) % n_salts
             for k in batch.column("seen_key").to_pylist()]
    return batch.append_column("salt", pa.array(salts, pa.int32()))


def make_salted_preprocessor(shards, robots_factory, budget: int,
                             open_hosts: frozenset | None = None):
    """Stage 1 of hot-host scheduling: per (host, salt) group — dedup,
    seen-filter, robots — then keep only the group's top-``budget``
    rows as *contenders* (the global per-host top-budget is a subset of
    the union of per-salt top-budgets); the rest defer immediately.
    Bounds any single pandas group to ~|host rows| / n_salts, so a
    10^6-URL host can't blow up one scheduler task (SURVEY §7.5).
    ``shards=None`` skips the in-group probe (pre-filtered upstream —
    see ``make_host_processor``)."""
    import numpy as np

    empty = _SALTED_PA_SCHEMA.empty_table()

    def process(df):
        if open_hosts and df["host"].iloc[0] in open_hosts:
            # breaker open: nothing contends; rows defer untouched
            return _group_to_arrow(df.assign(contender=False),
                                   _SALTED_PA_SCHEMA)
        df = (df.sort_values(["seq_no", "loc"], kind="mergesort")
              .drop_duplicates("seen_key", keep="first"))
        if shards is not None:
            flags = _probe_contains(shards, df["seen_key"].tolist())
            df = df[[not f for f in flags]]
        if len(df):
            host_rules = _robots_rules(robots_factory, df["host"].iloc[0])
            df = df[[host_rules.allows(u) for u in df["loc"]]]
        if df.empty:
            return empty
        ordered = order_key_frame(df)
        return _group_to_arrow(
            ordered.assign(contender=np.arange(len(ordered)) < budget),
            _SALTED_PA_SCHEMA)

    return process


def make_host_finalizer(budget: int, robots_factory=None,
                        round_seconds: float = 0.0,
                        host_boosts: dict | None = None):
    """Stage 2: schedule the per-host contender union (plain
    ``schedule_group`` — seen/robots already applied in stage 1; the
    stage-1 contender cut uses the GLOBAL budget × the max authority
    boost, which is ≥ every host's boosted, ``Crawl-delay``-capped
    budget, so the union still contains the final schedule)."""
    def process(df):
        boost = host_boosts.get(df["host"].iloc[0], 1) if (
            host_boosts and not df.empty) else 1
        host_budget = budget * boost
        if robots_factory is not None and not df.empty:
            rules = _robots_rules(robots_factory, df["host"].iloc[0])
            host_budget = effective_budget(budget * boost, round_seconds,
                                           rules.crawl_delay)
        return _group_to_arrow(schedule_group(df, host_budget),
                               _SCHEDULE_PA_SCHEMA)

    return process


def _robots_rules(robots_factory, host: str):
    """Per-worker-process cached robots rules.  ``robots_factory()``
    returns any object with ``rules_for(host)`` — ``LocalRobotsCache``
    (worker mode: each process fetches/derives rules itself; right for
    the pure-function synthetic web) or ``ActorRobotsCache`` (actor
    mode: the sharded robots actor tier fetches each host's robots.txt
    exactly once cluster-wide; right for real networks)."""
    cache = _worker_cached(_ROBOTS_CACHE, robots_factory, lambda f: f())
    return cache.rules_for(host)


class _LocalRobotsFactory:
    """Picklable robots_factory for worker mode."""

    def __init__(self, web_factory):
        self.web_factory = web_factory

    def __call__(self):
        return LocalRobotsCache(self.web_factory().resolve)


class _ActorRobotsFactory:
    """Picklable robots_factory for the sharded-actor mode (north rule:
    robots.txt cache actors).  Holds the shard handles; each worker
    process builds one memoizing client over them."""

    def __init__(self, shards):
        self.shards = shards

    def __call__(self):
        from ..state.robots import ActorRobotsCache
        return ActorRobotsCache(self.shards)


def links_explode_batch(batch: pa.Table, trap_cap: int = 0) -> pa.Table:
    """Docs rows → next-round frontier candidate rows (with per-batch
    pre-dedup to shrink the round's dedup shuffle).  ``trap_cap``
    enables the per-page crawler-trap guard (crawl_spec docstring).

    Vectorized (same shape as ``explode_image_refs_batch``): Arrow
    ``list_flatten`` + ``list_parent_indices`` for the explode, kernel
    ``starts_with`` for the scheme filter, pandas cumcount for the
    per-page trap cap, stable sort + drop-duplicates for the spec-2a
    pre-dedup (min-(seq_no, loc) per seen_key).  The per-URL scalars
    (normalize / md5 seen-key / crc32 seq-no — shared with the
    sequential oracle, parity by construction) run once over the FLAT
    array with ONE urlparse per link; equality with the row-loop spec
    path ``links_to_frontier_rows`` + ``dedup_candidates`` is pinned by
    ``tests/test_crawl.py::test_links_explode_vectorized_parity``."""
    import hashlib
    import zlib

    import numpy as np
    import pandas as pd
    import pyarrow.compute as pc

    from ..kernels.urls import normalize_and_host, path_template
    from .crawl_spec import LINK_SEQ_BASE

    links = batch.column("links")
    flat = pc.list_flatten(links)
    parents = pc.list_parent_indices(links)
    depths = pc.add(batch.column("depth").take(parents), 1)
    keep = pc.fill_null(
        pc.or_(pc.starts_with(flat, pattern="http://"),
               pc.starts_with(flat, pattern="https://")), False)
    flat = flat.filter(keep)
    depths = depths.filter(keep)
    urls = flat.to_pylist()
    depth_np = depths.combine_chunks().to_numpy(zero_copy_only=False) \
        if isinstance(depths, pa.ChunkedArray) \
        else depths.to_numpy(zero_copy_only=False)
    if trap_cap > 0 and urls:
        pages = parents.filter(keep).to_numpy(zero_copy_only=False)
        occ = (pd.DataFrame({"p": pages,
                             "t": [path_template(u) for u in urls]})
               .groupby(["p", "t"], sort=False).cumcount().to_numpy())
        mask = occ < trap_cap                # first-in-page-order wins
        urls = [u for u, m in zip(urls, mask) if m]
        depth_np = depth_np[mask]
    if not urls:
        return frontier_rows_to_table([])
    norm_host = [normalize_and_host(u) for u in urls]
    seq = np.fromiter((LINK_SEQ_BASE + zlib.crc32(n.encode())
                       for n, _ in norm_host), np.int64, len(norm_host))
    seen = [hashlib.md5(n.encode("utf-8")).hexdigest()
            for n, _ in norm_host]
    df = pd.DataFrame({
        "loc": urls, "seen_key": seen, "seq_no": seq,
        "host": [h for _, h in norm_host], "depth": depth_np})
    df = (df.sort_values(["seq_no", "loc"], kind="mergesort")
          .drop_duplicates("seen_key", keep="first"))
    n = len(df)
    return pa.table({
        "loc": pa.array(df["loc"], pa.string()),
        "lastmod": pa.nulls(n, pa.string()),
        "changefreq": pa.nulls(n, pa.string()),
        "priority": pa.nulls(n, pa.float64()),
        "host": pa.array(df["host"], pa.string()),
        "depth": pa.array(df["depth"], pa.int64()),
        "seq_no": pa.array(df["seq_no"], pa.int64()),
        "seen_key": pa.array(df["seen_key"], pa.string()),
    }, schema=_FRONTIER_PA_SCHEMA)


def frontier_rows_to_table(rows: list[dict]) -> pa.Table:
    return pa.table(
        {name: [r[name] for r in rows] for name in FRONTIER_COLS}
        if rows else {name: [] for name in FRONTIER_COLS},
        schema=_FRONTIER_PA_SCHEMA)


def _conform(batch: pa.Table, schema: pa.Schema) -> pa.Table:
    """Cast a batch to a fixed schema (order + types).  Needed because
    pandas ``map_groups`` blocks can infer null/object types per block
    (e.g. an all-None lastmod column), which would break parquet append
    and ``union`` schema matching."""
    cols = {}
    for fld in schema:
        if fld.name in batch.column_names:
            col = batch.column(fld.name)
            cols[fld.name] = col.cast(fld.type) if col.type != fld.type else col
        else:
            cols[fld.name] = pa.nulls(batch.num_rows, fld.type)
    return pa.table(cols, schema=schema)


_SCHEDULE_PA_SCHEMA = pa.schema(
    list(_FRONTIER_PA_SCHEMA)
    + [pa.field("scheduled", pa.bool_()), pa.field("fetch_order", pa.int64())])

# salted pre-stage output: frontier rows + their salt + contender flag
_SALTED_PA_SCHEMA = pa.schema(
    list(_FRONTIER_PA_SCHEMA)
    + [pa.field("salt", pa.int32()), pa.field("contender", pa.bool_())])


def conform_frontier_batch(batch: pa.Table) -> pa.Table:
    return _conform(batch, _FRONTIER_PA_SCHEMA)


def conform_schedule_batch(batch: pa.Table) -> pa.Table:
    return _conform(batch, _SCHEDULE_PA_SCHEMA)


def _mark_deferred_batch(batch: pa.Table) -> pa.Table:
    """Salted pre-stage non-contenders → schedule rows with
    scheduled=False / fetch_order=-1 (same shape the finalizer emits)."""
    out = _conform(batch, _FRONTIER_PA_SCHEMA)
    n = out.num_rows
    out = out.append_column("scheduled", pa.array([False] * n, pa.bool_()))
    out = out.append_column("fetch_order", pa.array([-1] * n, pa.int64()))
    return out


# ---------------------------------------------------------------------------
# driver
# ---------------------------------------------------------------------------

@dataclass
class CrawlResult:
    out_dir: str
    rounds: int = 0
    fetched: int = 0
    failed: int = 0
    manifest: list[dict] = field(default_factory=list)
    t_discovery: float = 0.0


def _round_dir(out_dir: str, round_no: int) -> str:
    return os.path.join(out_dir, "rounds", f"round={round_no}")


def _read_frontier(path: str):
    """read_parquet that tolerates an empty checkpoint directory."""
    import glob

    import ray.data as rd

    if not glob.glob(os.path.join(path, "*.parquet")):
        return rd.from_arrow(frontier_rows_to_table([]))
    return rd.read_parquet(path)


def _update_breaker(breaker: dict, docs_dir: str, round_no: int,
                    cfg) -> None:
    """Advance the circuit-breaker state from this round's fetch
    results.  Per-host (ok, n) counts are folded per block, bucketed by
    ``hash(host) % B`` (B group tasks regardless of host cardinality —
    the repo's standard per-key fold), and FILTERED distributed-side:
    only hosts with a failure this round, plus hosts already carrying
    breaker state, reach the driver — O(failing hosts), never
    O(scheduled hosts)."""
    import pandas as pd
    import ray.data as rd

    from ..stages.bucketing import key_buckets
    from ..state.politeness import breaker_update

    prev_hosts = frozenset(breaker)

    def partial(df: "pd.DataFrame") -> "pd.DataFrame":
        g = (pd.DataFrame({"host": df["host"],
                           "ok": (df["status"] == 200).astype("int64")})
             .groupby("host", sort=False)["ok"].agg(["sum", "size"])
             .reset_index())
        out = pd.DataFrame({"host": g["host"],
                            "ok": g["sum"].astype("int64"),
                            "n": g["size"].astype("int64")})
        out["_b"] = key_buckets(out["host"].to_numpy(), 32)
        return out

    def fold(g: "pd.DataFrame") -> "pd.DataFrame":
        a = (g.groupby("host", sort=False)
             .agg(ok=("ok", "sum"), n=("n", "sum")).reset_index())
        keep = (a["n"] - a["ok"] > 0) | a["host"].isin(prev_hosts)
        return a[keep][["host", "ok", "n"]]

    stats = (rd.read_parquet(docs_dir, columns=["host", "status"])
             .map_batches(partial, batch_format="pandas")
             .groupby("_b").map_groups(fold, batch_format="pandas")
             .to_pandas())

    if stats.empty:
        # all-ok round with no carried streaks: the fold emits zero
        # rows, and an all-empty map_groups result has no columns
        return
    for r in stats.sort_values("host").itertuples(index=False):
        n_ok, n_fail = int(r.ok), int(r.n - r.ok)
        prev = breaker.get(r.host, [0, 0])
        streak, tripped = breaker_update(int(prev[0]), n_ok, n_fail,
                                         cfg.breaker_threshold)
        if tripped:
            breaker[r.host] = [0, round_no + 1
                               + cfg.breaker_cooldown_rounds]
        elif streak > 0:
            breaker[r.host] = [streak, int(prev[1])]
        else:
            breaker.pop(r.host, None)


def _update_authority_edges(host_edges: set, docs_dir: str, cfg) -> set:
    """Fold this round's fetched pages into the cross-host link graph.
    Per-batch distinct (src, dst) pairs collapse each block, then one
    keyed distinct bounds what reaches the driver to O(host pairs) —
    capped deterministically at ``authority_edge_cap`` (the same
    ``merge_edges`` rule the oracle applies)."""
    import ray.data as rd
    from ray.data.aggregate import Count

    from ..state.authority import merge_edges

    def partial(b: pa.Table) -> pa.Table:
        # vectorized explode (same shape as links_explode_batch): keep
        # 200s, list_flatten the links, take the page host per link;
        # dst host comes from an Arrow regex kernel — for http(s) URLs
        # ``[^/?#]*`` after the scheme IS urlparse's netloc (equality
        # pinned in tests/test_crawl_authority.py), so no Python parse
        # touches the per-link fold at all.  The distinct-pairs set is
        # O(host pairs) per block, same as extract_host_edges.
        import pyarrow.compute as pc

        b = b.filter(pc.equal(b.column("status"), 200))
        links = b.column("links")
        flat = pc.list_flatten(links)
        srcs = b.column("host").take(pc.list_parent_indices(links))
        keep = pc.fill_null(
            pc.or_(pc.starts_with(flat, pattern="http://"),
                   pc.starts_with(flat, pattern="https://")), False)
        # urlsplit strips \t\r\n anywhere in the URL (WHATWG rule) —
        # mirror it so a malformed href like "http://a.\tcom/x" yields
        # the same host key as the urlparse-based crawl/oracle paths
        cleaned = pc.replace_substring_regex(
            flat.filter(keep), pattern="[\\t\\r\\n]", replacement="")
        dsts = pc.struct_field(
            pc.extract_regex(cleaned,
                             pattern=r"^https?://(?P<host>[^/?#]*)"),
            "host")
        pairs = {(s, d) for s, d in zip(srcs.filter(keep).to_pylist(),
                                        dsts.to_pylist())
                 if d and d != s}
        ps = sorted(pairs)
        return pa.table({"src": pa.array([a for a, _ in ps], pa.string()),
                         "dst": pa.array([d for _, d in ps], pa.string())})

    df = (rd.read_parquet(docs_dir, columns=["host", "links", "status"])
          .map_batches(partial, batch_format="pyarrow")
          .groupby(["src", "dst"]).aggregate(Count(alias_name="_n"))
          .to_pandas())
    new = (set(zip(df["src"], df["dst"]))
           if len(df) and "src" in df.columns else set())
    return merge_edges(host_edges, new, cfg.authority_edge_cap)


def _write_authority_state(rdir: str, host_edges: set) -> None:
    """Checkpoint the capped host-edge set for resume (sorted: the
    file is byte-stable for a given graph)."""
    with open(os.path.join(rdir, "authority.json"), "w") as f:
        json.dump(sorted(list(e) for e in host_edges), f)


def _write_breaker_state(rdir: str, breaker: dict, round_no: int) -> None:
    """Checkpoint the breaker table (pruning entries that are fully
    expired AND streak-free — all-ok hosts never accumulate)."""
    pruned = {h: v for h, v in breaker.items()
              if v[0] > 0 or v[1] > round_no + 1}
    breaker.clear()
    breaker.update(pruned)
    with open(os.path.join(rdir, "breaker.json"), "w") as f:
        json.dump(pruned, f)


def run_crawl_ray(web_factory, seed_urls: list[str],
                  out_dir: str, cfg: EngineConfig | None = None,
                  min_priority=None, include_patterns=None,
                  exclude_patterns=None, limit=None,
                  freshness_priority: bool = False,
                  resume: bool = False) -> CrawlResult:
    """Run the BSP crawl.  Ray must already be initialised by the caller
    (driver/bench/tests own the session)."""
    import ray
    import ray.data as rd

    cfg = cfg or EngineConfig()
    # clamp actor pools to the cluster so a fixed-size pool can't wait
    # forever for CPUs that don't exist (single-node test sessions)
    total_cpus = int(ray.cluster_resources().get("CPU", 4))
    fetch_conc = max(1, min(cfg.fetch_concurrency, total_cpus - 2))
    budget = round_budget(cfg.requests_per_second, cfg.round_seconds)
    shards = create_seen_shards(cfg.seen_shards, cfg.seen_capacity_per_shard,
                                cfg.seed)
    if cfg.robots_cache == "actor":
        # sharded robots cache actors: each host's robots.txt fetched
        # exactly once cluster-wide (the real-network politeness tier)
        from ..state.robots import create_robots_shards
        robots_factory = _ActorRobotsFactory(
            create_robots_shards(cfg.robots_shards, web_factory))
    else:
        # worker mode: per-process rules cache; right for the synthetic
        # pure-function web where a "fetch" is a deterministic compute
        robots_factory = _LocalRobotsFactory(web_factory)
    result = CrawlResult(out_dir=out_dir)
    os.makedirs(out_dir, exist_ok=True)

    start_round = 0
    frontier = None
    if resume:
        start_round, frontier = _restore(out_dir, shards, result)

    # circuit-breaker state: host → [streak, open_until].  Bounded by
    # the number of CURRENTLY-failing hosts (all-ok hosts are pruned
    # every round), so holding it on the driver — and re-broadcasting
    # the open set into the schedule group fns — is O(failing hosts),
    # not O(hosts).  Checkpointed per round for resume.
    breaker: dict[str, list] = {}
    if resume and start_round > 0 and cfg.breaker_threshold > 0:
        bpath = os.path.join(_round_dir(out_dir, start_round - 1),
                             "breaker.json")
        if os.path.exists(bpath):
            with open(bpath) as f:
                breaker = json.load(f)

    # host-authority budget weighting: the capped cross-host edge set
    # lives on the driver (O(host pairs), checkpointed per round) and
    # only the boosted-host multiplier dict ships into the schedulers
    host_edges: set = set()
    if resume and start_round > 0 and cfg.authority_boost > 1:
        apath = os.path.join(_round_dir(out_dir, start_round - 1),
                             "authority.json")
        if os.path.exists(apath):
            with open(apath) as f:
                host_edges = {tuple(e) for e in json.load(f)}

    import time as _time

    t_disc = _time.time()
    if frontier is None:
        # one block per seed up to a cap: per-seed tasks maximize
        # discovery parallelism for normal seed lists, while a 10^6-seed
        # frontier doesn't explode into 10^6 scheduler-bound tiny blocks
        # (past the cap each task walks several seeds sequentially)
        n_seed_blocks = max(1, min(len(seed_urls), total_cpus * 8))
        seeds = rd.from_items([
            {"seed": s, "seed_idx": i} for i, s in enumerate(seed_urls)],
            override_num_blocks=n_seed_blocks)
        frontier = seeds.map_batches(
            discover_batch, batch_format="pyarrow", batch_size=1,
            fn_kwargs=dict(
                web_factory=web_factory, min_priority=min_priority,
                include_patterns=include_patterns,
                exclude_patterns=exclude_patterns, limit=limit,
                freshness_priority=freshness_priority)
        ).materialize()  # frontier rows are metadata-sized
    result.t_discovery = round(_time.time() - t_disc, 2)

    for round_no in range(start_round, cfg.max_rounds):
        rdir = _round_dir(out_dir, round_no)
        if frontier.count() == 0:
            break
        if (os.path.exists(rdir)
                and not os.path.exists(os.path.join(rdir, "_MANIFEST.json"))):
            # a kill mid-round left partial checkpoints; re-running the
            # round must start clean (write_parquet appends part files)
            import shutil
            shutil.rmtree(rdir)
        os.makedirs(rdir, exist_ok=True)
        timings: dict[str, float] = {}
        t0 = _time.time()

        # a–d fused: dedup + seen-filter + robots + schedule around ONE
        # groupby(host) (two keyed stages when schedule_salts > 1, which
        # bounds the per-task group size for hot hosts).  The URL-seen
        # probe runs as a map_batches stage BEFORE the groupby: reads
        # are idempotent, so filtering pre-dedup is equivalent, and the
        # shard RPC count is ∝ blocks × shards instead of host groups ×
        # shards (a 10^5-host round would otherwise issue 10^5
        # synchronous probe fan-outs from inside the group fns)
        open_hosts = frozenset(
            h for h, (streak, ou) in breaker.items() if ou > round_no)
        host_boosts: dict = {}
        if cfg.authority_boost > 1 and host_edges:
            from ..state.authority import (authority_multipliers,
                                           local_pagerank_hosts)
            host_boosts = authority_multipliers(
                local_pagerank_hosts(host_edges, cfg.authority_iters),
                cfg.authority_boost)
        unseen = frontier.map_batches(
            SeenProbe(shards, mode="filter_unseen"), batch_format="pyarrow")
        if cfg.schedule_salts > 1:
            # stage-1 contender cut: global budget × MAX boost — a
            # superset of every host's boosted final budget, so the
            # per-host boost dict only needs to reach stage 2
            cut_budget = budget * (max(host_boosts.values())
                                   if host_boosts else 1)
            pre = unseen.map_batches(
                add_salt_batch, batch_format="pyarrow",
                fn_kwargs=dict(n_salts=cfg.schedule_salts)
            ).groupby(["host", "salt"]).map_groups(
                make_salted_preprocessor(None, robots_factory, cut_budget,
                                         open_hosts=open_hosts),
                batch_format="pandas")
            pre = pre.materialize()  # branched by two filters below —
            # without this the groupby + seen-probe RPCs would run twice
            contenders = pre.filter(expr="contender == True")
            salted_out = pre.filter(expr="contender == False").map_batches(
                _mark_deferred_batch, batch_format="pyarrow")
            final = contenders.groupby("host").map_groups(
                make_host_finalizer(budget, robots_factory,
                                    cfg.round_seconds,
                                    host_boosts=host_boosts),
                batch_format="pandas")
            schedule = (final.map_batches(conform_schedule_batch,
                                          batch_format="pyarrow")
                        .union(salted_out)).materialize()
        else:
            schedule = unseen.groupby("host").map_groups(
                make_host_processor(None, robots_factory, budget,
                                    cfg.round_seconds,
                                    open_hosts=open_hosts,
                                    host_boosts=host_boosts),
                batch_format="pandas"
            ).map_batches(conform_schedule_batch, batch_format="pyarrow"
                          ).materialize()
        timings["schedule"] = round(_time.time() - t0, 2)

        # checkpoint writes run CONCURRENTLY with the fetch/convert
        # phase (VERDICT r01 #3: the schedule is already materialized,
        # so its parquet write — and the deferred rows' persistence into
        # frontier_next — need not serialize with the round's hot
        # phase).  The round manifest is only written after ALL threads
        # join, so resume semantics are unchanged: a crash mid-round
        # leaves no _MANIFEST.json and the partial round is discarded.
        import threading

        try:
            # Ray-internal module (2.49): lets the sink be constructed
            # on the main thread, with only the execution in a thread.
            # Guarded: if a Ray upgrade moves it, degrade to serialized
            # main-thread writes (correct, just loses the overlap).
            from ray.data._internal.datasource.parquet_datasink import (
                ParquetDatasink,
            )
        except ImportError:
            ParquetDatasink = None
            global _WARNED_SERIAL_CKPT
            if not _WARNED_SERIAL_CKPT:
                _WARNED_SERIAL_CKPT = True
                # loud once: without this, a Ray upgrade that moves the
                # module would silently drop the checkpoint-IO overlap
                # (correctness unchanged, but checkpoint_wait regresses)
                logger.warning(
                    "ray.data._internal...parquet_datasink not importable "
                    "— checkpoint writes fall back to serialized "
                    "main-thread write_parquet (no fetch overlap)")

        ckpt_errors: list[BaseException] = []
        ckpt_threads: list[threading.Thread] = []

        def _bg(fn):
            def run():
                try:
                    fn()
                except BaseException as exc:  # re-raised at join
                    ckpt_errors.append(exc)
            t = threading.Thread(target=run, daemon=True)
            t.start()
            ckpt_threads.append(t)

        def _bg_write(ds_, path):
            # construct the sink NOW, on the main thread: datasink
            # construction resolves paths/filesystems, and Ray's
            # resolution path attempts an fsspec-http import that is not
            # safe under concurrent first-import (aiohttp is absent in
            # this container, so the failing import re-executes every
            # time and a concurrent from-import can observe the
            # partially-initialized module).  Serial construction +
            # concurrent execution avoids the race entirely.
            if ParquetDatasink is None:
                ds_.write_parquet(path)  # fallback: serial, no overlap
                return
            sink = ParquetDatasink(path)
            _bg(lambda: ds_.write_datasink(sink))

        def _join_ckpt():
            for t in ckpt_threads:
                t.join()
            if ckpt_errors:
                raise ckpt_errors[0]

        scheduled = schedule.filter(expr="scheduled == True")
        deferred = schedule.filter(expr="scheduled == False")
        n_scheduled = scheduled.count()
        n_deferred = schedule.count() - n_scheduled
        next_dir = os.path.join(rdir, "frontier_next")

        _bg_write(schedule, os.path.join(rdir, "schedule"))

        if n_scheduled == 0:
            breaker_waiting = bool(open_hosts) and n_deferred > 0
            if breaker_waiting:
                # every pending row belongs to a breaker-open host:
                # persist the deferred frontier and sit the round out
                # (the oracle keeps advancing rounds the same way)
                _bg_write(deferred.map_batches(conform_frontier_batch,
                                               batch_format="pyarrow"),
                          next_dir)
            _join_ckpt()
            if cfg.breaker_threshold > 0:
                _write_breaker_state(rdir, breaker, round_no)
            if cfg.authority_boost > 1:
                _write_authority_state(rdir, host_edges)
            entry = {"round": round_no, "scheduled": 0, "fetched": 0,
                     "failed": 0, "deferred": n_deferred}
            result.manifest.append(entry)
            result.rounds = round_no + 1
            with open(os.path.join(rdir, "_MANIFEST.json"), "w") as f:
                json.dump(entry, f)
            if not breaker_waiting:
                break
            frontier = _read_frontier(next_dir).materialize()
            continue

        # deferred rows land in frontier_next immediately (the links
        # part appends to the same directory after docs complete)
        _bg_write(deferred.map_batches(conform_frontier_batch,
                                       batch_format="pyarrow"), next_dir)

        # e. mark seen + fetch + convert; docs checkpoint is the fork point
        # repartition first: schedule blocks mirror host groups, which can
        # leave the fetch/parse chain with too few blocks to parallelize
        n_blocks = max(1, min(n_scheduled // cfg.fetch_batch_size + 1,
                              total_cpus * 4))
        marked = (scheduled.repartition(n_blocks)
                  .map_batches(SeenProbe(shards, mode="mark",
                                         round_no=round_no),
                               batch_format="pyarrow"))
        chunk_sink = os.path.join(rdir, "chunks")
        if cfg.fetch_mode == "tasks":
            # pure-function resolver → stateless tasks on the warm pool
            docs = marked.map_batches(
                fetch_convert_batch, batch_format="pyarrow",
                batch_size=cfg.fetch_batch_size,
                fn_kwargs=dict(web_factory=web_factory,
                               chunk_sink=chunk_sink,
                               chunk_size=cfg.chunk_size,
                               chunk_overlap=cfg.chunk_overlap))
        else:
            # stateful fetch tier: fixed-size actor pool, spawned up
            # front in parallel (autoscaling ramp costs more than it
            # saves); clamped to the cluster above so it can't deadlock
            docs = marked.map_batches(
                FetchConvertStage, batch_format="pyarrow",
                batch_size=cfg.fetch_batch_size,
                concurrency=fetch_conc,
                fn_constructor_kwargs=dict(web_factory=web_factory,
                                           cache_ttl=cfg.payload_cache_ttl,
                                           pacing_rps=cfg.pacing_rps,
                                           chunk_sink=chunk_sink,
                                           chunk_size=cfg.chunk_size,
                                           chunk_overlap=cfg.chunk_overlap,
                                           robots_factory=robots_factory))
        # stream straight to the parquet checkpoint (no materialize —
        # a round's docs shouldn't double-buffer through the object
        # store); chunks/links/metrics re-read column-pruned slices
        t0 = _time.time()
        docs_dir = os.path.join(rdir, "docs")
        # zstd: markdown/html text compresses 3-4x — trades scalable CPU
        # for the flat checkpoint-IO cost that dominates at high core
        # counts
        docs.write_parquet(docs_dir, compression="zstd")
        timings["fetch_convert"] = round(_time.time() - t0, 2)

        # chunks were written as a sidecar inside the convert tasks
        # (IO fusion — no docs re-read); the directory exists iff any
        # batch produced chunk rows
        timings["chunks"] = 0.0

        t0 = _time.time()
        if cfg.max_depth > 0:
            # links part APPENDS to frontier_next (the deferred part was
            # written concurrently with the fetch above; write_parquet
            # part-file names are unique per call)
            # 200s carry page links; 3xx rows carry their redirect
            # target in the same column — both feed the next frontier
            link_src = rd.read_parquet(
                docs_dir, columns=["depth", "links", "status"]).filter(
                expr=f"status >= 200 and status < 400 "
                     f"and depth < {cfg.max_depth}")
            (link_src.map_batches(
                links_explode_batch, batch_format="pyarrow",
                fn_kwargs=dict(trap_cap=cfg.trap_links_per_template))
             .map_batches(conform_frontier_batch, batch_format="pyarrow")
             .write_parquet(next_dir))
        timings["links_frontier"] = round(_time.time() - t0, 2)

        # metrics + manifest — one pass over the pruned status column
        def _status_partial(b: pa.Table) -> pa.Table:
            import pyarrow.compute as pc
            return pa.table({
                "ok": [pc.sum(pc.equal(b["status"], 200)).as_py() or 0],
                "n": [b.num_rows],
            })

        status_df = (rd.read_parquet(docs_dir, columns=["status"])
                     .map_batches(_status_partial, batch_format="pyarrow")
                     .to_pandas())
        ok = int(status_df["ok"].sum())
        total = int(status_df["n"].sum())

        if cfg.breaker_threshold > 0:
            _update_breaker(breaker, docs_dir, round_no, cfg)
        if cfg.authority_boost > 1:
            host_edges = _update_authority_edges(host_edges, docs_dir, cfg)

        t0 = _time.time()
        _join_ckpt()  # all checkpoint writes durable before the manifest
        timings["checkpoint_wait"] = round(_time.time() - t0, 2)
        if cfg.breaker_threshold > 0:
            _write_breaker_state(rdir, breaker, round_no)
        if cfg.authority_boost > 1:
            _write_authority_state(rdir, host_edges)
        entry = {
            "round": round_no, "scheduled": total, "fetched": ok,
            "failed": total - ok,
            "deferred": n_deferred,
            "timings": timings,
        }
        result.manifest.append(entry)
        result.fetched += ok
        result.failed += total - ok
        result.rounds = round_no + 1
        with open(os.path.join(rdir, "_MANIFEST.json"), "w") as f:
            json.dump(entry, f)

        frontier = _read_frontier(next_dir).materialize()

    with open(os.path.join(out_dir, "_CRAWL.json"), "w") as f:
        json.dump({"rounds": result.rounds, "fetched": result.fetched,
                   "failed": result.failed}, f)
    return result


class _RestorePush:
    """``map_batches`` stage for the resume path: each batch pushes its
    seen-keys to the owning shard actors from INSIDE the map task, so
    the driver never holds more than block metadata — O(batch) keys per
    task instead of an O(all-scheduled-URLs) driver list.  Restore is
    idempotent per shard (``_SeenCore.restore`` skips known keys), so
    Ray task retries are safe."""

    def __init__(self, shards):
        self.shards = shards

    def __call__(self, batch: pa.Table) -> pa.Table:
        import ray

        from ..state.seen import shard_of

        keys = batch.column("seen_key").to_pylist()
        by_shard: dict[int, list[str]] = {}
        for key in keys:
            by_shard.setdefault(shard_of(key, len(self.shards)), []).append(key)
        ray.get([self.shards[s].restore.remote(ks)
                 for s, ks in by_shard.items()])
        return pa.table({"n": pa.array([len(keys)], pa.int64())})


def _restore(out_dir: str, shards, result: CrawlResult):
    """Resume support: restore seen-set from completed rounds' schedule
    checkpoints and return (next_round, frontier Dataset).  The key
    push is a streaming ``map_batches`` pass over ALL completed rounds'
    schedule files at once — keys travel storage → map task → shard
    actor without a driver materialization."""
    import glob

    import ray.data as rd

    round_no = 0
    frontier = None
    schedule_files: list[str] = []
    while True:
        rdir = _round_dir(out_dir, round_no)
        manifest = os.path.join(rdir, "_MANIFEST.json")
        if not os.path.exists(manifest):
            break
        with open(manifest) as f:
            entry = json.load(f)
        result.manifest.append(entry)
        result.fetched += entry["fetched"]
        result.failed += entry["failed"]
        result.rounds = round_no + 1
        # empty-schedule rounds write zero files
        schedule_files.extend(glob.glob(
            os.path.join(rdir, "schedule", "*.parquet")))
        frontier = _read_frontier(os.path.join(rdir, "frontier_next"))
        round_no += 1

    if schedule_files:
        # consuming the count forces every push before scheduling resumes
        (rd.read_parquet(schedule_files, columns=["seen_key", "scheduled"])
         .filter(expr="scheduled == True")
         .map_batches(_RestorePush(shards), batch_format="pyarrow")
         .count())

    # drop any manifest-less (partial) round dirs beyond the last
    # complete round so they can't pollute read_crawl_order even if the
    # resumed frontier drains before reaching them
    import glob as _glob
    import shutil as _shutil
    for stale in _glob.glob(os.path.join(out_dir, "rounds", "round=*")):
        if (int(stale.rsplit("=", 1)[1]) >= round_no
                and not os.path.exists(os.path.join(stale, "_MANIFEST.json"))):
            _shutil.rmtree(stale)
    return round_no, frontier


def read_crawl_order(out_dir: str):
    """Canonical crawl order from the schedule checkpoints:
    (round, host, fetch_order) ascending."""
    import glob

    import pandas as pd
    import pyarrow.parquet as pq

    frames = []
    for rdir in sorted(glob.glob(os.path.join(out_dir, "rounds", "round=*"))):
        round_no = int(rdir.rsplit("=", 1)[1])
        path = os.path.join(rdir, "schedule")
        if not os.path.isdir(path):
            continue
        df = pq.read_table(path).to_pandas()
        df = df[df["scheduled"]]
        df["round"] = round_no
        frames.append(df[["round", "host", "fetch_order", "loc", "seq_no",
                          "seen_key"]])
    if not frames:
        return pd.DataFrame(columns=["round", "host", "fetch_order", "loc",
                                     "seq_no", "seen_key"])
    out = pd.concat(frames, ignore_index=True)
    return out.sort_values(["round", "host", "fetch_order"],
                           kind="mergesort").reset_index(drop=True)


def read_host_edges(out_dir: str):
    """Distinct cross-host link edges (src_host → dst_host) from the
    docs checkpoints — the link graph used for authority-based frontier
    prioritization (PageRank over hosts).  Streaming: the explode runs
    in ``map_batches`` over the checkpoint files and only (src, dst)
    pairs reach the one distinct shuffle; self-edges (intra-host nav)
    are dropped at the source."""
    import glob

    import ray.data as rd
    from ray.data.aggregate import Count

    from ..kernels.urls import get_domain_from_url

    files = sorted(glob.glob(
        os.path.join(out_dir, "rounds", "round=*", "docs", "*.parquet")))
    if not files:
        import pandas as pd
        return rd.from_pandas(pd.DataFrame(
            {"src": pd.Series(dtype="object"),
             "dst": pd.Series(dtype="object")}))

    def explode(batch: pa.Table) -> pa.Table:
        src_col, dst_col = [], []
        for h, links in zip(batch.column("host").to_pylist(),
                            batch.column("links").to_pylist()):
            for link in links or []:
                dst = get_domain_from_url(link)
                if dst and dst != h:
                    src_col.append(h)
                    dst_col.append(dst)
        return pa.table({"src": pa.array(src_col, pa.string()),
                         "dst": pa.array(dst_col, pa.string())})

    return (rd.read_parquet(files, columns=["host", "links"])
            .map_batches(explode, batch_format="pyarrow")
            .groupby(["src", "dst"]).aggregate(Count(alias_name="__c"))
            .map_batches(lambda b: b.select(["src", "dst"]),
                         batch_format="pyarrow"))


def crawl_health(out_dir: str):
    """Per-host crawl health panel from the round checkpoints: how
    many fetches each host got, how many failed, how much of its
    frontier sat deferred, and how many rounds it was active — the
    ops view for "which hosts are starving / erroring / hogging".

    Read-side audit over the column-pruned schedule and docs parquet
    of every completed round: per-batch host partials → ONE bucketed
    fold — the checkpoint rows never concatenate on the driver (only
    the O(hosts) panel does).  Returns a pandas DataFrame (host,
    n_scheduled, n_deferred, n_fetched, n_failed, rounds_active),
    host-sorted.
    """
    import glob

    import numpy as np
    import pandas as pd
    import ray.data as rd

    from ..stages.bucketing import key_buckets

    sched_dirs, docs_dirs = [], []
    for rdir in sorted(glob.glob(os.path.join(out_dir, "rounds",
                                              "round=*"))):
        if not os.path.exists(os.path.join(rdir, "_MANIFEST.json")):
            continue
        s = os.path.join(rdir, "schedule")
        d = os.path.join(rdir, "docs")
        if os.path.isdir(s):
            sched_dirs.extend(
                sorted(glob.glob(os.path.join(s, "*.parquet"))))
        if os.path.isdir(d) and glob.glob(os.path.join(d, "*.parquet")):
            docs_dirs.append(
                (int(rdir.rsplit("=", 1)[1]), d))

    cols = ["host", "n_scheduled", "n_deferred", "n_fetched",
            "n_failed", "rounds_active"]
    if not sched_dirs:
        return pd.DataFrame(columns=cols)

    def sched_partial(df: "pd.DataFrame") -> "pd.DataFrame":
        g = (df.assign(_s=df["scheduled"].astype("int64"))
             .groupby("host", sort=False)
             .agg(n_scheduled=("_s", "sum"), n_rows=("_s", "size"))
             .reset_index())
        return pd.DataFrame({
            "host": g["host"],
            "n_scheduled": g["n_scheduled"].astype("int64"),
            "n_deferred": (g["n_rows"]
                           - g["n_scheduled"]).astype("int64"),
            "n_fetched": np.int64(0), "n_failed": np.int64(0),
            "_round": np.int64(-1)})

    def docs_partial(df: "pd.DataFrame", round_no: int) -> "pd.DataFrame":
        ok = (df["status"] == 200).astype("int64")
        g = (df.assign(_ok=ok)
             .groupby("host", sort=False)
             .agg(n_ok=("_ok", "sum"), n=("_ok", "size")).reset_index())
        return pd.DataFrame({
            "host": g["host"], "n_scheduled": np.int64(0),
            "n_deferred": np.int64(0),
            "n_fetched": g["n_ok"].astype("int64"),
            "n_failed": (g["n"] - g["n_ok"]).astype("int64"),
            "_round": np.int64(round_no)})

    parts = rd.read_parquet(
        sched_dirs, columns=["host", "scheduled"]).map_batches(
        sched_partial, batch_format="pandas")
    # rounds_active = distinct rounds with a fetch: partials carry the
    # round number and the fold counts distincts (a round's docs can
    # arrive as many batches — a per-batch flag would over-count)
    doc_parts = [rd.read_parquet(d, columns=["host", "status"])
                 .map_batches(docs_partial, batch_format="pandas",
                              fn_kwargs=dict(round_no=rn))
                 for rn, d in docs_dirs]

    union = parts
    for dp in doc_parts:
        union = union.union(dp)

    def fold(g: "pd.DataFrame") -> "pd.DataFrame":
        agg = (g.groupby("host", sort=False)
               .agg({"n_scheduled": "sum", "n_deferred": "sum",
                     "n_fetched": "sum", "n_failed": "sum"})
               .reset_index())
        docs = g[g["_round"] >= 0]
        ra = (docs.groupby("host", sort=False)["_round"].nunique()
              .rename("rounds_active").reset_index())
        out = agg.merge(ra, on="host", how="left")
        out["rounds_active"] = (out["rounds_active"].fillna(0)
                                .astype("int64"))
        return out.astype({c: "int64" for c in cols[1:]})

    tagged = union.map_batches(
        lambda df: df.assign(_b=key_buckets(df["host"].to_numpy(), 32)),
        batch_format="pandas")
    panel = (tagged.groupby("_b").map_groups(fold, batch_format="pandas")
             .to_pandas())
    return (panel[cols].sort_values("host", kind="mergesort")
            .reset_index(drop=True))

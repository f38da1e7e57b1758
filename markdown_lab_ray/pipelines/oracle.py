"""Sequential single-process crawl oracle.

Implements crawl_spec.py step-for-step with plain Python state
(``LocalSeen``, ``LocalRobotsCache``) — the reference-semantics twin the
distributed engine must match exactly on crawl order and URL-seen set
(BASELINE.json north_rule).  Shares every kernel and the scheduler
(``schedule_group``) with the Ray path so there is ONE source of truth
for the ordering rules.
"""

from __future__ import annotations

import pandas as pd

from ..config import EngineConfig
from ..kernels.html_kernels import extract_links
from ..kernels.urls import redirect_target
from ..state.authority import (authority_multipliers, extract_host_edges,
                               local_pagerank_hosts, merge_edges)
from ..state.politeness import (breaker_update, effective_budget,
                                round_budget, schedule_group)
from ..state.robots import LocalRobotsCache
from ..state.seen import LocalSeen
from .crawl_spec import (
    dedup_candidates,
    discover_seed_frontier,
    links_to_frontier_rows,
)


def run_crawl_oracle(resolve_fn, seed_urls: list[str],
                     cfg: EngineConfig | None = None,
                     min_priority=None, include_patterns=None,
                     exclude_patterns=None, limit=None,
                     freshness_priority: bool = False) -> dict:
    """Returns {"order": [loc...], "order_detail": DataFrame,
    "seen": set(seen_key), "fetched": int, "failed": int}."""
    cfg = cfg or EngineConfig()
    robots = LocalRobotsCache(resolve_fn)
    seen = LocalSeen(cfg.seen_capacity_per_shard, cfg.seed)
    budget = round_budget(cfg.requests_per_second, cfg.round_seconds)

    candidates: list[dict] = []
    for idx, seed in enumerate(seed_urls):
        candidates.extend(discover_seed_frontier(
            resolve_fn, robots, seed, idx, min_priority, include_patterns,
            exclude_patterns, limit, freshness_priority))

    order_rows: list[dict] = []
    fetched = failed = 0
    streaks: dict[str, int] = {}      # circuit breaker: host → streak
    open_until: dict[str, int] = {}   # host → first round it may re-enter
    host_edges: set = set()           # authority: observed cross-host links

    for round_no in range(cfg.max_rounds):
        if not candidates:
            break
        boosts: dict = {}
        if cfg.authority_boost > 1 and host_edges:
            boosts = authority_multipliers(
                local_pagerank_hosts(host_edges, cfg.authority_iters),
                cfg.authority_boost)
        # breaker-open hosts sit the round out: their candidate rows
        # are carried forward untouched (deferred, never dropped)
        open_hosts = {h for h, r in open_until.items() if r > round_no}
        carried = [c for c in candidates if c["host"] in open_hosts]
        candidates = [c for c in candidates if c["host"] not in open_hosts]
        rows = dedup_candidates(candidates)
        flags = seen.contains_many([r["seen_key"] for r in rows])
        rows = [r for r, is_seen in zip(rows, flags) if not is_seen]
        rows = [r for r in rows if robots.rules_for(r["host"]).allows(r["loc"])]

        scheduled: list[dict] = []
        deferred: list[dict] = []
        if rows:
            frame = pd.DataFrame(rows)
            for host in sorted(frame["host"].unique()):
                host_budget = effective_budget(
                    budget * boosts.get(host, 1), cfg.round_seconds,
                    robots.rules_for(host).crawl_delay)
                group = schedule_group(frame[frame["host"] == host],
                                       host_budget)
                for record in group.to_dict("records"):
                    (scheduled if record["scheduled"] else deferred).append(record)

        new_flags = seen.check_and_add([r["seen_key"] for r in scheduled])
        scheduled = [r for r, is_new in zip(scheduled, new_flags) if is_new]

        candidates = carried + [
            {k: row[k] for k in ("loc", "lastmod", "changefreq", "priority",
                                 "host", "depth", "seq_no", "seen_key")}
            for row in deferred
        ]
        round_stats: dict[str, list[int]] = {}  # host → [n_ok, n_fail]
        for row in scheduled:
            status, body = resolve_fn(row["loc"])
            order_rows.append({
                "round": round_no, "host": row["host"],
                "fetch_order": row["fetch_order"], "loc": row["loc"],
                "seq_no": row["seq_no"], "status": status,
            })
            stat = round_stats.setdefault(row["host"], [0, 0])
            if status == 200 and isinstance(body, str):
                fetched += 1
                stat[0] += 1
                links = extract_links(body, row["loc"])
                if cfg.authority_boost > 1:
                    host_edges = merge_edges(
                        host_edges,
                        extract_host_edges(row["host"], links),
                        cfg.authority_edge_cap)
                if row["depth"] < cfg.max_depth:
                    candidates.extend(links_to_frontier_rows(
                        row["depth"], links,
                        cfg.trap_links_per_template))
            else:
                failed += 1
                stat[1] += 1
                # redirect target → next-round frontier candidate (same
                # shared kernel + depth rule as the engine's links path)
                target = redirect_target(
                    status, body if isinstance(body, str) else "",
                    row["loc"])
                if target is not None and row["depth"] < cfg.max_depth:
                    candidates.extend(links_to_frontier_rows(
                        row["depth"], [target],
                        cfg.trap_links_per_template))

        if cfg.breaker_threshold > 0:
            for host, (n_ok, n_fail) in round_stats.items():
                streak, tripped = breaker_update(
                    streaks.get(host, 0), n_ok, n_fail,
                    cfg.breaker_threshold)
                if tripped:
                    open_until[host] = (round_no + 1
                                        + cfg.breaker_cooldown_rounds)
                    streaks.pop(host, None)
                elif streak > 0:
                    streaks[host] = streak
                else:
                    streaks.pop(host, None)

    detail = pd.DataFrame(order_rows)
    if not detail.empty:
        detail = detail.sort_values(["round", "host", "fetch_order"],
                                    kind="mergesort").reset_index(drop=True)
    return {
        "order": detail["loc"].tolist() if not detail.empty else [],
        "order_detail": detail,
        "seen": set(seen.snapshot()),
        "fetched": fetched,
        "failed": failed,
    }

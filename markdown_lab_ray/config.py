"""Engine configuration.

Mirrors the knob surface of the reference config
(``/root/reference/markdown_lab/core/config.py:22-69``) plus the
Ray-specific per-stage knobs the rebuild needs (batch sizes, actor-pool
concurrency, shard counts).  Env-var overrides use the same
``MARKDOWN_LAB_*`` prefix as the reference (``config.py:119-151``).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field, fields


@dataclass
class EngineConfig:
    # -- politeness / fetch (reference: requests_per_second, timeout, retries)
    requests_per_second: float = 1.0
    timeout: float = 30.0
    max_retries: int = 3
    backoff_base: float = 2.0

    # -- chunking (reference: chunk_size=1000, chunk_overlap=200)
    chunk_size: int = 1000
    chunk_overlap: int = 200
    words_per_char_ratio: int = 5

    # -- output
    default_output_format: str = "markdown"
    include_metadata: bool = True

    # -- crawl scheduling (new: per-host budget per BSP round)
    round_seconds: float = 60.0        # politeness window one round represents
    max_rounds: int = 10
    max_depth: int = 3

    # -- Ray stage sizing
    parse_batch_size: int = 256        # HTML rows can be up to 10 MB each
    fetch_batch_size: int = 64         # smaller batches → deeper fetch pipeline
    chunk_batch_size: int = 256
    image_batch_size: int = 64         # binary payload rows stay small
    fetch_concurrency: int = 8         # fetch actor pool size
    fetch_mode: str = "actors"         # "actors" (stateful tier) | "tasks"
    parse_concurrency: int = 0         # 0 => stateless tasks, let Ray scale
    seen_shards: int = 16              # URL-seen filter shard actors
    schedule_salts: int = 0            # >1 → two-stage salted schedule
                                       # (bounds hot-host group size)
    payload_cache_ttl: float = 0.0     # >0 → per-fetch-actor TTL/LRU cache
    pacing_rps: float = 0.0            # >0 → realtime per-host pacing in
                                       # fetch actors (sleeps!); the round
                                       # budget still bounds volume
    seen_capacity_per_shard: int = 1 << 20

    # -- misc
    seed: int = 42
    extra: dict = field(default_factory=dict)

    @classmethod
    def from_env(cls, **overrides) -> "EngineConfig":
        """Build a config applying ``MARKDOWN_LAB_<FIELD>`` env overrides."""
        kwargs = {}
        for f in fields(cls):
            env_key = f"MARKDOWN_LAB_{f.name.upper()}"
            if env_key in os.environ:
                raw = os.environ[env_key]
                if f.type in ("int", int):
                    kwargs[f.name] = int(raw)
                elif f.type in ("float", float):
                    kwargs[f.name] = float(raw)
                elif f.type in ("bool", bool):
                    kwargs[f.name] = raw.lower() in ("1", "true", "yes")
                elif f.name != "extra":
                    kwargs[f.name] = raw
        kwargs.update(overrides)
        return cls(**kwargs)


DEFAULT_CONFIG = EngineConfig()

"""Checkpoint compaction: per-round crawl output → consolidated,
hash-sharded parquet.

A long crawl leaves ``out_dir/rounds/round=N/{docs,chunks}/`` — many
small per-round files.  Downstream consumers (and the next crawl's
seed set) want few large key-sharded files instead; this job reads
every COMPLETE round (``_MANIFEST.json`` present — the same
completeness marker resume uses, so a compactor racing a live crawl
never reads a partial round) and re-shards through the resumable
``write_sharded_parquet`` sink.

Safety contract: a ``_COMPACTION.json`` manifest next to the shards
records exactly which rounds the destination covers.  Re-running with
the SAME round set resumes (finishes missing shards, skips done ones);
re-running after MORE rounds completed fails fast — done-shards would
silently miss the new rounds' rows — directing the caller to a fresh
destination (compactions are cheap; destinations are immutable once
cut).
"""

from __future__ import annotations

import glob
import json
import os


def _complete_rounds(out_dir: str) -> list[int]:
    rounds = []
    for manifest in glob.glob(os.path.join(out_dir, "rounds", "round=*",
                                           "_MANIFEST.json")):
        rounds.append(int(os.path.dirname(manifest).rsplit("=", 1)[1]))
    return sorted(rounds)


def compact_crawl_output(out_dir: str, dest_dir: str, what: str = "docs",
                         n_shards: int = 16):
    """Compact ``what`` ("docs" or "chunks") from every complete round
    of ``out_dir`` into ``dest_dir`` (hash-sharded on url / source_url).
    Returns (rounds_covered, n_rows)."""
    import ray.data as rd

    from ..sources.io import read_sharded_parquet, write_sharded_parquet

    if what not in ("docs", "chunks"):
        raise ValueError(f"what must be 'docs' or 'chunks', got {what!r}")
    key_col = "url" if what == "docs" else "source_url"

    rounds = _complete_rounds(out_dir)
    files = []
    for r in rounds:
        files.extend(sorted(glob.glob(os.path.join(
            out_dir, "rounds", f"round={r}", what, "*.parquet"))))

    os.makedirs(dest_dir, exist_ok=True)
    manifest_path = os.path.join(dest_dir, "_COMPACTION.json")
    params = {"source": os.path.abspath(out_dir), "what": what,
              "rounds": rounds}
    if os.path.exists(manifest_path):
        with open(manifest_path) as f:
            prior = json.load(f)
        if prior != params:
            raise ValueError(
                f"destination already compacted rounds {prior.get('rounds')} "
                f"of {prior.get('what')}; this run covers {rounds} — "
                "compact into a fresh dest_dir (done-shards would "
                "silently miss the new rounds' rows)")
    with open(manifest_path, "w") as f:
        json.dump(params, f)

    if not files:
        return rounds, 0
    ds = rd.read_parquet(files)
    write_sharded_parquet(ds, dest_dir, key_col=key_col, n_shards=n_shards)
    n_rows = read_sharded_parquet(dest_dir).count()
    return rounds, n_rows

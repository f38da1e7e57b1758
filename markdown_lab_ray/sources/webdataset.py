"""WebDataset-style tar shard sink + reader for image+caption corpora.

Large-scale multimodal training readers (WebDataset / torchdata-style)
consume tar shards where each sample is a group of same-stem members:
``{key}.bin`` (image bytes), ``{key}.txt`` (caption), ``{key}.json``
(typed metadata).  This module packs an image-table Dataset
(BASELINE.json input_hint schema) into such shards with the same
resumability contract as ``write_sharded_parquet`` (sources/io.py):

- rows are hash-bucketed on the key column into ``n_shards`` shards
  (process-stable hash, so a resume assigns identical rows to
  identical shards);
- a ``_SHARDING.json`` manifest pins (key_col, n_shards) — a resume
  with different parameters fails fast instead of silently splitting
  rows across two layouts;
- each ``shard-NNNNN.tar`` is written to a temp name and renamed into
  place, then marked by a ``.done`` sentinel — a reader never sees a
  partial tar, and a crashed run rewrites only sentinel-less shards;
- tars are byte-deterministic: members sorted by key, zeroed mtimes,
  fixed uid/gid — two runs over the same table produce identical
  sha256s (the property the determinism test locks).

Scale notes: one tar per shard task, tasks run in an actor-less
``map_groups`` over the shard id — shard count (not corpus size)
bounds any single task's output file, the standard "never one giant
file" layout.  On a real cluster ``out_dir`` is shared storage; the
writer only appends within its own shard, so tasks never contend.
"""

from __future__ import annotations

import glob
import io
import json
import os
import tarfile

import pyarrow as pa


def _tar_bytes(names_payloads) -> bytes:
    """Deterministic in-memory tar: fixed metadata, caller-ordered."""
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tar:
        for name, payload in names_payloads:
            info = tarfile.TarInfo(name=name)
            info.size = len(payload)
            info.mtime = 0
            info.uid = info.gid = 0
            info.uname = info.gname = ""
            tar.addfile(info, io.BytesIO(payload))
    return buf.getvalue()


def write_webdataset_shards(ds, out_dir: str, key_col: str = "image_id",
                            bytes_col: str = "bytes",
                            caption_col: str = "caption",
                            n_shards: int = 16, resume: bool = True):
    """Pack a Dataset into WebDataset-style tar shards.  Returns the
    sorted list of shard ids written THIS run (resumed-over shards are
    skipped).  All non-key/bytes/caption columns land in ``{key}.json``
    as metadata."""
    import numpy as np

    from ..stages.bucketing import key_buckets

    os.makedirs(out_dir, exist_ok=True)
    manifest_path = os.path.join(out_dir, "_SHARDING.json")
    params = {"key_col": key_col, "n_shards": n_shards}
    if resume and os.path.exists(manifest_path):
        with open(manifest_path) as f:
            prior = json.load(f)
        if prior != params:
            raise ValueError(
                f"sharding parameters changed: sink was written with "
                f"{prior}, resume requested {params} — use a fresh "
                f"out_dir or resume=False to rewrite")
    with open(manifest_path, "w") as f:
        json.dump(params, f)

    done = set()
    if resume:
        for p in glob.glob(os.path.join(out_dir, "shard-*.done")):
            done.add(int(os.path.basename(p)[6:11]))
    else:
        for p in glob.glob(os.path.join(out_dir, "shard-*")):
            os.unlink(p)
    # sentinel-less tars are partial (crash between write and rename is
    # impossible — rename is atomic — but a stale temp can linger)
    for p in glob.glob(os.path.join(out_dir, "shard-*.tar.tmp")):
        os.unlink(p)

    def tag(batch: pa.Table) -> pa.Table:
        shards = key_buckets(batch.column(key_col).to_pandas().to_numpy(),
                             n_shards)
        out = batch.append_column("_shard", pa.array(shards, pa.int64()))
        if done:
            out = out.filter(pa.array(~np.isin(shards, list(done))))
        return out

    def write_shard(group, out_dir=out_dir, key_col=key_col,
                    bytes_col=bytes_col, caption_col=caption_col):
        sid = int(group["_shard"].iloc[0])
        group = group.sort_values(key_col, kind="mergesort")
        meta_cols = [c for c in group.columns
                     if c not in (key_col, bytes_col, caption_col, "_shard")]
        members = []
        for _, row in group.iterrows():
            key = str(row[key_col])
            meta = {c: (row[c].item() if hasattr(row[c], "item")
                        else row[c]) for c in meta_cols}
            meta[key_col] = key
            members.append((f"{key}.bin", bytes(row[bytes_col])))
            members.append((f"{key}.txt", str(row[caption_col]).encode()))
            members.append((f"{key}.json",
                            json.dumps(meta, sort_keys=True).encode()))
        final = os.path.join(out_dir, f"shard-{sid:05d}.tar")
        tmp = final + ".tmp"
        with open(tmp, "wb") as f:
            f.write(_tar_bytes(members))
        os.replace(tmp, final)
        with open(os.path.join(out_dir, f"shard-{sid:05d}.done"), "w") as f:
            f.write("ok\n")
        return pa.table({"shard": pa.array([sid], pa.int64()),
                         "n_rows": pa.array([len(group)], pa.int64())})

    written = (ds.map_batches(tag, batch_format="pyarrow")
               .groupby("_shard").map_groups(write_shard)
               .to_pandas())
    return sorted(written["shard"].tolist())


def read_webdataset_shards(out_dir: str):
    """Reader twin: complete shards only (sentinel present) → Dataset
    of (key, bytes, caption, meta_json) rows.  One task per tar — the
    tar list (not the corpus) is what the driver holds."""
    import ray.data as rd

    tars = []
    for p in sorted(glob.glob(os.path.join(out_dir, "shard-*.done"))):
        tar = p[:-5] + ".tar"
        if os.path.exists(tar):
            tars.append(tar)
    if not tars:
        return rd.from_items([])

    def explode(batch: pa.Table) -> pa.Table:
        keys, blobs, captions, metas = [], [], [], []
        for path in batch.column("path").to_pylist():
            samples = {}
            with tarfile.open(path) as tar:
                for member in tar.getmembers():
                    stem, ext = os.path.splitext(member.name)
                    samples.setdefault(stem, {})[ext] = tar.extractfile(
                        member).read()
            for stem in sorted(samples):
                parts = samples[stem]
                keys.append(stem)
                blobs.append(parts.get(".bin", b""))
                captions.append(parts.get(".txt", b"").decode())
                metas.append(parts.get(".json", b"{}").decode())
        return pa.table({
            "key": pa.array(keys, pa.string()),
            "bytes": pa.array(blobs, pa.binary()),
            "caption": pa.array(captions, pa.string()),
            "meta_json": pa.array(metas, pa.string()),
        })

    paths = rd.from_items([{"path": p} for p in tars])
    return paths.map_batches(explode, batch_format="pyarrow", batch_size=1)

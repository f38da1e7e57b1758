"""Image payload plumbing: codec, PSNR validation, perceptual hash.

The container has no real image libraries (PIL/cv2 absent), so the
codec is a clearly-marked deterministic FAKE (SURVEY.md §1.4 +
input_hint): ``fake_encode``/``fake_decode`` round-trip H×W×3 uint8
pixel arrays through a small header + zlib stream, with lossy formats
("jpeg"/"webp") quantizing pixel values so reconstruction error is
non-zero but bounded (PSNR ≈ 43 dB > the 40 dB gate; "png" is exact).
The Ray-side plumbing — schema, batch sizes, actor signature, output
layout — is real and tested; swap ``fake_*`` for PIL/libvips calls on a
real cluster.

``decode_validate_batch`` is the per-row invariant check from
BASELINE.json: decoded-pixel PSNR ≥ 40 dB vs the reference decode +
caption byte-equality.
"""

from __future__ import annotations

import re
import struct
import zlib

import numpy as np
import pyarrow as pa

from .bucketing import tag_buckets_batch

_MAGIC = b"FIMG"
_LOSSY_STEP = 6  # quantization step for fake lossy formats

FORMATS = ("png", "jpeg", "webp")


def fake_encode(pixels: np.ndarray, fmt: str) -> bytes:
    """Encode an (h, w, 3) uint8 array. Lossy formats quantize first."""
    if pixels.dtype != np.uint8 or pixels.ndim != 3 or pixels.shape[2] != 3:
        raise ValueError("pixels must be (h, w, 3) uint8")
    h, w = pixels.shape[:2]
    if fmt != "png":
        pixels = (pixels // _LOSSY_STEP) * _LOSSY_STEP + _LOSSY_STEP // 2
        pixels = pixels.astype(np.uint8)
    header = _MAGIC + fmt.encode().ljust(4, b"\0") + struct.pack("<II", w, h)
    return header + zlib.compress(pixels.tobytes(), level=1)


def fake_decode(data: bytes) -> tuple[np.ndarray, str]:
    """Decode bytes from ``fake_encode`` → ((h, w, 3) uint8, fmt)."""
    if data[:4] != _MAGIC:
        raise ValueError("not a fake-codec image")
    fmt = data[4:8].rstrip(b"\0").decode()
    w, h = struct.unpack("<II", data[8:16])
    pixels = np.frombuffer(zlib.decompress(data[16:]), dtype=np.uint8)
    return pixels.reshape(h, w, 3), fmt


def synth_pixels(image_id: str, w: int, h: int, seed: int = 42) -> np.ndarray:
    """Deterministic per-id pattern+noise image (FIXTURES.md §1).

    The base is a low-frequency sinusoid mix whose orientation/phase
    depend on the id, so distinct ids get distinct perceptual hashes
    while near-dup copies (same base, small jitter) stay close.
    """
    rng = np.random.RandomState(
        (zlib.crc32(image_id.encode()) ^ seed) & 0x7FFFFFFF)
    yy, xx = np.mgrid[0:h, 0:w]
    u = xx / max(w - 1, 1)
    v = yy / max(h - 1, 1)
    base = np.zeros((h, w))
    for _ in range(3):
        fx, fy = rng.uniform(0.5, 3.0, 2)
        phase = rng.uniform(0, 2 * np.pi)
        base += np.sin(2 * np.pi * (fx * u + fy * v) + phase)
    base = 127 + 40 * base
    noise = rng.randint(0, 32, size=(h, w, 3))
    return np.clip(base[..., None] + noise, 0, 255).astype(np.uint8)


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0 ** 2 / mse)


def perceptual_hash(pixels: np.ndarray) -> int:
    """64-bit mean-pool aHash: grayscale → 8×8 block means → >median bits.
    Signed int64 (matches the images table ``phash:int64`` column)."""
    gray = pixels.astype(np.float64).mean(axis=2)
    h, w = gray.shape
    ys = (np.arange(9) * h) // 8
    xs = (np.arange(9) * w) // 8
    blocks = np.empty((8, 8))
    for i in range(8):
        for j in range(8):
            blocks[i, j] = gray[ys[i]:max(ys[i + 1], ys[i] + 1),
                                xs[j]:max(xs[j + 1], xs[j] + 1)].mean()
    bits = (blocks > np.median(blocks)).flatten()
    value = 0
    for bit in bits:
        value = (value << 1) | int(bit)
    return value - (1 << 64) if value >= (1 << 63) else value


def hamming64(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def resize_pixels(pixels: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize (numpy index sampling — the fake-codec
    stand-in for a real resampler; swap for PIL/libvips on a real
    cluster)."""
    h, w = pixels.shape[:2]
    ys = (np.arange(out_h) * h) // out_h
    xs = (np.arange(out_w) * w) // out_w
    return pixels[ys][:, xs]


def color_histogram(pixels: np.ndarray, bins: int = 8) -> np.ndarray:
    """Per-channel normalized color histogram feature (3*bins floats)."""
    feats = []
    for c in range(3):
        hist, _ = np.histogram(pixels[..., c], bins=bins, range=(0, 256))
        feats.append(hist / max(pixels.shape[0] * pixels.shape[1], 1))
    return np.concatenate(feats)


class ImageTransform:
    """Actor-pool stage: decode → resize → feature-extract.

    The Ray-side plumbing (schema, batch size, actor signature, output
    layout) is real; the decode itself uses the deterministic fake codec
    because no image library ships in this container — a real cluster
    replaces ``fake_decode``/``resize_pixels`` with PIL/libvips calls.

    Output rows: image_id, thumb (binary, re-encoded png thumbnail),
    feature (list<float> color histogram), phash (int64).
    """

    def __init__(self, thumb_w: int = 8, thumb_h: int = 8, bins: int = 8):
        self.thumb_w = thumb_w
        self.thumb_h = thumb_h
        self.bins = bins

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("image_id").to_pylist()
        blobs = batch.column("bytes").to_pylist()
        thumbs, feats, phashes, ok = [], [], [], []
        for blob in blobs:
            try:
                pixels, _ = fake_decode(blob)
                thumb = resize_pixels(pixels, self.thumb_w, self.thumb_h)
                thumbs.append(fake_encode(thumb, "png"))
                feats.append(color_histogram(pixels, self.bins).tolist())
                phashes.append(perceptual_hash(pixels))
                ok.append(True)
            except Exception:
                thumbs.append(b"")
                feats.append([0.0] * (3 * self.bins))
                phashes.append(0)
                ok.append(False)
        return pa.table({
            "image_id": pa.array(ids, pa.string()),
            "thumb": pa.array(thumbs, pa.binary()),
            "feature": pa.array(feats, pa.list_(pa.float64())),
            "phash": pa.array(phashes, pa.int64()),
            "decode_ok": pa.array(ok, pa.bool_()),
        })


_VMAGIC = b"FVID"


def fake_video_encode(frames: np.ndarray) -> bytes:
    """Encode an (n, h, w, 3) uint8 frame stack (fake container: the
    real pipeline would hold mp4/webm bytes; no video lib ships here)."""
    if frames.dtype != np.uint8 or frames.ndim != 4 or frames.shape[3] != 3:
        raise ValueError("frames must be (n, h, w, 3) uint8")
    n, h, w = frames.shape[:3]
    header = _VMAGIC + struct.pack("<III", n, w, h)
    return header + zlib.compress(frames.tobytes(), level=1)


def fake_video_decode(data: bytes) -> np.ndarray:
    if data[:4] != _VMAGIC:
        raise ValueError("not a fake-codec video")
    n, w, h = struct.unpack("<III", data[4:16])
    frames = np.frombuffer(zlib.decompress(data[16:]), dtype=np.uint8)
    return frames.reshape(n, h, w, 3)


class FrameSample:
    """Actor-pool stage: video bytes → k evenly-spaced sampled frames
    (each re-encoded as a png still) + per-frame phash.

    Real decode is STUBBED behind the fake container (no video library
    in this container — swap ``fake_video_decode`` for pyav/ffmpeg on a
    real cluster); the Ray-side plumbing — binary column in, exploded
    frame rows out, actor signature, bounded batch sizes — is real.
    """

    def __init__(self, k: int = 3):
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        video_ids, frame_idx, stills, phashes, ok = [], [], [], [], []
        for vid, blob in zip(batch.column("video_id").to_pylist(),
                             batch.column("bytes").to_pylist()):
            try:
                frames = fake_video_decode(blob)
                n = frames.shape[0]
                picks = [min(int(i * n / self.k), n - 1)
                         for i in range(min(self.k, n))]
                for i in dict.fromkeys(picks):  # unique, order-preserving
                    video_ids.append(vid)
                    frame_idx.append(i)
                    stills.append(fake_encode(frames[i], "png"))
                    phashes.append(perceptual_hash(frames[i]))
                    ok.append(True)
            except Exception:
                video_ids.append(vid)
                frame_idx.append(-1)
                stills.append(b"")
                phashes.append(0)
                ok.append(False)
        return pa.table({
            "video_id": pa.array(video_ids, pa.string()),
            "frame_idx": pa.array(frame_idx, pa.int32()),
            "still": pa.array(stills, pa.binary()),
            "phash": pa.array(phashes, pa.int64()),
            "decode_ok": pa.array(ok, pa.bool_()),
        })


def phash_band_batch(batch: pa.Table, n_bands: int = 4) -> pa.Table:
    """(image_id, phash) → (band_id, band_key, image_id, phash) rows for
    the near-dup groupby: 4×16-bit bands of the 64-bit hash — images
    within Hamming distance 3 share at least one band (SURVEY §2.6 A6).
    The full ``phash`` rides along so the Hamming verify happens inside
    the band group with no driver-side lookup."""
    n = batch.num_rows
    hashes = np.asarray(batch.column("phash").combine_chunks(),
                        dtype=np.int64).astype(np.uint64)
    bits = 64 // n_bands
    mask = np.uint64((1 << bits) - 1)
    parts = []
    for band in range(n_bands):
        keys = (hashes >> np.uint64(band * bits)) & mask
        parts.append(pa.table({
            "band_id": pa.array(np.full(n, band, dtype=np.int32)),
            "band_key": pa.array(keys.astype(np.int64)),
            "image_id": batch.column("image_id"),
            "phash": batch.column("phash"),
        }))
    return pa.concat_tables(parts)


_SENTINEL = object()


def phash_near_dup_pairs(ds, hamming_threshold: int = 6,
                         bucket_cap=_SENTINEL):
    """Image near-dup: band bucket groupby → candidate pairs verified by
    true Hamming distance IN the band group (``phash`` rides the band
    rows — no driver-side id→hash state); cross-band dedup of the
    already-filtered pair set is O(result).  ``bucket_cap`` (default
    dedup.DEFAULT_BUCKET_CAP; pass ``None`` for uncapped, same contract
    as the dedup operators) bounds degenerate buckets with the dropped
    volume logged via CapStats."""
    import pandas as pd

    from .dedup import (
        DEFAULT_BUCKET_CAP,
        hamming64_arr,
        new_cap_stats,
        report_caps,
    )

    if bucket_cap is _SENTINEL:
        bucket_cap = DEFAULT_BUCKET_CAP
    stats = new_cap_stats() if bucket_cap is not None else None

    def pairs_group(df):
        df = (df.drop_duplicates(subset=["image_id"])
              .sort_values("image_id", kind="mergesort"))
        n = len(df)
        if n < 2:
            return pd.DataFrame({"a": pd.Series(dtype=str),
                                 "b": pd.Series(dtype=str),
                                 "hamming": pd.Series(dtype="int64")})
        if bucket_cap is not None and n > bucket_cap:
            import ray
            ray.get(stats.add.remote(n * (n - 1) // 2
                                     - bucket_cap * (bucket_cap - 1) // 2))
            df = df.head(bucket_cap)
            n = bucket_cap
        ids = df["image_id"].to_numpy()
        hashes = df["phash"].to_numpy(dtype=np.int64)
        ii, jj = np.triu_indices(n, 1)
        ham = hamming64_arr(hashes[ii], hashes[jj])
        keep = ham <= hamming_threshold
        return pd.DataFrame({"a": ids[ii][keep], "b": ids[jj][keep],
                             "hamming": ham[keep]})

    bands = ds.select_columns(["image_id", "phash"]).map_batches(
        phash_band_batch, batch_format="pyarrow")
    pairs = bands.groupby(["band_id", "band_key"]).map_groups(
        pairs_group, batch_format="pandas").to_pandas()
    if stats is not None:
        report_caps(stats, "phash_near_dup_pairs")
    if pairs.empty:
        # explicit dtypes (image ids are strings): bare [] would infer
        # float64 and break downstream schema unions on empty corpora
        return pd.DataFrame({"a": pd.Series(dtype=str),
                             "b": pd.Series(dtype=str),
                             "hamming": pd.Series(dtype="int64")})
    return (pairs.drop_duplicates(subset=["a", "b"])
            .sort_values(["a", "b"]).reset_index(drop=True))


class DecodeValidate:
    """Actor-pool stage: decode image bytes and validate the per-row
    invariants vs the reference decode (PSNR ≥ 40 dB lossy / exact png,
    caption equality when an ``alt`` column is present).

    Use as ``ds.map_batches(DecodeValidate, batch_format="pyarrow",
    batch_size=cfg.image_batch_size, concurrency=N)``.
    """

    def __init__(self, psnr_gate: float = 40.0, seed: int = 42, ref_fn=None):
        self.psnr_gate = psnr_gate
        self.seed = seed
        # reference decode: callable(image_id, w, h) -> (h, w, 3) uint8.
        # Defaults to the plain synthetic generator; the synthetic corpus
        # passes one that also reproduces near-duplicate derivations.
        self.ref_fn = ref_fn or (
            lambda image_id, w, h: synth_pixels(image_id, w, h, self.seed))

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("image_id").to_pylist()
        blobs = batch.column("bytes").to_pylist()
        fmts = batch.column("fmt").to_pylist()
        ws = batch.column("w").to_pylist()
        hs = batch.column("h").to_pylist()
        alts = (batch.column("alt").to_pylist()
                if "alt" in batch.column_names else [None] * len(ids))
        captions = (batch.column("caption").to_pylist()
                    if "caption" in batch.column_names else [None] * len(ids))

        psnrs, pix_ok, cap_ok, phashes = [], [], [], []
        for image_id, blob, fmt, w, h, alt, caption in zip(
                ids, blobs, fmts, ws, hs, alts, captions):
            try:
                decoded, _ = fake_decode(blob)
                reference = self.ref_fn(image_id, w, h)
                value = psnr(reference, decoded)
                ok = value == float("inf") if fmt == "png" else value >= self.psnr_gate
                psnrs.append(min(value, 99.0))
                pix_ok.append(bool(ok))
                phashes.append(perceptual_hash(decoded))
            except Exception:
                psnrs.append(0.0)
                pix_ok.append(False)
                phashes.append(0)
            cap_ok.append(None if alt is None or caption is None
                          else alt == caption)

        out = {
            "image_id": batch.column("image_id"),
            "fmt": batch.column("fmt"),
            "psnr_db": pa.array(psnrs, pa.float64()),
            "pixels_ok": pa.array(pix_ok, pa.bool_()),
            "caption_ok": pa.array(cap_ok, pa.bool_()),
            "phash_decoded": pa.array(phashes, pa.int64()),
        }
        for passthrough in ("phash", "page_url"):
            if passthrough in batch.column_names:
                out[passthrough] = batch.column(passthrough)
        return pa.table(out)


def keep_best_resolution(ds, group_col: str = "phash",
                         id_col: str = "image_id", n_buckets: int = 32):
    """Image-dedup retention policy: within each duplicate group
    (exact-phash cluster by default, or a CC cluster label from the
    near-dup path) keep the single highest-resolution copy — max
    (w*h), ties to the smallest id.  The document-side twin is
    ``dedup.dedup_keep_best`` (quality score); images rank by pixel
    count instead.

    Combiner-first: each batch is reduced to its per-group best row
    BEFORE the one bucketed shuffle, so at most one row per (group,
    batch) moves — never the corpus.  Returns (group, id, w, h)."""
    import pandas as pd

    def best(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(_px=df["w"].to_numpy(np.int64)
                       * df["h"].to_numpy(np.int64))
        df = df.sort_values([group_col, "_px", id_col],
                            ascending=[True, False, True],
                            kind="mergesort")
        win = df.drop_duplicates(group_col, keep="first")
        return pd.DataFrame({
            group_col: win[group_col].to_numpy(),
            id_col: win[id_col].to_numpy(),
            "w": win["w"].to_numpy(np.int64),
            "h": win["h"].to_numpy(np.int64),
        })

    from markdown_lab_ray.stages.bucketing import key_buckets

    combined = ds.map_batches(best, batch_format="pandas")
    tagged = combined.map_batches(
        tag_buckets_batch, batch_format="pyarrow",
        fn_kwargs=dict(key_col=group_col, n_buckets=n_buckets))
    return (tagged.groupby("_b")
            .map_groups(lambda g: best(g.drop(columns=["_b"])),
                        batch_format="pandas"))


def image_dedup_keep_best(images_ds, hamming_threshold: int = 6,
                          n_buckets: int = 32):
    """End-to-end image near-dup dedup — the graft payload's flagship
    composition: phash band LSH → in-band Hamming-verified pairs →
    distributed connected components (large-star/small-star) → keep the
    single highest-resolution copy per duplicate cluster.

    Returns a Dataset of survivors (cluster, image_id, w, h): one row
    per cluster, singletons included (an image with no near-dups is its
    own cluster and survives).  Every stage is the already-bounded
    operator: pairs are O(result) via capped band buckets, CC shuffles
    edge rows only, the final arg-max is the combiner-first
    ``keep_best_resolution``."""
    import ray.data as rd

    from .dedup import connected_components_distributed
    from .joins import bucketed_left_lookup_join

    pairs = phash_near_dup_pairs(images_ds,
                                 hamming_threshold=hamming_threshold)
    # Arrow-typed edge table (a pandas-block dataset would hand the CC
    # python-class dtypes instead of pa.DataType)
    edges = rd.from_arrow(pa.table({
        "u": pa.array(pairs["a"].tolist(), pa.string()),
        "v": pa.array(pairs["b"].tolist(), pa.string()),
    }))
    ids = images_ds.select_columns(["image_id"]).map_batches(
        lambda b: pa.table({"node": b.column("image_id")}),
        batch_format="pyarrow")
    labels = connected_components_distributed(edges, ids_ds=ids)
    labels = labels.map_batches(
        lambda b: pa.table({"image_id": b.column("node"),
                            "cluster": b.column("label")}),
        batch_format="pyarrow")
    dims = images_ds.select_columns(["image_id", "w", "h"])
    labeled = bucketed_left_lookup_join(dims, labels, "image_id",
                                        n_buckets=n_buckets)

    def conform(batch: pa.Table) -> pa.Table:
        # every id is in the CC output (ids_ds covers singletons), so
        # found is always true; drop it and order the columns
        return pa.table({
            "cluster": batch.column("cluster"),
            "image_id": batch.column("image_id"),
            "w": batch.column("w").cast(pa.int64()),
            "h": batch.column("h").cast(pa.int64()),
        })

    labeled = labeled.map_batches(conform, batch_format="pyarrow")
    return keep_best_resolution(labeled, group_col="cluster",
                                id_col="image_id", n_buckets=n_buckets)


def channel_stats(images_ds, bytes_col: str = "bytes",
                  mean_col_prefix: str = "mean",
                  std_col_prefix: str = "std"):
    """Dataset-wide per-channel pixel mean/std — the normalization
    constants every vision training run burns a full pass to compute.

    Scale shape: decode happens where the bytes already are (one
    ``map_batches`` pass, no shuffle); each block collapses to EXACT
    integer moments (n, Σv, Σv² per channel — uint8 squares fit int64
    at any realistic pixel count) and only those 7-number partials
    cross the wire into a single-task finish.  Because the partials
    are exact integers, the result is bit-identical regardless of
    block layout — tested against a single-process twin.  With a real
    codec this pass becomes an actor-pool stage like
    ``DecodeValidate`` (decoder state in ``__init__``); the fake codec
    needs no state.  Output: one row (n_pixels, mean_r/g/b micro,
    std_r/g/b micro).
    """

    def partial(batch: pa.Table) -> pa.Table:
        n = 0
        s = np.zeros(3, dtype=np.int64)
        ss = np.zeros(3, dtype=np.int64)
        for data in batch.column(bytes_col).to_pylist():
            px, _ = fake_decode(data)
            flat = px.reshape(-1, 3).astype(np.int64)
            n += flat.shape[0]
            s += flat.sum(axis=0)
            ss += (flat * flat).sum(axis=0)
        return pa.table({
            "_n": pa.array([n], pa.int64()),
            "_s0": pa.array([s[0]], pa.int64()),
            "_s1": pa.array([s[1]], pa.int64()),
            "_s2": pa.array([s[2]], pa.int64()),
            "_q0": pa.array([ss[0]], pa.int64()),
            "_q1": pa.array([ss[1]], pa.int64()),
            "_q2": pa.array([ss[2]], pa.int64()),
        })

    def finish(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        n = int(df["_n"].sum())
        cols = {"n_pixels": pa.array([n], pa.int64())}
        for i, ch in enumerate(("r", "g", "b")):
            s = int(df[f"_s{i}"].sum())
            q = int(df[f"_q{i}"].sum())
            mean = s / n
            var = q / n - mean * mean
            cols[f"{mean_col_prefix}_{ch}_micro"] = pa.array(
                [int(np.floor(mean * 1e6 + 0.5))], pa.int64())
            cols[f"{std_col_prefix}_{ch}_micro"] = pa.array(
                [int(np.floor(np.sqrt(max(var, 0.0)) * 1e6 + 0.5))],
                pa.int64())
        return pa.table(cols)

    part = images_ds.map_batches(partial, batch_format="pyarrow")
    return part.repartition(1).map_batches(finish, batch_format="pyarrow")


_CAPTION_FILENAME_RE = re.compile(
    r"^(?:img|image|dsc|photo|pic|screenshot)[-_ ]?\d+$"
    r"|\.(?:jpe?g|png|gif|webp|bmp)$", re.IGNORECASE)


def screen_captions(ds, caption_col: str = "caption",
                    id_col: str = "image_id", min_words: int = 6):
    """Caption quality screen for image-text training pairs — the
    LAION-style junk filters: camera-filename alt text ("IMG_1234",
    "photo.jpg"), empty strings, digit soup, and too-short captions
    that carry no supervision signal.  First matching reason wins:
    ``empty`` → ``filename`` → ``numeric`` (digit ratio > 0.5) →
    ``too_short`` (< min_words words) → ``ok``.

    Pure vectorized per-batch predicates on the caption column only
    (compiled module-level regex, no shuffle, no state) — prune
    ``columns=[id, caption]`` at the read and the image BYTES never
    move.  Output: (id, reason, keep bool) per pair; aggregate with
    ``screen_caption_counts`` for the per-reason panel.
    """
    import pandas as pd

    def screen(df: "pd.DataFrame") -> "pd.DataFrame":
        cap = df[caption_col].fillna("").astype(str)
        stripped = cap.str.strip()
        empty = stripped == ""
        filename = stripped.str.contains(_CAPTION_FILENAME_RE)
        n_chars = stripped.str.len().to_numpy()
        n_digits = stripped.str.count(r"\d").to_numpy()
        numeric = (n_digits > 0.5 * np.maximum(n_chars, 1)) & ~empty
        short = stripped.str.split().str.len().fillna(0).to_numpy() \
            < min_words
        reason = np.select(
            [empty, filename.to_numpy() & ~empty,
             numeric, short],
            ["empty", "filename", "numeric", "too_short"],
            default="ok")
        return pd.DataFrame({id_col: df[id_col],
                             "reason": reason,
                             "keep": reason == "ok"})

    return ds.map_batches(screen, batch_format="pandas")


def screen_caption_counts(ds, caption_col: str = "caption",
                          id_col: str = "image_id",
                          min_words: int = 6):
    """Per-reason counts of the caption screen (bounded-cardinality
    native groupby — at most 5 reasons)."""
    from ray.data.aggregate import Count

    return (screen_captions(ds, caption_col, id_col, min_words)
            .groupby("reason").aggregate(Count(alias_name="n")))


def dhash64(pixels: np.ndarray) -> int:
    """64-bit difference hash: grayscale → 8×9 block-mean grid → each
    bit is right-neighbor > left (gradient direction), the classic
    dHash.  Complements the mean-pool aHash (``perceptual_hash``):
    robust to global brightness shifts that flip aHash bits.  Signed
    int64, same convention as the table's ``phash`` column."""
    gray = pixels.astype(np.float64).mean(axis=2)
    h, w = gray.shape
    ys = (np.arange(9) * h) // 8
    xs = (np.arange(10) * w) // 9
    blocks = np.empty((8, 9))
    for i in range(8):
        for j in range(9):
            blocks[i, j] = gray[ys[i]:max(ys[i + 1], ys[i] + 1),
                                xs[j]:max(xs[j + 1], xs[j] + 1)].mean()
    bits = (blocks[:, 1:] > blocks[:, :-1]).flatten()
    value = 0
    for bit in bits:
        value = (value << 1) | int(bit)
    return value - (1 << 64) if value >= (1 << 63) else value


def _milli(x: float) -> int:
    return int(np.floor(x * 1000.0 + 0.5))


def image_quality_row(pixels: np.ndarray) -> dict:
    """Pure per-image quality kernel (shared by the actor stage and the
    single-process test twin).  All stats in exact int64 milli-units:
    brightness (gray mean), contrast (gray population std), sharpness
    (mean |forward gradient|), entropy (256-bin gray histogram, in
    milli-nats)."""
    gray = pixels.astype(np.float64).mean(axis=2)
    brightness = float(gray.mean())
    contrast = float(gray.std())
    gx = np.abs(np.diff(gray, axis=1))
    gy = np.abs(np.diff(gray, axis=0))
    sharpness = float((gx.sum() + gy.sum()) / max(gx.size + gy.size, 1))
    hist, _ = np.histogram(gray.astype(np.uint8), bins=256, range=(0, 256))
    p = hist[hist > 0] / gray.size
    entropy = float(-(p * np.log(p)).sum())
    return {"brightness_milli": _milli(brightness),
            "contrast_milli": _milli(contrast),
            "sharpness_milli": _milli(sharpness),
            "entropy_milli": _milli(entropy)}


class ImageQuality:
    """Actor-pool stage: decode → per-image quality signals + gate.

    The pre-training screen a vision corpus runs before captioning or
    CLIP scoring: too-dark / too-flat / blurred images are dropped, and
    declared-vs-decoded dimension mismatches are flagged (corrupt or
    mislabeled rows).  Decode happens ONCE per row here; thresholds are
    constructor state (per-actor, not per-batch).  Output columns:
    (image_id, fmt, *_milli int64, dims_ok bool, quality_ok bool).
    """

    def __init__(self, min_brightness: float = 30.0,
                 max_brightness: float = 225.0,
                 min_contrast: float = 10.0,
                 min_sharpness: float = 2.0):
        self.min_b = min_brightness
        self.max_b = max_brightness
        self.min_c = min_contrast
        self.min_s = min_sharpness

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("image_id").to_pylist()
        blobs = batch.column("bytes").to_pylist()
        fmts = batch.column("fmt").to_pylist()
        ws = batch.column("w").to_pylist()
        hs = batch.column("h").to_pylist()
        rows = {"brightness_milli": [], "contrast_milli": [],
                "sharpness_milli": [], "entropy_milli": []}
        dims_ok, quality_ok = [], []
        for blob, w, h in zip(blobs, ws, hs):
            try:
                pixels, _ = fake_decode(blob)
                stats = image_quality_row(pixels)
                d_ok = pixels.shape[1] == w and pixels.shape[0] == h
            except Exception:
                stats = {k: 0 for k in rows}
                d_ok = False
            for k in rows:
                rows[k].append(stats[k])
            dims_ok.append(d_ok)
            quality_ok.append(
                d_ok
                and self.min_b * 1000 <= stats["brightness_milli"]
                <= self.max_b * 1000
                and stats["contrast_milli"] >= self.min_c * 1000
                and stats["sharpness_milli"] >= self.min_s * 1000)
        return pa.table({
            "image_id": pa.array(ids, pa.string()),
            "fmt": pa.array(fmts, pa.string()),
            **{k: pa.array(v, pa.int64()) for k, v in rows.items()},
            "dims_ok": pa.array(dims_ok, pa.bool_()),
            "quality_ok": pa.array(quality_ok, pa.bool_())})


class ThumbnailPyramid:
    """Actor-pool explode stage: decode once, emit a halving thumbnail
    pyramid per image (level 1 = half size, …) until the next level's
    min side would drop below ``min_side`` — the multi-resolution
    serving layout an image CDN or a multi-scale trainer precomputes.
    Each level is re-encoded with the row's own format; bytes stay
    inside the task (the explode multiplies rows ≤ log₂(size) times,
    never the original payload).  Output:
    (image_id, level, w, h, n_bytes int64).
    """

    def __init__(self, min_side: int = 32):
        self.min_side = min_side

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_id, out_lv, out_w, out_h, out_nb = [], [], [], [], []
        for image_id, blob, fmt in zip(batch.column("image_id").to_pylist(),
                                       batch.column("bytes").to_pylist(),
                                       batch.column("fmt").to_pylist()):
            try:
                pixels, _ = fake_decode(blob)
            except Exception:
                continue
            level = 0
            h, w = pixels.shape[:2]
            while min(w // 2, h // 2) >= self.min_side:
                w, h = w // 2, h // 2
                level += 1
                thumb = resize_pixels(pixels, w, h)
                data = fake_encode(thumb, fmt)
                out_id.append(image_id)
                out_lv.append(level)
                out_w.append(w)
                out_h.append(h)
                out_nb.append(len(data))
        return pa.table({"image_id": pa.array(out_id, pa.string()),
                         "level": pa.array(out_lv, pa.int64()),
                         "w": pa.array(out_w, pa.int64()),
                         "h": pa.array(out_h, pa.int64()),
                         "n_bytes": pa.array(out_nb, pa.int64())})


def pyramid_accounting(ds, min_side: int = 32, batch_size: int = 64,
                       concurrency=(1, 2)):
    """Per-level pyramid accounting: (level, n_images, total_bytes) —
    the storage-planning readout for the thumbnail tier."""
    from ray.data.aggregate import Count, Sum

    levels = ds.map_batches(ThumbnailPyramid,
                            fn_constructor_kwargs={"min_side": min_side},
                            batch_format="pyarrow", batch_size=batch_size,
                            concurrency=concurrency)
    return (levels.groupby("level")
            .aggregate(Count(alias_name="n_images"),
                       Sum("n_bytes", alias_name="total_bytes")))


class _DHash:
    """Actor stage: decode → dhash64 per image (id, dhash)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, hashes = [], []
        for image_id, blob in zip(batch.column("image_id").to_pylist(),
                                  batch.column("bytes").to_pylist()):
            try:
                pixels, _ = fake_decode(blob)
            except Exception:
                continue
            ids.append(image_id)
            hashes.append(dhash64(pixels))
        return pa.table({"image_id": pa.array(ids, pa.string()),
                         "phash": pa.array(hashes, pa.int64())})


def hash_agreement(ds, hamming_threshold: int = 6, batch_size: int = 64,
                   concurrency=(1, 2)):
    """Cross-hash near-dup agreement audit: the pair sets found by the
    table's aHash (``phash`` column) vs a fresh dHash pass, both through
    the same banded LSH + in-band Hamming verify.  Agreement quantifies
    how much the dedup decision depends on the hash choice — low overlap
    means borderline pairs, worth a pixel-level second stage.  Output
    one row: (n_ahash, n_dhash, n_both, jaccard_micro int64).
    """
    def _df(x):
        return x.to_pandas() if hasattr(x, "to_pandas") else x

    a_pairs = _df(phash_near_dup_pairs(
        ds.select_columns(["image_id", "phash"]),
        hamming_threshold=hamming_threshold))
    d_ds = ds.map_batches(_DHash, batch_format="pyarrow",
                          batch_size=batch_size, concurrency=concurrency)
    d_pairs = _df(phash_near_dup_pairs(
        d_ds, hamming_threshold=hamming_threshold))
    a_set = set(zip(a_pairs["a"], a_pairs["b"]))
    d_set = set(zip(d_pairs["a"], d_pairs["b"]))
    both = len(a_set & d_set)
    union = len(a_set | d_set)
    import pandas as pd
    return pd.DataFrame({
        "n_ahash": pd.array([len(a_set)], dtype="int64"),
        "n_dhash": pd.array([len(d_set)], dtype="int64"),
        "n_both": pd.array([both], dtype="int64"),
        "jaccard_micro": pd.array(
            [0 if union == 0 else (both * 1_000_000) // union],
            dtype="int64")})


def patch_stats(ds, patch: int = 16):
    """Vision-token cost accounting WITHOUT decoding: per format, the
    ViT patch counts implied by the declared dimensions — patches =
    ⌈w/p⌉·⌈h/p⌉ — so a training-cost estimate runs over table metadata
    only (zero bytes move).  Output per fmt:
    (fmt, n_images, total_patches, max_patches).
    """
    from ray.data.aggregate import Count, Max, Sum

    def add_patches(batch: pa.Table) -> pa.Table:
        w = batch.column("w").to_numpy(zero_copy_only=False).astype(np.int64)
        h = batch.column("h").to_numpy(zero_copy_only=False).astype(np.int64)
        patches = -(-w // patch) * -(-h // patch)
        return pa.table({"fmt": batch.column("fmt"),
                         "patches": pa.array(patches)})

    return (ds.map_batches(add_patches, batch_format="pyarrow")
            .groupby("fmt")
            .aggregate(Count(alias_name="n_images"),
                       Sum("patches", alias_name="total_patches"),
                       Max("patches", alias_name="max_patches")))


def border_stats_row(pixels: np.ndarray, tol: int = 8) -> dict:
    """Pure letterbox/pillarbox kernel (shared by the actor stage and
    the test twin): peel uniform border rows/cols — a line is "border"
    when every pixel is within ``tol`` of the image's corner color —
    and report the content crop box plus the border area fraction in
    basis points.  All int64, deterministic."""
    h, w = pixels.shape[:2]
    corner = pixels[0, 0].astype(np.int16)
    flat = np.abs(pixels.astype(np.int16) - corner).max(axis=2) <= tol
    top = 0
    while top < h and flat[top].all():
        top += 1
    if top == h:  # whole image is one flat color
        return {"crop_top": 0, "crop_left": 0, "crop_h": 0, "crop_w": 0,
                "border_bp": 10_000}
    bottom = h
    while bottom > top and flat[bottom - 1].all():
        bottom -= 1
    left = 0
    while left < w and flat[top:bottom, left].all():
        left += 1
    right = w
    while right > left and flat[top:bottom, right - 1].all():
        right -= 1
    content = (bottom - top) * (right - left)
    return {"crop_top": top, "crop_left": left,
            "crop_h": bottom - top, "crop_w": right - left,
            "border_bp": int(round((1 - content / (h * w)) * 10_000))}


def color_profile_row(pixels: np.ndarray) -> dict:
    """Pure color-profile kernel: distinct 4-bit-quantized colors,
    dominant quantized color's share (basis points), grayscale flag
    (max channel spread ≤ 8 everywhere).  int64/bool, deterministic."""
    q = (pixels >> 4).astype(np.int64)
    codes = (q[..., 0] << 8) | (q[..., 1] << 4) | q[..., 2]
    counts = np.bincount(codes.ravel(), minlength=1)
    nz = counts[counts > 0]
    spread = (pixels.max(axis=2).astype(np.int16)
              - pixels.min(axis=2).astype(np.int16))
    return {"n_colors": int(len(nz)),
            "dominant_bp": int(nz.max() * 10_000 // codes.size),
            "is_grayscale": bool((spread <= 8).all())}


class BorderColorProfile:
    """Actor-pool stage: decode once → letterbox crop box + border
    fraction + color profile per image.  The screen a vision corpus
    runs to drop decorative flat graphics (huge borders / one dominant
    color / tiny palettes) and to crop letterboxed frames before
    patchifying.  ``tol`` is constructor state (per actor)."""

    def __init__(self, tol: int = 8):
        self.tol = tol

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("image_id").to_pylist()
        blobs = batch.column("bytes").to_pylist()
        cols: dict[str, list] = {
            "crop_top": [], "crop_left": [], "crop_h": [], "crop_w": [],
            "border_bp": [], "n_colors": [], "dominant_bp": [],
            "is_grayscale": [], "decode_ok": []}
        for blob in blobs:
            try:
                pixels, _ = fake_decode(blob)
                row = border_stats_row(pixels, self.tol)
                row.update(color_profile_row(pixels))
                ok = True
            except Exception:
                row = {k: 0 for k in cols if k != "decode_ok"}
                row["is_grayscale"] = False
                ok = False
            for k, v in row.items():
                cols[k].append(v)
            cols["decode_ok"].append(ok)
        return pa.table({
            "image_id": pa.array(ids, pa.string()),
            **{k: pa.array(cols[k], pa.int64())
               for k in ("crop_top", "crop_left", "crop_h", "crop_w",
                         "border_bp", "n_colors", "dominant_bp")},
            "is_grayscale": pa.array(cols["is_grayscale"], pa.bool_()),
            "decode_ok": pa.array(cols["decode_ok"], pa.bool_())})

"""Image–caption alignment scoring (CLIP-style dual encoder, stubbed).

A real training-data pipeline filters image+caption pairs by an
alignment score from a dual encoder (CLIP et al.): embed the caption,
embed the image, keep pairs whose cosine similarity clears a threshold.
No ML runtime ships in this container, so the MODEL is a deterministic
stand-in — feature-hashed character trigrams for text, pixel statistics
for images, each pushed through a seeded Gaussian projection — while
the Ray-side plumbing is real and is the deliverable: an actor-pool
``map_batches`` stage whose "model" (the two projection matrices) is
built once per actor in ``__init__``, batched matmul scoring in
``__call__``, zero-copy Arrow in/out.  Swapping the stub for a real
CLIP checkpoint changes ``_text_features`` / ``_image_features`` and
nothing else.

Reference contract: BASELINE.json input_hint (image_id, bytes, caption
columns); the decode path reuses the fake codec from ``stages.images``
(same stub rule as DecodeValidate, images.py).
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa

from .images import color_histogram, fake_decode

_TEXT_BUCKETS = 256
# 24 histogram dims (8 bins × 3 channels) + mean/std per channel
_IMG_FEATS = 24 + 6


def _text_features(caption: str) -> np.ndarray:
    """Feature-hashed character trigrams → signed counts in 256 buckets.

    crc32 picks the bucket; one extra bit picks the sign (standard
    hashing-trick featurizer).  Deterministic across processes — no
    PYTHONHASHSEED dependence.
    """
    vec = np.zeros(_TEXT_BUCKETS, dtype=np.float64)
    text = caption.lower()
    if len(text) < 3:
        text = text.ljust(3)
    for i in range(len(text) - 2):
        h = zlib.crc32(text[i:i + 3].encode("utf-8"))
        sign = 1.0 if (h >> 8) & 1 else -1.0
        vec[h % _TEXT_BUCKETS] += sign
    norm = np.linalg.norm(vec)
    return vec / norm if norm > 0 else vec


def _image_features(pixels: np.ndarray) -> np.ndarray:
    """Pixel-statistics feature vector: per-channel 8-bin histogram +
    per-channel mean and std (scaled to [0, 1])."""
    hist = color_histogram(pixels, bins=8)
    flat = pixels.reshape(-1, 3).astype(np.float64)
    mean = flat.mean(axis=0) / 255.0
    std = flat.std(axis=0) / 255.0
    return np.concatenate([hist, mean, std])


class CaptionAlignScorer:
    """Actor-pool stage: (image_id, bytes, caption) → (image_id,
    align_score).

    ``__init__`` builds the dual-encoder stand-in ONCE per actor (the
    seeded projection matrices — where a real deployment loads the CLIP
    checkpoint); ``__call__`` scores a batch with two matmuls.  Rows
    whose bytes fail to decode score NaN rather than aborting the batch
    (same per-row error tolerance as the fetch tier).
    """

    def __init__(self, dim: int = 64, seed: int = 7):
        rng = np.random.RandomState(seed)
        self.text_proj = rng.normal(size=(_TEXT_BUCKETS, dim)) / np.sqrt(
            _TEXT_BUCKETS)
        self.img_proj = rng.normal(size=(_IMG_FEATS, dim)) / np.sqrt(
            _IMG_FEATS)

    def _score(self, blobs, captions) -> np.ndarray:
        # per-row GEMV + 1-D norms, not one batched GEMM: BLAS GEMM and
        # axis-wise norm accumulation orders depend on the batch shape,
        # so batched math would make scores vary with block layout —
        # per-row ops keep every score bit-identical under any
        # partitioning (the layout-invariance contract the dedup and
        # sketch stages keep).  Decode dominates the cost regardless.
        scores = np.empty(len(blobs))
        for i, (blob, caption) in enumerate(zip(blobs, captions)):
            try:
                pixels, _ = fake_decode(blob)
            except Exception:
                scores[i] = np.nan
                continue
            t = _text_features(caption) @ self.text_proj
            v = _image_features(pixels) @ self.img_proj
            t /= max(np.linalg.norm(t), 1e-12)
            v /= max(np.linalg.norm(v), 1e-12)
            scores[i] = t @ v
        return scores

    def __call__(self, batch: pa.Table) -> pa.Table:
        scores = self._score(batch.column("bytes").to_pylist(),
                             batch.column("caption").to_pylist())
        return pa.table({
            "image_id": batch.column("image_id"),
            "align_score": pa.array(scores, pa.float64()),
        })


def score_caption_alignment(ds, dim: int = 64, seed: int = 7,
                            batch_size: int = 64,
                            concurrency=(1, 4)):
    """Score every (image, caption) pair; returns a Dataset of
    (image_id, align_score), streaming — the corpus bytes never
    leave the actor pool."""
    return ds.map_batches(
        CaptionAlignScorer, batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency,
        fn_constructor_kwargs=dict(dim=dim, seed=seed))


def alignment_filter(ds, threshold: float, dim: int = 64, seed: int = 7,
                     batch_size: int = 64, concurrency=(1, 4)):
    """Keep rows whose alignment score ≥ threshold (NaN → dropped) —
    the pair-quality gate, fused so bytes are decoded exactly once and
    the filter happens inside the same actor (no second pass over the
    binary column)."""

    class _Gate(CaptionAlignScorer):
        def __call__(self, batch: pa.Table) -> pa.Table:
            scores = self._score(batch.column("bytes").to_pylist(),
                                 batch.column("caption").to_pylist())
            keep = np.nan_to_num(scores, nan=-np.inf) >= threshold
            out = batch.filter(pa.array(keep))
            return out.append_column(
                "align_score", pa.array(scores[keep], pa.float64()))

    return ds.map_batches(
        _Gate, batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency,
        fn_constructor_kwargs=dict(dim=dim, seed=seed))

"""Audio payload plumbing: fake codec, feature extraction, clip sampling.

Completes the multimodal trio next to ``stages/images.py`` (images +
video): audio rides the pipeline as an opaque ``binary`` column with
typed metadata (sr, n_samples, fmt), decoded and featurized inside
actor-pool ``map_batches`` stages.

No audio library ships in this container (soundfile/librosa/pydub
absent), so the codec is a clearly-marked deterministic FAKE, the same
contract as the image codec (SURVEY.md §1.4): ``fake_audio_encode`` /
``fake_audio_decode`` round-trip int16 PCM through a small header +
zlib stream; the "lossy" format quantizes samples to 10 bits so
reconstruction error is non-zero but bounded (SNR ≈ 45 dB > a 35 dB
gate; "pcm16" is exact).  The Ray-side plumbing — schema, batch
sizes, actor signature, exploded-clip output layout — is real and
tested; swap ``fake_*`` for soundfile/ffmpeg calls on a real cluster.
"""

from __future__ import annotations

import hashlib
import struct
import zlib

import numpy as np
import pyarrow as pa

_AMAGIC = b"FAUD"
_LOSSY_SHIFT = 6  # keep the top 10 of 16 bits for the fake lossy fmt

AUDIO_FORMATS = ("pcm16", "lossy")


def fake_audio_encode(samples: np.ndarray, sr: int,
                      fmt: str = "pcm16") -> bytes:
    """Encode a 1-D int16 sample array.  Lossy quantizes first."""
    if samples.dtype != np.int16 or samples.ndim != 1:
        raise ValueError("samples must be 1-D int16")
    if fmt not in AUDIO_FORMATS:
        raise ValueError(f"unknown audio format {fmt!r}")
    if fmt != "pcm16":
        samples = ((samples.astype(np.int32) >> _LOSSY_SHIFT)
                   << _LOSSY_SHIFT).astype(np.int16)
    header = (_AMAGIC + fmt.encode().ljust(8, b"\0")
              + struct.pack("<II", sr, len(samples)))
    return header + zlib.compress(samples.tobytes(), level=1)


def fake_audio_decode(data: bytes) -> tuple[np.ndarray, int, str]:
    """Decode bytes from ``fake_audio_encode`` → (int16 array, sr, fmt)."""
    if data[:4] != _AMAGIC:
        raise ValueError("not a fake-codec audio blob")
    fmt = data[4:12].rstrip(b"\0").decode()
    sr, n = struct.unpack("<II", data[12:20])
    samples = np.frombuffer(zlib.decompress(data[20:]), dtype=np.int16)
    if len(samples) != n:
        raise ValueError("truncated audio stream")
    return samples, sr, fmt


def synth_waveform(audio_id: str, n_samples: int, sr: int,
                   seed: int = 42) -> np.ndarray:
    """Deterministic per-id waveform: two sinusoids whose frequencies /
    phases derive from md5(id) plus low white noise — distinct ids get
    distinct features while the signal stays band-limited enough that
    the lossy quantizer's SNR is stable across ids."""
    h = hashlib.md5(f"{seed}:{audio_id}".encode()).digest()
    f1 = 80.0 + (h[0] / 255.0) * 400.0
    f2 = 600.0 + (h[1] / 255.0) * 1200.0
    ph1 = (h[2] / 255.0) * 2 * np.pi
    ph2 = (h[3] / 255.0) * 2 * np.pi
    amp = 0.35 + (h[4] / 255.0) * 0.4
    rng = np.random.RandomState(int.from_bytes(h[4:8], "big"))
    t = np.arange(n_samples, dtype=np.float64) / sr
    wave = (amp * np.sin(2 * np.pi * f1 * t + ph1)
            + 0.25 * np.sin(2 * np.pi * f2 * t + ph2)
            + 0.01 * rng.standard_normal(n_samples))
    return np.clip(wave * 32767.0, -32768, 32767).astype(np.int16)


def snr_db(reference: np.ndarray, decoded: np.ndarray) -> float:
    """Signal-to-noise ratio of ``decoded`` vs ``reference`` (int16)."""
    ref = reference.astype(np.float64)
    err = ref - decoded.astype(np.float64)
    p_sig = float(np.mean(ref ** 2))
    p_err = float(np.mean(err ** 2))
    if p_err == 0.0:
        return float("inf")
    return 10.0 * np.log10(p_sig / p_err) if p_sig > 0 else 0.0


def audio_features(samples: np.ndarray, sr: int) -> dict:
    """Vectorized per-clip features (the language-/quality-filter
    inputs a speech curation pipeline keys on)."""
    x = samples.astype(np.float64) / 32768.0
    n = len(x)
    zc = int(np.count_nonzero(np.signbit(x[1:]) != np.signbit(x[:-1])))
    return {
        "duration_s": n / sr,
        "rms": float(np.sqrt(np.mean(x ** 2))) if n else 0.0,
        "zero_cross_rate": (zc / (n - 1)) if n > 1 else 0.0,
        "clipped_frac": float(np.mean(np.abs(samples.astype(np.int32))
                                      >= 32767)) if n else 0.0,
    }


class AudioFeatures:
    """Actor-pool stage: audio bytes → one feature row per clip.

    Real decode is STUBBED behind the fake codec (no audio library in
    this container — swap ``fake_audio_decode`` for soundfile/ffmpeg
    on a real cluster); schema, error rows and actor signature are the
    real contract.  Per-row failures become ``decode_ok=false`` rows,
    never aborts (the reference's get_many error tolerance, S3).
    """

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, dur, rms, zcr, clip, srs, ok = [], [], [], [], [], [], []
        for aid, blob in zip(batch.column("audio_id").to_pylist(),
                             batch.column("bytes").to_pylist()):
            ids.append(aid)
            try:
                samples, sr, _fmt = fake_audio_decode(blob)
                f = audio_features(samples, sr)
                dur.append(f["duration_s"])
                rms.append(f["rms"])
                zcr.append(f["zero_cross_rate"])
                clip.append(f["clipped_frac"])
                srs.append(sr)
                ok.append(True)
            except Exception:
                dur.append(0.0)
                rms.append(0.0)
                zcr.append(0.0)
                clip.append(0.0)
                srs.append(0)
                ok.append(False)
        return pa.table({
            "audio_id": pa.array(ids, pa.string()),
            "sr": pa.array(srs, pa.int32()),
            "duration_s": pa.array(dur, pa.float64()),
            "rms": pa.array(rms, pa.float64()),
            "zero_cross_rate": pa.array(zcr, pa.float64()),
            "clipped_frac": pa.array(clip, pa.float64()),
            "decode_ok": pa.array(ok, pa.bool_()),
        })


class ClipSample:
    """Actor-pool stage: audio bytes → k evenly-spaced fixed-length
    clips, each re-encoded (pcm16) with its own RMS — the audio twin
    of ``images.FrameSample`` (binary column in, exploded clip rows
    out, bounded clip size so batch × concurrency stays in heap)."""

    def __init__(self, k: int = 3, clip_s: float = 1.0):
        if k <= 0 or clip_s <= 0:
            raise ValueError("k and clip_s must be positive")
        self.k = k
        self.clip_s = clip_s

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, idxs, clips, rmss, ok = [], [], [], [], []
        for aid, blob in zip(batch.column("audio_id").to_pylist(),
                             batch.column("bytes").to_pylist()):
            try:
                samples, sr, _fmt = fake_audio_decode(blob)
                clip_n = max(1, int(round(self.clip_s * sr)))
                n = len(samples)
                starts = [min(int(i * n / self.k), max(0, n - 1))
                          for i in range(min(self.k, max(1, n)))]
                for i, s in enumerate(dict.fromkeys(starts)):
                    piece = samples[s:s + clip_n]
                    ids.append(aid)
                    idxs.append(i)
                    clips.append(fake_audio_encode(piece, sr, "pcm16"))
                    rmss.append(audio_features(piece, sr)["rms"])
                    ok.append(True)
            except Exception:
                ids.append(aid)
                idxs.append(-1)
                clips.append(b"")
                rmss.append(0.0)
                ok.append(False)
        return pa.table({
            "audio_id": pa.array(ids, pa.string()),
            "clip_idx": pa.array(idxs, pa.int32()),
            "clip": pa.array(clips, pa.binary()),
            "rms": pa.array(rmss, pa.float64()),
            "decode_ok": pa.array(ok, pa.bool_()),
        })


def build_audio_rows(n: int = 32, seed: int = 42) -> pa.Table:
    """Deterministic synthetic audio table with the input_hint shape
    transposed to audio: (audio_id, bytes, sr, n_samples, fmt,
    transcript).  Every 7th row is lossy; durations/rates vary so
    feature tests see real spread."""
    ids, blobs, srs, ns, fmts, txts = [], [], [], [], [], []
    for i in range(n):
        aid = f"aud-{i:06d}"
        sr = (8000, 16000, 22050)[i % 3]
        n_samples = int(sr * (0.5 + (i % 5) * 0.25))
        fmt = "lossy" if i % 7 == 3 else "pcm16"
        wave = synth_waveform(aid, n_samples, sr, seed)
        ids.append(aid)
        blobs.append(fake_audio_encode(wave, sr, fmt))
        srs.append(sr)
        ns.append(n_samples)
        fmts.append(fmt)
        txts.append(f"transcript of {aid}")
    return pa.table({
        "audio_id": pa.array(ids, pa.string()),
        "bytes": pa.array(blobs, pa.binary()),
        "sr": pa.array(srs, pa.int32()),
        "n_samples": pa.array(ns, pa.int32()),
        "fmt": pa.array(fmts, pa.string()),
        "transcript": pa.array(txts, pa.string()),
    })

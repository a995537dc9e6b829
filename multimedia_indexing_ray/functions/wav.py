"""Pure-struct/numpy WAV (RIFF PCM) codec + spectrogram featurization —
the REAL audio path behind `stages/multimodal.py` (closing the last
documented media stub; only video remains out of scope, no libav).

The audio analog of the image design: decode to a canonical mono
float32 waveform, then render a deterministic log-magnitude STFT
spectrogram as a grayscale RASTER, so the entire existing image
machinery (bilinear resize, tile-statistics featurizer, dHash
perceptual dedup) applies unchanged.  A metadata (LIST/INFO) chunk
varies the file bytes without touching one sample, so planted
duplicate pairs decode bit-identically — the same cross-encode oracle
trick as the PNM-comment / JPEG-COM / PNG-tEXt variants.

Decode is TOLERANT like the image codecs: a truncated data chunk
yields the decoded prefix plus a warning, unknown chunks are skipped,
trailing garbage warns; a bad RIFF/WAVE signature, non-PCM format, or
unsupported sample width raises ``WavError``.
"""

from __future__ import annotations

import struct
from typing import List, Tuple

import numpy as np


class WavError(ValueError):
    pass


def is_wav(payload: bytes) -> bool:
    return len(payload) >= 12 and payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"


def encode_wav(
    samples: np.ndarray,
    rate: int = 16000,
    extra_chunk: "bytes | None" = None,
) -> bytes:
    """int16 (n,) mono or (n, ch) -> RIFF/WAVE PCM bytes.  ``extra_chunk``
    lands in a LIST/INFO comment chunk — header-only variation (the
    re-encoded-copy planting knob; samples unchanged)."""
    if samples.dtype != np.int16 or samples.ndim not in (1, 2):
        raise ValueError("encode_wav expects int16 (n,) or (n, ch)")
    ch = 1 if samples.ndim == 1 else samples.shape[1]
    data = samples.astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, ch, rate, rate * ch * 2, ch * 2, 16)
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    if extra_chunk is not None:
        body = b"INFOICMT" + struct.pack("<I", len(extra_chunk)) + extra_chunk
        if len(extra_chunk) % 2:
            body += b"\x00"  # RIFF chunks are word-aligned
        chunks += b"LIST" + struct.pack("<I", len(body)) + body
    chunks += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def decode_wav(
    payload: bytes, tolerant: bool = True
) -> Tuple[np.ndarray, int, List[str]]:
    """RIFF/WAVE PCM bytes -> (float32 mono waveform in [-1, 1], sample
    rate, warnings)."""
    warnings: List[str] = []

    def _tolerate(msg: str) -> None:
        if not tolerant:
            raise WavError(msg)
        warnings.append(msg)

    if not is_wav(payload):
        raise WavError("bad_signature")
    declared = struct.unpack("<I", payload[4:8])[0]
    if 8 + declared < len(payload):
        _tolerate("trailing_garbage_after_riff")
    pos, n = 12, min(len(payload), 8 + declared)
    fmt = None
    data = None
    while pos + 8 <= n:
        tag = payload[pos : pos + 4]
        size = struct.unpack("<I", payload[pos + 4 : pos + 8])[0]
        body = payload[pos + 8 : pos + 8 + size]
        if len(body) < size:
            if tag == b"data":
                _tolerate("truncated_data_chunk")
                data = body
            else:
                _tolerate("truncated_chunk")
            pos = n
            break
        if tag == b"fmt ":
            if len(body) < 16:
                raise WavError("truncated_fmt")
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif tag == b"data":
            data = body
        # LIST / fact / unknown chunks are skipped
        pos += 8 + size + (size % 2)  # word alignment
    if fmt is None:
        raise WavError("no_fmt_chunk")
    audio_fmt, ch, rate, _bps, _align, bits = fmt
    if audio_fmt != 1:
        raise WavError("unsupported_non_pcm")
    if bits not in (8, 16):
        raise WavError("unsupported_bit_depth")
    if ch == 0 or rate == 0:
        raise WavError("bad_fmt_fields")
    if data is None:
        raise WavError("no_data_chunk")
    if bits == 16:
        usable = len(data) - len(data) % (2 * ch)
        x = np.frombuffer(data[:usable], dtype="<i2").astype(np.float32) / np.float32(32768.0)
    else:  # 8-bit PCM is unsigned
        usable = len(data) - len(data) % ch
        x = (
            np.frombuffer(data[:usable], dtype=np.uint8).astype(np.float32)
            - np.float32(128.0)
        ) / np.float32(128.0)
    if ch > 1:
        x = x.reshape(-1, ch).mean(axis=1)
    return x.astype(np.float32), int(rate), warnings


def spectrogram_gray(
    samples: np.ndarray, n_fft: int = 256, hop: int = 128
) -> np.ndarray:
    """Deterministic log-magnitude STFT rendered as a grayscale raster
    (frames x frequency bins, float32 in [0, 1]) — the canonical image
    the downstream resize / tile-stats / dHash machinery consumes.
    Hann window, |rfft|, log1p, normalized by the raster max (identical
    samples -> bit-identical raster).  Short clips are zero-padded to
    one frame; silence renders as zeros."""
    x = np.asarray(samples, dtype=np.float32)
    if len(x) < n_fft:
        x = np.pad(x, (0, n_fft - len(x)))
    n_frames = 1 + (len(x) - n_fft) // hop
    idx = np.arange(n_fft)[None, :] + hop * np.arange(n_frames)[:, None]
    win = np.hanning(n_fft).astype(np.float32)
    spec = np.abs(np.fft.rfft(x[idx] * win, axis=1)).astype(np.float32)
    img = np.log1p(spec)
    peak = img.max()
    if peak > 0:
        img = img / peak
    return img.astype(np.float32)

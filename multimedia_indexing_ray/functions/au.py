"""Sun AU (.snd) audio container — the second of javax.sound.sampled's
three container formats (WAV / AU / AIFF), completing the reference's
JVM audio-read surface the way BMP/GIF/WBMP completed ImageIO.

Header: magic ``.snd``, then five big-endian u32s — data offset, data
size (0xFFFFFFFF = unknown), encoding, sample rate, channels.  Bytes
between the 24-byte header and the data offset are a free-form
annotation: the header-only re-encoded-copy planting knob (different
file bytes, untouched samples).

Encodings supported: 1 = G.711 mu-law, 27 = G.711 A-law (both decode
through the same 256-entry LUTs as the WAV codec — the SAME codes in a
WAV or AU container decode to the bit-identical float32 waveform), 2 =
linear PCM8 (signed), 3 = linear PCM16 big-endian (bit-identical to
the WAV PCM16 decode of the same samples).  TOLERANT: truncated data
degrades to the decoded prefix with a warning; bad magic / unknown
encoding / bad header fields raise ``AuError``.
"""

from __future__ import annotations

import struct
from typing import List, Tuple

import numpy as np

from multimedia_indexing_ray.functions.wav import _ALAW_LUT, _MULAW_LUT, _g711_encode

_MAGIC = b".snd"


class AuError(ValueError):
    pass


def is_au(payload: bytes) -> bool:
    return payload[:4] == _MAGIC and len(payload) >= 24


def encode_au(
    samples: np.ndarray,
    rate: int = 16000,
    annotation: "bytes | None" = None,
    codec: str = "pcm16",
) -> bytes:
    """int16 (n,) mono or (n, ch) -> AU bytes.  ``codec``: ``pcm16``
    (encoding 3, big-endian), ``mulaw`` (1) or ``alaw`` (27).
    ``annotation`` bytes sit between header and data (offset points
    past them) — the re-encoded-copy planting knob."""
    if samples.dtype != np.int16 or samples.ndim not in (1, 2):
        raise ValueError("encode_au expects int16 (n,) or (n, ch)")
    ch = 1 if samples.ndim == 1 else samples.shape[1]
    flat = samples.reshape(-1)
    if codec == "pcm16":
        enc, data = 3, flat.astype(">i2").tobytes()
    elif codec == "mulaw":
        enc, data = 1, _g711_encode(flat, _MULAW_LUT).tobytes()
    elif codec == "alaw":
        enc, data = 27, _g711_encode(flat, _ALAW_LUT).tobytes()
    else:
        raise ValueError(f"unknown codec {codec!r}")
    ann = annotation or b""
    header = _MAGIC + struct.pack(
        ">IIIII", 24 + len(ann), len(data), enc, rate, ch
    )
    return header + ann + data


def decode_au(
    payload: bytes, tolerant: bool = True
) -> Tuple[np.ndarray, int, List[str]]:
    """AU bytes -> (float32 mono waveform in [-1, 1], rate, warnings)."""
    warnings: List[str] = []

    def _tolerate(msg: str) -> None:
        if not tolerant:
            raise AuError(msg)
        warnings.append(msg)

    if payload[:4] != _MAGIC:
        raise AuError("bad_magic")
    if len(payload) < 24:
        raise AuError("truncated_header")
    offset, size, enc, rate, ch = struct.unpack(">IIIII", payload[4:24])
    if offset < 24 or offset > len(payload):
        raise AuError("bad_data_offset")
    if ch == 0 or rate == 0:
        raise AuError("bad_header_fields")
    data = payload[offset:]
    if size != 0xFFFFFFFF:
        if len(data) < size:
            _tolerate("truncated_data")
        else:
            if len(data) > size:
                _tolerate("trailing_garbage")
            data = data[:size]
    if enc in (1, 27):  # G.711 mu-law / A-law
        lut = _MULAW_LUT if enc == 1 else _ALAW_LUT
        usable = len(data) - len(data) % ch
        x = lut[np.frombuffer(data[:usable], dtype=np.uint8)].astype(
            np.float32
        ) / np.float32(32768.0)
    elif enc == 2:  # linear PCM8, SIGNED (unlike WAV's unsigned 8-bit)
        usable = len(data) - len(data) % ch
        x = np.frombuffer(data[:usable], dtype=np.int8).astype(
            np.float32
        ) / np.float32(128.0)
    elif enc == 3:  # linear PCM16 big-endian
        usable = len(data) - len(data) % (2 * ch)
        # same /32768 float32 path as the WAV decoder: the SAME samples
        # in a WAV or AU container decode bit-identically
        x = np.frombuffer(data[:usable], dtype=">i2").astype(
            np.float32
        ) / np.float32(32768.0)
    else:
        raise AuError("unsupported_encoding")
    if ch > 1:
        x = x.reshape(-1, ch).mean(axis=1)
    return x.astype(np.float32), int(rate), warnings

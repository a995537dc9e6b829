"""AIFF (Audio IFF) container — the third of javax.sound.sampled's
container formats (WAV / AU / AIFF), completing the reference's JVM
audio-read surface.

AIFF is the big-endian IFF cousin of RIFF: a ``FORM`` chunk of type
``AIFF`` holding a ``COMM`` chunk (channels u16, sample frames u32,
sample size u16, sample rate as an 80-bit IEEE-754 extended float) and
an ``SSND`` chunk (offset u32, block size u32, then big-endian PCM).
An ``ANNO`` annotation chunk varies the file bytes without touching one
sample — the re-encoded-copy planting knob.

Sample sizes 8 (signed) and 16 are supported; PCM16 decodes through the
same ``/32768`` float32 path as the WAV and AU codecs, so the SAME
samples in any of the three containers decode bit-identically (the
cross-container planted-dup contract).  TOLERANT: a truncated SSND
chunk degrades to the decoded prefix with a warning, unknown chunks are
skipped; bad magic / missing COMM / unsupported widths raise
``AiffError``.
"""

from __future__ import annotations

import math
import struct
from typing import List, Tuple

import numpy as np


class AiffError(ValueError):
    pass


def is_aiff(payload: bytes) -> bool:
    return (
        len(payload) >= 12
        and payload[:4] == b"FORM"
        and payload[8:12] == b"AIFF"
    )


def _extended80(rate: float) -> bytes:
    """float -> 80-bit IEEE extended (sign + 15-bit exp + 64-bit mantissa
    with explicit integer bit)."""
    if rate <= 0:
        raise ValueError("rate must be positive")
    mant, exp = math.frexp(rate)  # rate = mant * 2**exp, mant in [0.5, 1)
    e = exp + 16382
    m = int(mant * (1 << 64))
    return struct.pack(">HQ", e, m)


def _parse_extended80(b: bytes) -> float:
    e, m = struct.unpack(">HQ", b)
    sign = -1.0 if e & 0x8000 else 1.0
    e &= 0x7FFF
    if e == 0 and m == 0:
        return 0.0
    return sign * m * 2.0 ** (e - 16383 - 63)


def encode_aiff(
    samples: np.ndarray, rate: int = 16000, annotation: "bytes | None" = None
) -> bytes:
    """int16 (n,) mono or (n, ch) -> AIFF PCM16 bytes.  ``annotation``
    lands in an ANNO chunk — header-only variation."""
    if samples.dtype != np.int16 or samples.ndim not in (1, 2):
        raise ValueError("encode_aiff expects int16 (n,) or (n, ch)")
    ch = 1 if samples.ndim == 1 else samples.shape[1]
    frames = samples.shape[0]
    comm = struct.pack(">HIH", ch, frames, 16) + _extended80(float(rate))
    body = b"COMM" + struct.pack(">I", len(comm)) + comm
    if annotation is not None:
        ann = annotation + (b"\x00" if len(annotation) % 2 else b"")
        body += b"ANNO" + struct.pack(">I", len(annotation)) + ann
    data = struct.pack(">II", 0, 0) + samples.reshape(-1).astype(">i2").tobytes()
    body += b"SSND" + struct.pack(">I", len(data)) + data
    return b"FORM" + struct.pack(">I", 4 + len(body)) + b"AIFF" + body


def decode_aiff(
    payload: bytes, tolerant: bool = True
) -> Tuple[np.ndarray, int, List[str]]:
    """AIFF bytes -> (float32 mono waveform in [-1, 1], rate, warnings)."""
    warnings: List[str] = []

    def _tolerate(msg: str) -> None:
        if not tolerant:
            raise AiffError(msg)
        warnings.append(msg)

    if not is_aiff(payload):
        raise AiffError("bad_magic")
    declared = struct.unpack(">I", payload[4:8])[0]
    if 8 + declared < len(payload):
        _tolerate("trailing_garbage_after_form")
    pos, n = 12, min(len(payload), 8 + declared)
    comm = None
    ssnd = None
    while pos + 8 <= n:
        tag = payload[pos : pos + 4]
        size = struct.unpack(">I", payload[pos + 4 : pos + 8])[0]
        body = payload[pos + 8 : pos + 8 + size]
        if len(body) < size:
            if tag == b"SSND":
                _tolerate("truncated_ssnd_chunk")
                ssnd = body
            else:
                _tolerate("truncated_chunk")
            pos = n
            break
        if tag == b"COMM":
            if len(body) < 18:
                raise AiffError("truncated_comm")
            comm = body
        elif tag == b"SSND":
            ssnd = body
        # ANNO / NAME / unknown chunks are skipped
        pos += 8 + size + (size % 2)  # IFF chunks are word-aligned
    if comm is None:
        raise AiffError("no_comm_chunk")
    ch, _frames, bits = struct.unpack(">HIH", comm[:8])
    rate = _parse_extended80(comm[8:18])
    if ch == 0 or not (0 < rate < 10**7):
        raise AiffError("bad_comm_fields")
    if bits not in (8, 16):
        raise AiffError("unsupported_bit_depth")
    if ssnd is None:
        raise AiffError("no_ssnd_chunk")
    if len(ssnd) < 8:
        _tolerate("truncated_ssnd_chunk")
        ssnd = ssnd + b"\x00" * (8 - len(ssnd))
    off = struct.unpack(">I", ssnd[:4])[0]
    data = ssnd[8 + off :]
    if bits == 16:
        usable = len(data) - len(data) % (2 * ch)
        # same /32768 float32 path as the WAV/AU decoders (the
        # cross-container planted-dup contract)
        x = np.frombuffer(data[:usable], dtype=">i2").astype(
            np.float32
        ) / np.float32(32768.0)
    else:  # AIFF 8-bit is SIGNED
        usable = len(data) - len(data) % ch
        x = np.frombuffer(data[:usable], dtype=np.int8).astype(
            np.float32
        ) / np.float32(128.0)
    if ch > 1:
        x = x.reshape(-1, ch).mean(axis=1)
    return x.astype(np.float32), int(round(rate)), warnings

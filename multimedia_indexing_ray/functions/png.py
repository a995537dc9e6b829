"""Pure-numpy + stdlib-zlib PNG codec — the third REAL image format
(after PNM and baseline JFIF) behind `stages/multimodal.py:MediaDecoder`.

PNG is lossless, which makes it the cross-format duplicate case for
perceptual dedup: the SAME raster saved as PPM and PNG has different
bytes but bit-identical decoded pixels, so planted-pair oracles extend
across formats.

- ``encode_png``: 8-bit grayscale / RGB / RGBA, filter 0 scanlines,
  one zlib IDAT — deterministic bytes for fixtures.
- ``decode_png_gray``: chunk parse with CRC verification, IHDR color
  types 0/2/3/4/6 at bit depth 8, all five scanline filters (sub / up /
  avg / Paeth vectorized per row), BT.601 luma.  TOLERANT like the JPEG
  decoder: bad chunk CRCs, truncated IDAT (partial rows + gray padding),
  missing IEND, and trailing garbage degrade to warnings; structurally
  hopeless inputs (bad signature, 16-bit, interlaced) raise ``PngError``.
"""

from __future__ import annotations

import struct
import zlib
from typing import List, Tuple

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"
_LUMA = np.array([0.299, 0.587, 0.114], dtype=np.float64)


class PngError(ValueError):
    pass


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def encode_png(img: np.ndarray, comment: "bytes | None" = None) -> bytes:
    """uint8 (H, W) gray / (H, W, 3) RGB / (H, W, 4) RGBA -> PNG bytes.
    ``comment`` lands in a tEXt chunk — header-only variation (the
    re-encoded-copy planting knob; decoded pixels are unchanged)."""
    if img.dtype != np.uint8 or img.ndim not in (2, 3):
        raise ValueError("encode_png expects uint8 (H,W[,3|4])")
    h, w = img.shape[:2]
    channels = 1 if img.ndim == 2 else img.shape[2]
    color_type = {1: 0, 3: 2, 4: 6}[channels]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    flat = img.reshape(h, w * channels)
    raw = np.zeros((h, 1 + w * channels), dtype=np.uint8)
    raw[:, 1:] = flat  # filter type 0 per scanline
    out = bytearray(_SIG)
    out += _chunk(b"IHDR", ihdr)
    if comment is not None:
        out += _chunk(b"tEXt", b"Comment\x00" + comment)
    out += _chunk(b"IDAT", zlib.compress(raw.tobytes(), 6))
    out += _chunk(b"IEND", b"")
    return bytes(out)


def _unfilter(raw: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    """raw: (h, 1 + stride) filter-byte-prefixed scanlines -> (h, stride).
    Row filters have a previous-row dependency, so the outer loop is per
    row; within a row sub/avg/Paeth have a per-pixel-group recurrence
    (loop over stride/bpp steps of vectorized column ops)."""
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        ft = int(raw[y, 0])
        row = raw[y, 1:].copy()
        if ft == 0:
            pass
        elif ft == 1:  # sub
            for x in range(bpp, stride):
                row[x] = (int(row[x]) + int(row[x - bpp])) & 0xFF
        elif ft == 2:  # up
            row = (row.astype(np.int32) + prev).astype(np.uint8)
        elif ft == 3:  # average
            for x in range(stride):
                left = int(row[x - bpp]) if x >= bpp else 0
                row[x] = (int(row[x]) + ((left + int(prev[x])) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            for x in range(stride):
                a = int(row[x - bpp]) if x >= bpp else 0
                c = int(prev[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                row[x] = (int(row[x]) + pred) & 0xFF
        else:
            raise PngError(f"bad_filter_type_{ft}")
        out[y] = row
        prev = row
    return out


def decode_png_gray(
    payload: bytes, tolerant: bool = True
) -> Tuple[np.ndarray, List[str]]:
    """PNG bytes -> (float32 grayscale in [0,1], warnings)."""
    warnings: List[str] = []

    def _tolerate(msg: str) -> None:
        if not tolerant:
            raise PngError(msg)
        warnings.append(msg)

    if payload[:8] != _SIG:
        raise PngError("bad_signature")
    pos = 8
    n = len(payload)
    ihdr = None
    palette = None
    idat = bytearray()
    saw_iend = False
    while pos + 8 <= n:
        length = struct.unpack(">I", payload[pos : pos + 4])[0]
        tag = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + length]
        if len(body) < length:
            _tolerate("truncated_chunk")
            idat += body if tag == b"IDAT" else b""
            pos = n
            break
        crc = payload[pos + 8 + length : pos + 12 + length]
        if len(crc) == 4 and struct.unpack(">I", crc)[0] != (
            zlib.crc32(tag + body) & 0xFFFFFFFF
        ):
            _tolerate(f"bad_crc_{tag.decode('latin1')}")
        pos += 12 + length
        if tag == b"IHDR":
            if len(body) != 13:
                # a corrupted length field can shrink the IHDR body —
                # typed error, not a struct.error escape (fuzz-found)
                raise PngError("bad_ihdr_length")
            ihdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"PLTE":
            if len(body) % 3 != 0:
                raise PngError("bad_plte_length")
            palette = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            saw_iend = True
            if pos < n:
                _tolerate("trailing_garbage_after_iend")
            break
        # ancillary chunks (tEXt etc.) are skipped
    if ihdr is None:
        raise PngError("no_ihdr")
    if not saw_iend and pos >= n:
        _tolerate("missing_iend")
    w, h, depth, color_type, _comp, _filt, interlace = ihdr
    # raw-size sanity cap: a corrupted IHDR (one flipped dimension byte)
    # would otherwise demand a multi-GB allocation for the pad/unfilter
    # buffers — a decode-time memory bomb, not a recoverable warning
    if w == 0 or h == 0 or w * h > (1 << 28):
        raise PngError("bad_dimensions")
    if depth != 8:
        raise PngError("unsupported_bit_depth")
    if interlace != 0:
        raise PngError("unsupported_interlace")
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color_type)
    if channels is None:
        raise PngError("bad_color_type")
    if color_type == 3 and palette is None:
        raise PngError("missing_palette")

    stride = w * channels
    want = h * (1 + stride)
    d = zlib.decompressobj()
    try:
        data = d.decompress(bytes(idat), want)
        data += d.flush()
    except zlib.error:
        # salvage whatever decompressed before the corruption
        data = b""
        d = zlib.decompressobj()
        try:
            data = d.decompress(bytes(idat[: max(len(idat) - 1, 0)]), want)
        except zlib.error:
            pass
        _tolerate("corrupt_idat")
    if len(data) < want:
        _tolerate("truncated_idat")
        data = data + b"\x00" * (want - len(data))
    raw = np.frombuffer(data[:want], dtype=np.uint8).reshape(h, 1 + stride)
    # a fabricated (padded) row may carry a junk filter byte: clamp to 0
    bad_ft = raw[:, 0] > 4
    if bad_ft.any():
        _tolerate("bad_filter_bytes_reset")
        raw = raw.copy()
        raw[bad_ft, 0] = 0
    px = _unfilter(raw, h, stride, channels)
    if color_type == 3:
        rgb = palette[np.minimum(px, len(palette) - 1)].astype(np.float64)
        gray = rgb.reshape(h, w, 3) @ _LUMA
    elif channels == 1:
        # float32 division, bit-identical to decode_ppm_gray on the same
        # raster — a grayscale image saved as PGM and PNG decodes to the
        # SAME float32 plane (the cross-format planted-dup contract)
        return px.reshape(h, w).astype(np.float32) / np.float32(255.0), warnings
    elif channels == 2:  # gray + alpha: luma is channel 0
        gray = px.reshape(h, w, 2)[..., 0].astype(np.float64)
    else:  # RGB / RGBA
        gray = px.reshape(h, w, channels)[..., :3].astype(np.float64) @ _LUMA
    return (gray / 255.0).astype(np.float32), warnings


def is_png(payload: bytes) -> bool:
    return payload[:8] == _SIG

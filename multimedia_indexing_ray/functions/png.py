"""Pure-numpy + stdlib-zlib PNG codec — the third REAL image format
(after PNM and baseline JFIF) behind `stages/multimodal.py:MediaDecoder`.

PNG is lossless, which makes it the cross-format duplicate case for
perceptual dedup: the SAME raster saved as PPM and PNG has different
bytes but bit-identical decoded pixels, so planted-pair oracles extend
across formats.

- ``encode_png``: 8/16-bit grayscale / RGB / RGBA, filter 0 scanlines,
  optional Adam7 interlacing, one zlib IDAT — deterministic bytes for
  fixtures.
- ``decode_png_gray``: chunk parse with CRC verification, IHDR color
  types 0/2/3/4/6 at EVERY legal bit depth (1/2/4 gray+palette, 8, 16),
  Adam7 interlaced or not, all five scanline filters (sub / up / avg /
  Paeth vectorized per row), BT.601 luma.  TOLERANT like the JPEG
  decoder: bad chunk CRCs, truncated IDAT (partial rows + gray
  padding), missing IEND, and trailing garbage degrade to warnings;
  structurally hopeless inputs (bad signature, illegal
  depth/color-type combos) raise ``PngError``.
"""

from __future__ import annotations

import struct
import zlib
from typing import List, Tuple

import numpy as np

from multimedia_indexing_ray.functions import MAX_TOLERATED_WARNINGS

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


# Adam7 pass geometry: (x0, y0, dx, dy) per pass
_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def _adam7_passes(w: int, h: int) -> "List[Tuple[int, int, int, int, int, int]]":
    """Non-empty Adam7 passes as (x0, y0, dx, dy, wp, hp)."""
    out = []
    for x0, y0, dx, dy in _ADAM7:
        wp = (w - x0 + dx - 1) // dx if w > x0 else 0
        hp = (h - y0 + dy - 1) // dy if h > y0 else 0
        if wp > 0 and hp > 0:
            out.append((x0, y0, dx, dy, wp, hp))
    return out


def encode_png(
    img: np.ndarray, comment: "bytes | None" = None, interlace: bool = False
) -> bytes:
    """uint8/uint16 (H, W) gray / (H, W, 3) RGB / (H, W, 4) RGBA -> PNG
    bytes (uint16 -> bit depth 16, big-endian samples; ``interlace=True``
    -> Adam7).  ``comment`` lands in a tEXt chunk — header-only variation
    (the re-encoded-copy planting knob; decoded pixels are unchanged)."""
    if img.dtype not in (np.uint8, np.uint16) or img.ndim not in (2, 3):
        raise ValueError("encode_png expects uint8/uint16 (H,W[,3|4])")
    h, w = img.shape[:2]
    channels = 1 if img.ndim == 2 else img.shape[2]
    color_type = {1: 0, 3: 2, 4: 6}[channels]
    depth = 8 if img.dtype == np.uint8 else 16
    ihdr = struct.pack(">IIBBBBB", w, h, depth, color_type, 0, 0, int(interlace))
    px3 = img.reshape(h, w, channels)
    if depth == 16:  # big-endian sample bytes
        px3 = np.ascontiguousarray(px3).astype(">u2").view(np.uint8).reshape(h, w, channels * 2)
    if interlace:
        raw = bytearray()
        for x0, y0, dx, dy, wp, hp in _adam7_passes(w, h):
            sub = px3[y0::dy, x0::dx, :]
            rows = np.zeros((hp, 1 + sub.shape[1] * sub.shape[2]), dtype=np.uint8)
            rows[:, 1:] = sub.reshape(hp, -1)  # filter type 0
            raw += rows.tobytes()
        raw = bytes(raw)
    else:
        rows = np.zeros((h, 1 + px3.shape[1] * px3.shape[2]), dtype=np.uint8)
        rows[:, 1:] = px3.reshape(h, -1)  # filter type 0 per scanline
        raw = rows.tobytes()
    out = bytearray(_SIG)
    out += _chunk(b"IHDR", ihdr)
    if comment is not None:
        out += _chunk(b"tEXt", b"Comment\x00" + comment)
    out += _chunk(b"IDAT", zlib.compress(raw, 6))
    out += _chunk(b"IEND", b"")
    return bytes(out)


# Cumulative CPU budget (in scanline bytes) for the two filters whose
# recurrence is genuinely serial along x (average / Paeth).  Sub is
# vectorized exactly via uint8 accumulate and up is pure numpy, so only
# avg/Paeth rows count.  2^23 bytes ≈ a 2896x2896 gray all-Paeth image
# (~1-2s worst case); beyond it the decode raises a TYPED error instead
# of pinning an actor for minutes on a tiny hostile zlib payload that
# declares huge dimensions (CPU-bomb guard; pure-python container limit).
_SLOW_FILTER_BUDGET = 1 << 23


def _unfilter(
    raw: np.ndarray, h: int, stride: int, bpp: int, slow_start: int = 0
) -> "Tuple[np.ndarray, int]":
    """raw: (h, 1 + stride) filter-byte-prefixed scanlines ->
    ((h, stride), slow_bytes).  Row filters have a previous-row
    dependency, so the outer loop is per row.  Within a row: sub is an
    exact uint8 cumulative sum (mod-256 wrap is native), up is one
    vectorized add, and avg/Paeth run a per-pixel-column loop vectorized
    across the bpp channel offsets — bounded by ``_SLOW_FILTER_BUDGET``
    total bytes.  ``slow_start`` carries the budget across Adam7 passes
    so an interlaced payload cannot buy 7x the CPU."""
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    w_px = stride // bpp
    slow_bytes = slow_start
    for y in range(h):
        ft = int(raw[y, 0])
        row = raw[y, 1:]
        if ft == 0:
            row = row.copy()
        elif ft == 1:  # sub: out[x] = raw[x] + out[x-bpp] == per-channel cumsum
            row = np.add.accumulate(
                row.reshape(w_px, bpp), axis=0, dtype=np.uint8
            ).reshape(stride)
        elif ft == 2:  # up
            row = row + prev  # uint8 wrap-add
        elif ft in (3, 4):  # average / Paeth: genuinely serial along x —
            # plain python-int lists are ~30x faster per element than
            # numpy scalar indexing, so the budget buys real pixels
            slow_bytes += stride
            if slow_bytes > _SLOW_FILTER_BUDGET:
                raise PngError("unfilter_cpu_budget_exceeded")
            rw = row.tolist()
            pv = prev.tolist()
            o = [0] * stride
            if ft == 3:
                for x in range(stride):
                    left = o[x - bpp] if x >= bpp else 0
                    o[x] = (rw[x] + ((left + pv[x]) >> 1)) & 0xFF
            else:
                for x in range(stride):
                    if x >= bpp:
                        a_, c_ = o[x - bpp], pv[x - bpp]
                    else:
                        a_ = c_ = 0
                    b_ = pv[x]
                    p = a_ + b_ - c_
                    pa_, pb_, pc_ = abs(p - a_), abs(p - b_), abs(p - c_)
                    if pa_ <= pb_ and pa_ <= pc_:
                        pred = a_
                    elif pb_ <= pc_:
                        pred = b_
                    else:
                        pred = c_
                    o[x] = (rw[x] + pred) & 0xFF
            row = np.asarray(o, dtype=np.uint8)
        else:
            raise PngError(f"bad_filter_type_{ft}")
        out[y] = row
        prev = row
    return out, slow_bytes


def decode_png_gray(
    payload: bytes, tolerant: bool = True
) -> Tuple[np.ndarray, List[str]]:
    """PNG bytes -> (float32 grayscale in [0,1], warnings)."""
    warnings: List[str] = []

    def _tolerate(msg: str) -> None:
        if not tolerant:
            raise PngError(msg)
        if len(warnings) >= MAX_TOLERATED_WARNINGS:  # amplification guard
            raise PngError("excessive_warnings")
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
    # raw-size sanity caps: a corrupted IHDR (one flipped dimension byte)
    # would otherwise demand a multi-GB allocation for the pad/unfilter
    # buffers — a decode-time memory bomb, not a recoverable warning.
    # Pixel cap 2^24 (16.8MP) AND a byte cap on the filtered buffer
    # (h*(1+stride)) so 4-channel images at the pixel cap can't allocate
    # >1GB across the pad/unfilter copies.
    if w == 0 or h == 0 or w * h > (1 << 24):
        raise PngError("bad_dimensions")
    if depth in (1, 2, 4):
        # sub-byte depths exist only for gray and palette (T.81's PNG
        # counterpart, ISO 15948 table 11.1)
        if color_type not in (0, 3):
            raise PngError("bad_color_type")
    elif depth not in (8, 16):
        raise PngError("unsupported_bit_depth")
    if interlace not in (0, 1):
        raise PngError("unsupported_interlace")
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color_type)
    if channels is None:
        raise PngError("bad_color_type")
    if color_type == 3 and depth == 16:
        raise PngError("bad_color_type")  # palette indices are <= 8 bits
    if depth < 8:
        bpp = 1  # filters operate bytewise; sub filter looks 1 byte back

        def _rstride(wpx: int) -> int:
            return (wpx * depth + 7) // 8

    else:
        bpp = channels * (depth // 8)

        def _rstride(wpx: int) -> int:
            return wpx * bpp

    stride = _rstride(w)
    if h * (1 + stride) > (1 << 26):
        raise PngError("bad_dimensions")
    if color_type == 3 and palette is None:
        raise PngError("missing_palette")

    if interlace:
        passes = _adam7_passes(w, h)
        want = sum(hp * (1 + _rstride(wp)) for _, _, _, _, wp, hp in passes)
    else:
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

    def _clamped(buf: bytes, rows: int, rstride: int) -> np.ndarray:
        raw = np.frombuffer(buf, dtype=np.uint8).reshape(rows, 1 + rstride)
        # a fabricated (padded) row may carry a junk filter byte: clamp to 0
        bad_ft = raw[:, 0] > 4
        if bad_ft.any():
            _tolerate("bad_filter_bytes_reset")
            raw = raw.copy()
            raw[bad_ft, 0] = 0
        return raw

    def _unpack(pxb: np.ndarray, rows: int, wpx: int) -> np.ndarray:
        """Sub-byte rows -> (rows, wpx) uint8 samples (MSB-first packing)."""
        bits = np.unpackbits(pxb, axis=1)
        if depth == 1:
            return bits[:, :wpx]
        vals = bits.reshape(rows, -1, depth)
        weights = 1 << np.arange(depth - 1, -1, -1, dtype=np.uint8)
        return (vals * weights).sum(axis=2).astype(np.uint8)[:, :wpx]

    if interlace:
        if depth < 8:
            samples = np.zeros((h, w), dtype=np.uint8)
        else:
            target = np.zeros((h, w, bpp), dtype=np.uint8)
        off = 0
        slow = 0
        for x0, y0, dx, dy, wp, hp in passes:
            rs = _rstride(wp)
            nb = hp * (1 + rs)
            raw = _clamped(data[off : off + nb], hp, rs)
            pxp, slow = _unfilter(raw, hp, rs, bpp, slow)
            if depth < 8:
                samples[y0::dy, x0::dx] = _unpack(pxp, hp, wp)
            else:
                target[y0::dy, x0::dx, :] = pxp.reshape(hp, wp, bpp)
            off += nb
        if depth >= 8:
            px = target.reshape(h, stride)
    else:
        raw = _clamped(data[:want], h, stride)
        px, _ = _unfilter(raw, h, stride, bpp)
        if depth < 8:
            samples = _unpack(px, h, w)
    if depth < 8:
        if color_type == 3:
            rgb = palette[np.minimum(samples, len(palette) - 1)].astype(np.float64)
            gray = rgb.reshape(h, w, 3) @ _LUMA
            return (gray / 255.0).astype(np.float32), warnings
        scale = np.float32((1 << depth) - 1)
        return samples.astype(np.float32) / scale, warnings
    if depth == 16:
        # big-endian 16-bit samples; same luma path, 1/65535 scale
        u16 = px.view(">u2").reshape(h, w, channels).astype(np.float64)
        if channels in (1, 2):  # gray / gray+alpha: luma is channel 0
            gray = u16[..., 0]
        else:  # RGB / RGBA
            gray = u16[..., :3] @ _LUMA
        return (gray / 65535.0).astype(np.float32), warnings
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

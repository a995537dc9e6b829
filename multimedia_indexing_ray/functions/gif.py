"""Pure-python/numpy GIF codec — the fifth REAL image format behind
`stages/multimodal.py:MediaDecoder`.

GIF completes the reference's ImageIO surface
(`visual/utilities/ImageIOGreyScale.java` reads whatever ImageIO
registers — JPEG, PNG, GIF, BMP, WBMP).  Like PNG/BMP it is lossless
for <=256-color rasters, so a grayscale image saved as PGM/PNG/BMP/GIF
decodes to bit-identical float32 pixels (identity-gray palette) and the
planted-pair dedup oracles extend across all four containers.

- ``encode_gif``: uint8 gray ``(H, W)`` -> GIF89a over an identity
  256-gray global color table, variable-code-width LZW (8-bit min code
  size), optional 4-pass interlacing, optional comment extension (the
  header-only re-encoded-copy planting knob).
- ``decode_gif_gray``: GIF87a/89a header, logical screen descriptor,
  global + local color tables, extension blocks (graphic control /
  comment / application — skipped by sub-block walk), FIRST image
  descriptor (the ``ImageIO.read(index=0)`` analog; animation frame
  sampling is the video path's job), LZW decompression with variable
  code width and table resets, 4-pass de-interlacing, frame placement
  onto the logical screen.  TOLERANT: truncated / corrupt LZW data
  degrades to the pixels decoded so far plus zero padding with a
  warning, a missing trailer warns; structurally hopeless inputs (bad
  magic, no image descriptor, memory-bomb dimensions) raise
  ``GifError``.

The LZW loop is per emitted code (pure-python container limit, like
PNG's serial avg/Paeth filters); emitted pixels are clamped to the
frame size, which the ``_MAX_PIXELS`` cap bounds, so a hostile stream
cannot buy unbounded CPU or memory.
"""

from __future__ import annotations

import struct
from typing import List, Tuple

import numpy as np

_MAX_PIXELS = 1 << 24  # same memory-bomb cap as the PNG/BMP decoders
# float64 BT.601 luma — must stay equal to png.py's _LUMA (cross-format contract)
_LUMA64 = np.array([0.299, 0.587, 0.114], dtype=np.float64)


class GifError(ValueError):
    pass


def is_gif(payload: bytes) -> bool:
    return payload[:6] in (b"GIF87a", b"GIF89a")


# interlace pass schedule: (first row, step)
_INTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))


def _interlace_order(h: int) -> np.ndarray:
    return np.concatenate([np.arange(y0, h, dy) for y0, dy in _INTERLACE if y0 < h])


def _lzw_encode(indices: np.ndarray, min_code_size: int = 8) -> bytes:
    """Palette indices -> GIF LZW bytes (LSB-first bit packing, variable
    code width, table reset at 4096)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    table = {bytes((i,)): i for i in range(clear)}
    next_code = eoi + 1
    width = min_code_size + 1
    out = bytearray()
    acc = acc_bits = 0

    def _emit(code: int) -> None:
        nonlocal acc, acc_bits
        acc |= code << acc_bits
        acc_bits += width
        while acc_bits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            acc_bits -= 8

    _emit(clear)
    seq = b""
    for v in indices.astype(np.uint8).tobytes():
        cand = seq + bytes((v,))
        if cand in table:
            seq = cand
            continue
        _emit(table[seq])
        table[cand] = next_code
        next_code += 1
        if next_code > (1 << width) and width < 12:
            width += 1
        elif next_code >= 4096:
            _emit(clear)
            table = {bytes((i,)): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        seq = bytes((v,))
    if seq:
        _emit(table[seq])
    _emit(eoi)
    if acc_bits:
        out.append(acc & 0xFF)
    return bytes(out)


def encode_gif(
    img: np.ndarray, comment: "bytes | None" = None, interlace: bool = False
) -> bytes:
    """uint8 (H, W) gray -> GIF89a bytes over an identity 256-gray global
    palette.  ``comment`` lands in a comment-extension block (header-only
    variation: decoded pixels unchanged — the re-encoded-copy knob)."""
    if img.dtype != np.uint8 or img.ndim != 2:
        raise ValueError("encode_gif expects uint8 (H, W) gray")
    h, w = img.shape
    out = bytearray(b"GIF89a")
    # logical screen descriptor: global color table, 8 bits, 256 entries
    out += struct.pack("<HHBBB", w, h, 0xF7, 0, 0)
    out += b"".join(bytes((v, v, v)) for v in range(256))
    if comment is not None:
        out += b"\x21\xfe"
        for i in range(0, len(comment), 255):
            sub = comment[i : i + 255]
            out += bytes((len(sub),)) + sub
        out += b"\x00"
    flags = 0x40 if interlace else 0
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, flags)
    rows = img[_interlace_order(h)] if interlace else img
    data = _lzw_encode(rows.reshape(-1))
    out += b"\x08"  # LZW minimum code size
    for i in range(0, len(data), 255):
        sub = data[i : i + 255]
        out += bytes((len(sub),)) + sub
    out += b"\x00\x3b"  # block terminator + trailer
    return bytes(out)


def _lzw_decode(data: bytes, min_code_size: int, max_pixels: int, tolerate):
    """GIF LZW bytes -> uint8 indices (clamped at ``max_pixels``)."""
    # spec range is 2..8; anything larger would write root symbols
    # > 255 into the uint8 suffix table (silent wraparound / overflow)
    if not (2 <= min_code_size <= 8):
        raise GifError("bad_lzw_code_size")
    clear = 1 << min_code_size
    eoi = clear + 1
    # code table as prefix/suffix arrays: entry c decodes to
    # table[prefix[c]] + (suffix[c],) — bounded at 4096 per spec
    prefix = np.full(4096, -1, dtype=np.int32)
    suffix = np.zeros(4096, dtype=np.uint8)
    length = np.zeros(4096, dtype=np.int32)
    for i in range(clear):
        suffix[i] = i
        length[i] = 1
    next_code = eoi + 1
    width = min_code_size + 1
    out = np.empty(max_pixels, dtype=np.uint8)
    n_out = 0
    acc = acc_bits = 0
    prev = -1
    # scratch for one decoded chain: a 4096-entry table bounds any
    # chain at < 4096 symbols (each entry extends its prefix by one)
    buf = bytearray(4096)

    for byte in data:
        acc |= byte << acc_bits
        acc_bits += 8
        while acc_bits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            acc_bits -= width
            if code == clear:
                next_code = eoi + 1
                width = min_code_size + 1
                prev = -1
                continue
            if code == eoi:
                return out[:n_out]
            if code > next_code or (code == next_code and prev < 0):
                # code == next_code is valid only as the KwKwK case
                tolerate("lzw_bad_code")
                return out[:n_out]
            if code == next_code:
                # KwKwK case: chain = prev chain + its first symbol
                ln = length[prev] + 1
                c, p = prev, ln - 2
                first = 0
                while c >= 0:
                    buf[p] = suffix[c]
                    first = suffix[c]
                    c, p = prefix[c], p - 1
                buf[ln - 1] = first
            else:
                ln = length[code]
                c, p = code, ln - 1
                while c >= 0:
                    buf[p] = suffix[c]
                    c, p = prefix[c], p - 1
            take = min(ln, max_pixels - n_out)
            out[n_out : n_out + take] = np.frombuffer(
                buf[:ln], dtype=np.uint8, count=take
            )
            n_out += take
            if n_out >= max_pixels:
                return out
            if prev >= 0 and next_code < 4096:
                prefix[next_code] = prev
                suffix[next_code] = buf[0]
                length[next_code] = length[prev] + 1
                next_code += 1
                if next_code == (1 << width) and width < 12:
                    width += 1
            prev = code
    tolerate("lzw_missing_eoi")
    return out[:n_out]


def decode_gif_gray(
    payload: bytes, tolerant: bool = True
) -> Tuple[np.ndarray, List[str]]:
    """GIF bytes -> (float32 grayscale in [0,1], warnings) — first frame
    placed on the logical screen (`ImageIO.read(0)` semantics)."""
    warnings: List[str] = []

    def _tolerate(msg: str) -> None:
        if not tolerant:
            raise GifError(msg)
        if msg not in warnings:
            warnings.append(msg)

    if not is_gif(payload):
        raise GifError("bad_magic")
    if len(payload) < 13:
        raise GifError("truncated_header")
    sw, sh, flags, _bg, _ar = struct.unpack_from("<HHBBB", payload, 6)
    if sw == 0 or sh == 0 or sw * sh > _MAX_PIXELS:
        raise GifError("bad_dimensions")
    pos = 13
    global_pal = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        raw = payload[pos : pos + n * 3]
        if len(raw) < n * 3:
            raise GifError("truncated_color_table")
        global_pal = np.frombuffer(raw, dtype=np.uint8).reshape(n, 3)
        pos += n * 3

    def _skip_subblocks(p: int) -> int:
        n = len(payload)
        while p < n:
            ln = payload[p]
            p += 1
            if ln == 0:
                return p
            p += ln
        _tolerate("truncated_extension")
        return p

    n = len(payload)
    frame = None
    while pos < n:
        b = payload[pos]
        pos += 1
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension: label + sub-blocks
            if pos >= n:
                _tolerate("truncated_extension")
                break
            pos = _skip_subblocks(pos + 1)
            continue
        if b != 0x2C:
            _tolerate("unknown_block_skipped")
            continue
        # image descriptor
        if pos + 9 > n:
            _tolerate("truncated_image_descriptor")
            break
        left, top, w, h, iflags = struct.unpack_from("<HHHHB", payload, pos)
        pos += 9
        if w == 0 or h == 0 or w * h > _MAX_PIXELS:
            raise GifError("bad_dimensions")
        pal = global_pal
        if iflags & 0x80:
            np_ = 2 << (iflags & 0x07)
            raw = payload[pos : pos + np_ * 3]
            if len(raw) < np_ * 3:
                raise GifError("truncated_color_table")
            pal = np.frombuffer(raw, dtype=np.uint8).reshape(np_, 3)
            pos += np_ * 3
        if pal is None:
            raise GifError("missing_color_table")
        if pos >= n:
            _tolerate("truncated_image_data")
            break
        min_code = payload[pos]
        pos += 1
        chunks = []
        while pos < n:
            ln = payload[pos]
            pos += 1
            if ln == 0:
                break
            chunk = payload[pos : pos + ln]
            if len(chunk) < ln:
                _tolerate("truncated_image_data")
            chunks.append(chunk)
            pos += ln
        else:
            _tolerate("truncated_image_data")
        idx = _lzw_decode(b"".join(chunks), min_code, w * h, _tolerate)
        if len(idx) < w * h:
            _tolerate("truncated_pixels")
            idx = np.concatenate([idx, np.zeros(w * h - len(idx), dtype=np.uint8)])
        img = idx.reshape(h, w)
        if iflags & 0x40:  # de-interlace
            out_rows = np.empty((h, w), dtype=np.uint8)
            out_rows[_interlace_order(h)] = img
            img = out_rows
        frame = (left, top, w, h, pal, img)
        break  # first frame only (ImageIO.read(0) analog)
    else:
        _tolerate("missing_trailer")
    if frame is None:
        raise GifError("no_image_data")
    left, top, w, h, pal, img = frame
    idx = np.minimum(img, len(pal) - 1)
    gray_pal = bool(
        (pal[:, 0] == pal[:, 1]).all() and (pal[:, 1] == pal[:, 2]).all()
    )
    if left == 0 and top == 0 and w == sw and h == sh:
        full_idx = idx
    else:
        # a first frame smaller than the logical screen is SPEC-VALID
        # (common in animations) — no warning; the uncovered screen is
        # rendered as palette index 0 (background-color/GCE handling is
        # out of scope per the module docstring)
        full = np.zeros((sh, sw), dtype=np.uint8)
        full[top : min(top + h, sh), left : min(left + w, sw)] = idx[
            : max(min(top + h, sh) - top, 0), : max(min(left + w, sw) - left, 0)
        ]
        full_idx = full
    if gray_pal:
        # identity/grayscale palette fast path: v/255 in float32 —
        # bit-identical to the PGM / gray-PNG / gray-BMP decode of the
        # same raster (the cross-format planted-dup contract)
        return pal[full_idx, 0].astype(np.float32) / np.float32(255.0), warnings
    rgb = pal[full_idx].astype(np.float64)
    gray = rgb @ _LUMA64
    return (gray / 255.0).astype(np.float32), warnings

"""Pure-numpy BMP (Windows DIB) codec — the fourth REAL image format
behind `stages/multimodal.py:MediaDecoder`.

BMP rounds out the reference's ImageIO surface
(`visual/utilities/ImageIOGreyScale.java` reads whatever ImageIO
registers — JPEG, PNG, GIF, BMP, WBMP); like PNG it is lossless, so the
SAME raster saved as PGM/PNG/BMP decodes to bit-identical float32 pixels
and the planted-pair dedup oracles extend across all three containers.

- ``encode_bmp``: uint8 gray ``(H, W)`` -> 8-bit palette BMP over an
  identity 256-gray palette (optionally RLE8-compressed), uint8 RGB
  ``(H, W, 3)`` -> 24-bit bottom-up BMP.  ``gap`` injects opaque bytes
  between the palette and the pixel array (``bfOffBits`` points past
  them, as real encoders do for ICC profiles) — the header-only
  re-encoded-copy planting knob, since BMP has no comment chunk.
- ``decode_bmp_gray``: BITMAPCOREHEADER (12) and BITMAPINFOHEADER
  (40/52/56/108/124) DIBs; bit depths 1/4/8 (palette, MSB-first
  sub-byte packing), 16 (555 or BI_BITFIELDS masks), 24, 32 (BGRX or
  masked); BI_RLE8 / BI_RLE4 run-length decompression with EOL / EOB /
  delta escapes; bottom-up and top-down rows; 4-byte row padding.
  TOLERANT like the other codecs: truncated pixel data degrades to
  zero-padded rows with a warning, short palettes are index-clamped,
  RLE overruns stop at the raster edge; structurally hopeless inputs
  (bad magic, corrupt header, memory-bomb dimensions) raise
  ``BmpError``.

Grayscale fast paths keep the cross-format dup contract exact:
an 8-bit identity-gray palette decodes via ``v.astype(float32) /
float32(255)`` (bit-identical to the PGM / gray-PNG path) and 24-bit
BGR decodes via the float32 BT.601 matmul ``decode_ppm_gray`` uses for
P6 (bit-identical on the same RGB bytes).
"""

from __future__ import annotations

import struct
from typing import List, Tuple

import numpy as np

_LUMA32 = np.array([0.299, 0.587, 0.114], dtype=np.float32)
# float64 variant must stay equal to png.py's _LUMA — the cross-format
# luma contract (same RGB bytes -> same float32 plane) depends on it
_LUMA64 = np.array([0.299, 0.587, 0.114], dtype=np.float64)

# same memory-bomb caps as the PNG decoder: a corrupted dimension field
# must raise a typed error, not allocate gigabytes
_MAX_PIXELS = 1 << 24
_MAX_BYTES = 1 << 26


class BmpError(ValueError):
    pass


def is_bmp(payload: bytes) -> bool:
    return payload[:2] == b"BM" and len(payload) >= 18


def _pad4(n: int) -> int:
    return (n + 3) & ~3


def _rle8_encode(row: np.ndarray) -> bytes:
    """One row -> RLE8 encoded runs + EOL (no absolute mode needed for
    deterministic fixtures; runs cap at 255 per spec)."""
    out = bytearray()
    vals = row.tolist()
    i, n = 0, len(vals)
    while i < n:
        j = i + 1
        while j < n and j - i < 255 and vals[j] == vals[i]:
            j += 1
        out += bytes((j - i, vals[i]))
        i = j
    out += b"\x00\x00"  # end of line
    return bytes(out)


def encode_bmp(
    img: np.ndarray, gap: "bytes | None" = None, rle: bool = False
) -> bytes:
    """uint8 (H, W) gray -> 8-bit palette BMP (identity 256-gray palette;
    ``rle=True`` -> BI_RLE8), uint8 (H, W, 3) RGB -> 24-bit BI_RGB.
    ``gap`` bytes sit between palette and pixels with bfOffBits pointing
    past them — different file bytes, identical decoded raster."""
    if img.dtype != np.uint8 or img.ndim not in (2, 3):
        raise ValueError("encode_bmp expects uint8 (H,W) or (H,W,3)")
    h, w = img.shape[:2]
    gap = gap or b""
    if img.ndim == 2:
        bitcount, n_pal = 8, 256
        palette = b"".join(bytes((v, v, v, 0)) for v in range(256))
        if rle:
            compression = 1  # BI_RLE8
            body = b"".join(_rle8_encode(img[y]) for y in range(h - 1, -1, -1))
            body = body[:-2] + b"\x00\x01"  # last EOL -> end of bitmap
        else:
            compression = 0
            stride = _pad4(w)
            rows = np.zeros((h, stride), dtype=np.uint8)
            rows[:, :w] = img[::-1]  # bottom-up
            body = rows.tobytes()
    else:
        bitcount, n_pal, palette, compression = 24, 0, b"", 0
        stride = _pad4(w * 3)
        rows = np.zeros((h, stride), dtype=np.uint8)
        rows[:, : w * 3] = img[::-1, :, ::-1].reshape(h, -1)  # bottom-up BGR
        body = rows.tobytes()
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, bitcount, compression, len(body),
        2835, 2835, n_pal, 0,
    )
    off = 14 + len(info) + len(palette) + len(gap)
    header = struct.pack("<2sIHHI", b"BM", off + len(body), 0, 0, off)
    return header + info + palette + gap + body


def _decode_rle(
    data: bytes, w: int, h: int, four_bit: bool, tolerate
) -> np.ndarray:
    """BI_RLE8 / BI_RLE4 -> (h, w) uint8 palette indices (bottom-up
    source order, returned already flipped to top-down).  The loop is
    per RLE record; total emitted pixels are clamped to w*h (already
    capped at ``_MAX_PIXELS``), so a hostile stream cannot buy unbounded
    CPU or memory."""
    out = np.zeros((h, w), dtype=np.uint8)
    x, y = 0, 0  # y counts bottom-up rows
    i, n = 0, len(data)
    while i + 1 < n:
        cnt, val = data[i], data[i + 1]
        i += 2
        if cnt > 0:  # encoded run
            m = min(cnt, w - x) if y < h else 0
            if m > 0:
                if four_bit:
                    hi, lo = val >> 4, val & 0xF
                    run = np.empty(m, dtype=np.uint8)
                    run[0::2] = hi
                    run[1::2] = lo
                else:
                    run = np.full(m, val, dtype=np.uint8)
                out[h - 1 - y, x : x + m] = run
            if cnt > m:
                tolerate("rle_run_past_row_end")
            x += m
        elif val == 0:  # end of line
            x, y = 0, y + 1
            if y > h:
                tolerate("rle_rows_past_raster")
                break
        elif val == 1:  # end of bitmap
            return out
        elif val == 2:  # delta
            if i + 1 >= n:
                break
            x = min(x + data[i], w)
            y += data[i + 1]
            i += 2
            if y >= h:
                tolerate("rle_delta_past_raster")
                break
        else:  # absolute mode: val literal pixels follow
            npix = val
            nbytes = ((npix + 1) // 2 + 1) & ~1 if four_bit else (npix + 1) & ~1
            chunk = data[i : i + nbytes]
            i += nbytes
            if len(chunk) < nbytes:
                tolerate("rle_truncated_absolute_run")
                chunk = chunk + b"\x00" * (nbytes - len(chunk))
            if four_bit:
                b = np.frombuffer(chunk, dtype=np.uint8)
                lit = np.empty(len(b) * 2, dtype=np.uint8)
                lit[0::2] = b >> 4
                lit[1::2] = b & 0xF
                lit = lit[:npix]
            else:
                lit = np.frombuffer(chunk, dtype=np.uint8)[:npix]
            m = min(npix, w - x) if y < h else 0
            if m > 0:
                out[h - 1 - y, x : x + m] = lit[:m]
            if npix > m:
                tolerate("rle_run_past_row_end")
            x += m
    tolerate("rle_missing_end_of_bitmap")
    return out


def _mask_shift(mask: int) -> Tuple[int, int]:
    """(right shift, value range) for a contiguous bitfield mask."""
    if mask == 0:
        return 0, 1
    shift = (mask & -mask).bit_length() - 1
    return shift, (mask >> shift) + 1


def decode_bmp_gray(
    payload: bytes, tolerant: bool = True
) -> Tuple[np.ndarray, List[str]]:
    """BMP bytes -> (float32 grayscale in [0,1], warnings)."""
    warnings: List[str] = []

    def _tolerate(msg: str) -> None:
        if not tolerant:
            raise BmpError(msg)
        if msg not in warnings:
            warnings.append(msg)

    if payload[:2] != b"BM":
        raise BmpError("bad_magic")
    if len(payload) < 26:
        raise BmpError("truncated_header")
    off_bits = struct.unpack_from("<I", payload, 10)[0]
    dib_size = struct.unpack_from("<I", payload, 14)[0]
    compression = 0
    masks = None
    if dib_size == 12:  # BITMAPCOREHEADER: u16 dims, 3-byte palette entries
        w, h, _planes, bitcount = struct.unpack_from("<HHHH", payload, 18)
        top_down, pal_stride, n_pal_declared = False, 3, 0
    elif dib_size in (40, 52, 56, 64, 108, 124):
        if len(payload) < 14 + 40:
            raise BmpError("truncated_header")
        w, h, _planes, bitcount, compression, _size_img, _xp, _yp, n_pal_declared, _imp = (
            struct.unpack_from("<iiHHIIiiII", payload, 18)
        )
        top_down = h < 0
        h = abs(h)
        pal_stride = 4
        if compression == 3:  # BI_BITFIELDS: masks follow the header (or
            # live in the V4+ header body) — read 3 u32 at offset 54
            if len(payload) < 66:
                raise BmpError("truncated_header")
            masks = struct.unpack_from("<III", payload, 54)
    else:
        raise BmpError("unsupported_dib_header")
    if w <= 0 or h <= 0 or w * h > _MAX_PIXELS:
        raise BmpError("bad_dimensions")
    if bitcount not in (1, 4, 8, 16, 24, 32):
        raise BmpError("unsupported_bitcount")
    if compression not in (0, 1, 2, 3):
        raise BmpError("unsupported_compression")
    if compression == 1 and bitcount != 8:
        raise BmpError("bad_rle_bitcount")
    if compression == 2 and bitcount != 4:
        raise BmpError("bad_rle_bitcount")
    if compression == 3 and bitcount not in (16, 32):
        raise BmpError("bad_bitfields_bitcount")
    stride = _pad4((w * bitcount + 7) // 8)
    if h * stride > _MAX_BYTES:
        raise BmpError("bad_dimensions")

    # palette (between DIB header and pixel data)
    palette = None
    if bitcount <= 8:
        n_pal = n_pal_declared or (1 << bitcount)
        pal_off = 14 + dib_size
        pal_bytes = payload[pal_off : pal_off + n_pal * pal_stride]
        if len(pal_bytes) < n_pal * pal_stride:
            _tolerate("truncated_palette")
            n_pal = len(pal_bytes) // pal_stride
        if n_pal == 0:
            raise BmpError("missing_palette")
        pal = np.frombuffer(
            pal_bytes[: n_pal * pal_stride], dtype=np.uint8
        ).reshape(n_pal, pal_stride)
        palette = pal[:, :3][:, ::-1]  # BGR(X) -> RGB

    if off_bits < 14 + dib_size or off_bits > len(payload):
        _tolerate("bad_pixel_offset")
        off_bits = min(14 + dib_size, len(payload))
    data = payload[off_bits:]

    if compression in (1, 2):  # RLE: emits palette indices
        idx = _decode_rle(data, w, h, four_bit=(compression == 2), tolerate=_tolerate)
    else:
        want = h * stride
        if len(data) < want:
            _tolerate("truncated_pixel_data")
            data = data + b"\x00" * (want - len(data))
        rows = np.frombuffer(data[:want], dtype=np.uint8).reshape(h, stride)
        if not top_down:
            rows = rows[::-1]
        if bitcount in (1, 4):
            bits = np.unpackbits(rows, axis=1)
            if bitcount == 1:
                idx = bits[:, :w]
            else:
                v = bits.reshape(h, -1, 4)
                weights = np.array([8, 4, 2, 1], dtype=np.uint8)
                idx = (v * weights).sum(axis=2).astype(np.uint8)[:, :w]
        elif bitcount == 8:
            idx = rows[:, :w]
        elif bitcount == 16:
            u16 = rows[:, : w * 2].reshape(h, w, 2).copy().view("<u2").reshape(h, w)
            rm, gm, bm = masks if masks else (0x7C00, 0x03E0, 0x001F)
            chans = []
            for m in (rm, gm, bm):
                sh, rng = _mask_shift(m)
                c = ((u16.astype(np.uint32) & m) >> sh).astype(np.float64)
                chans.append(c * (255.0 / max(rng - 1, 1)))
            gray = np.stack(chans, axis=-1) @ _LUMA64
            return (gray / 255.0).astype(np.float32), warnings
        elif bitcount == 24:
            bgr = rows[:, : w * 3].reshape(h, w, 3)
            # identical float32 arithmetic to decode_ppm_gray's P6 path:
            # same RGB bytes -> the SAME float32 luma plane (the
            # cross-format planted-dup contract for color rasters)
            rgbf = bgr[:, :, ::-1].astype(np.float32) / np.float32(255)
            return (rgbf @ _LUMA32).astype(np.float32), warnings
        else:  # 32
            bgrx = rows[:, : w * 4].reshape(h, w, 4)
            if masks:
                u32 = np.ascontiguousarray(bgrx).view("<u4").reshape(h, w)
                chans = []
                for m in masks:
                    sh, rng = _mask_shift(m)
                    c = ((u32 & np.uint32(m)) >> np.uint32(sh)).astype(np.float64)
                    chans.append(c * (255.0 / max(rng - 1, 1)))
                rgb = np.stack(chans, axis=-1)
            else:
                rgb = bgrx[:, :, 2::-1].astype(np.float64)  # BGRX -> RGB
            gray = rgb @ _LUMA64
            return (gray / 255.0).astype(np.float32), warnings

    # palette formats land here with (h, w) indices
    if palette is None:
        raise BmpError("missing_palette")
    idx = np.minimum(idx, len(palette) - 1)
    if bool((palette[:, 0] == palette[:, 1]).all() and (palette[:, 1] == palette[:, 2]).all()):
        # grayscale palette fast path: v/255 in float32 — bit-identical
        # to the PGM / 8-bit-gray-PNG decode of the same raster
        return palette[idx, 0].astype(np.float32) / np.float32(255.0), warnings
    rgb = palette[idx].astype(np.float64)
    gray = rgb @ _LUMA64
    return (gray / 255.0).astype(np.float32), warnings

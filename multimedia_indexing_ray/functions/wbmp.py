"""WBMP (WAP bilevel bitmap) codec — the last format of the reference's
ImageIO surface (`visual/utilities/ImageIOGreyScale.java` reads whatever
ImageIO registers: JPEG, PNG, GIF, BMP, and WBMP).

WBMP type 0 is a header (type=0, fixheader=0, width, height as
multi-byte uintvars) followed by 1-bit-per-pixel MSB-first rows padded
to whole bytes, 1 = white.  Decoding scales to {0.0, 1.0} float32 —
the same values a 1-bit black/white-palette BMP or PNG produces, so the
cross-format bit-identity contract extends to bilevel rasters.

WBMP has NO magic signature (the header begins 0x00 0x00), so
``is_wbmp`` is a STRICT structural sniff: the uintvar header must parse,
dimensions must be sane, and the payload must be at least as long as
the full raster.  The decode router tries it only after every
strong-magic format has rejected the payload.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

_MAX_PIXELS = 1 << 24  # same memory-bomb cap as the sibling codecs


class WbmpError(ValueError):
    pass


def _read_uintvar(payload: bytes, pos: int) -> Tuple[int, int]:
    """WAP multi-byte integer: 7 bits per byte, high bit = continue."""
    val = 0
    for _ in range(5):  # 35 bits is already beyond any sane dimension
        if pos >= len(payload):
            raise WbmpError("truncated_header")
        b = payload[pos]
        pos += 1
        val = (val << 7) | (b & 0x7F)
        if not (b & 0x80):
            return val, pos
    raise WbmpError("uintvar_too_long")


def _parse_header(payload: bytes) -> Tuple[int, int, int]:
    if len(payload) < 4:
        raise WbmpError("truncated_header")
    type_field, pos = _read_uintvar(payload, 0)
    if type_field != 0:
        raise WbmpError("unsupported_wbmp_type")
    if pos >= len(payload) or payload[pos] != 0:
        # type-0 fixheader must be the zero octet (no extensions, no
        # reserved bits) — full-octet strictness matters because this
        # doubles as the no-magic routing sniff
        raise WbmpError("bad_fixheader")
    pos += 1
    w, pos = _read_uintvar(payload, pos)
    h, pos = _read_uintvar(payload, pos)
    if w == 0 or h == 0 or w * h > _MAX_PIXELS:
        raise WbmpError("bad_dimensions")
    return w, h, pos


def is_wbmp(payload: bytes) -> bool:
    """Strict structural sniff (WBMP has no magic): header parses AND
    the payload carries the full declared raster."""
    try:
        w, h, pos = _parse_header(payload)
    except WbmpError:
        return False
    return len(payload) >= pos + ((w + 7) // 8) * h


def encode_wbmp(img: np.ndarray) -> bytes:
    """uint8/bool (H, W) raster -> WBMP type-0 bytes (nonzero = white)."""
    if img.ndim != 2:
        raise ValueError("encode_wbmp expects (H, W)")
    h, w = img.shape

    def _uintvar(v: int) -> bytes:
        out = [v & 0x7F]
        v >>= 7
        while v:
            out.append((v & 0x7F) | 0x80)
            v >>= 7
        return bytes(reversed(out))

    bits = np.zeros((h, ((w + 7) // 8) * 8), dtype=np.uint8)
    bits[:, :w] = (img != 0).astype(np.uint8)
    return b"\x00\x00" + _uintvar(w) + _uintvar(h) + np.packbits(
        bits, axis=1
    ).tobytes()


def decode_wbmp_gray(
    payload: bytes, tolerant: bool = True
) -> Tuple[np.ndarray, List[str]]:
    """WBMP bytes -> (float32 grayscale in {0.0, 1.0}, warnings)."""
    warnings: List[str] = []
    w, h, pos = _parse_header(payload)
    stride = (w + 7) // 8
    want = stride * h
    data = payload[pos : pos + want]
    if len(data) < want:
        if not tolerant:
            raise WbmpError("truncated_raster")
        warnings.append("truncated_raster")
        data = data + b"\x00" * (want - len(data))
    elif len(payload) > pos + want:
        if not tolerant:
            raise WbmpError("trailing_garbage")
        warnings.append("trailing_garbage")
    rows = np.frombuffer(data, dtype=np.uint8).reshape(h, stride)
    bits = np.unpackbits(rows, axis=1)[:, :w]
    return bits.astype(np.float32), warnings

"""Pure-numpy BMP codec (`functions/bmp.py`): lossless round trips over
every bit depth / compression, the grayscale fast paths' cross-format
bit-identity contract, tolerance cases, and typed-error guards."""

import struct

import numpy as np
import pytest

from multimedia_indexing_ray.functions.bmp import (
    BmpError,
    _pad4,
    decode_bmp_gray,
    encode_bmp,
    is_bmp,
)
from multimedia_indexing_ray.functions.png import decode_png_gray, encode_png
from multimedia_indexing_ray.stages import multimodal as mm


def _rand(shape, seed=1):
    return np.random.default_rng(seed).integers(0, 256, shape, dtype=np.uint8)


def test_gray8_roundtrip_lossless():
    img = _rand((20, 30))
    dec, warns = decode_bmp_gray(encode_bmp(img))
    assert warns == []
    np.testing.assert_array_equal((dec * 255).round().astype(np.uint8), img)


def test_rle8_roundtrip_lossless():
    # runs of varied length, incl. full-row runs and width > 255
    img = np.repeat(_rand((9, 40), seed=2), 8, axis=1)  # 9 x 320
    enc = encode_bmp(img, rle=True)
    assert struct.unpack_from("<I", enc, 30)[0] == 1  # BI_RLE8
    dec, warns = decode_bmp_gray(enc)
    assert warns == []
    np.testing.assert_array_equal((dec * 255).round().astype(np.uint8), img)


def test_rgb24_luma_matches_ppm_bit_identical():
    """Same RGB bytes as PPM P6 -> the SAME float32 luma plane (the
    cross-format planted-dup contract for color rasters)."""
    w, h, seed = 24, 18, 11
    rgb = mm._pnm_raster(w, h, seed, gray=False).reshape(h, w, 3)
    dec, warns = decode_bmp_gray(encode_bmp(rgb))
    assert warns == []
    ref = mm.decode_ppm_gray(mm.make_ppm(w, h, seed=seed, gray=False))
    np.testing.assert_array_equal(dec.view(np.uint32), ref.view(np.uint32))


def test_gray8_bit_identical_to_png_gray():
    img = _rand((18, 24), seed=7)
    dec, _ = decode_bmp_gray(encode_bmp(img))
    ref, _ = decode_png_gray(encode_png(img))
    np.testing.assert_array_equal(dec.view(np.uint32), ref.view(np.uint32))
    # RLE8 re-encode of the same raster: different bytes, identical floats
    rle, _ = decode_bmp_gray(encode_bmp(img, rle=True))
    np.testing.assert_array_equal(rle.view(np.uint32), ref.view(np.uint32))


def test_gap_variant_same_pixels():
    img = _rand((16, 16), seed=4)
    a, b = encode_bmp(img), encode_bmp(img, gap=b"icc-ish header-only bytes")
    assert a != b and len(b) > len(a)
    np.testing.assert_array_equal(decode_bmp_gray(a)[0], decode_bmp_gray(b)[0])


def _bmp_raw(
    w, h, bitcount, body, palette=b"", compression=0, top_down=False, masks=b""
):
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, -h if top_down else h, 1, bitcount,
        compression, len(body), 0, 0, len(palette) // 4, 0,
    )
    off = 14 + len(info) + len(masks) + len(palette)
    return (
        struct.pack("<2sIHHI", b"BM", off + len(body), 0, 0, off)
        + info + masks + palette + body
    )


def test_sub_byte_depths_and_palette():
    # 1-bit: 10x2 checkerboard via a black/white palette
    pal = bytes((0, 0, 0, 0)) + bytes((255, 255, 255, 0))
    rows = np.zeros((2, _pad4(2)), dtype=np.uint8)
    rows[0, 0] = 0b10101010
    rows[1, 0] = 0b01010101
    dec, warns = decode_bmp_gray(_bmp_raw(8, 2, 1, rows.tobytes(), pal))
    assert warns == []
    np.testing.assert_array_equal(dec[1], np.array([1, 0, 1, 0, 1, 0, 1, 0], np.float32))
    np.testing.assert_array_equal(dec[0], np.array([0, 1, 0, 1, 0, 1, 0, 1], np.float32))
    # 4-bit: nibble order is high-first
    pal16 = b"".join(bytes((v * 17, v * 17, v * 17, 0)) for v in range(16))
    body = bytes((0x1F, 0x20)) + b"\x00\x00"  # one row of 4 px: 1, 15, 2, 0
    dec4, _ = decode_bmp_gray(_bmp_raw(4, 1, 4, body, pal16))
    np.testing.assert_array_equal(
        (dec4[0] * 255).round(), np.array([17, 255, 34, 0])
    )


def test_top_down_and_16bit_555():
    # top-down 8-bit: first stored row is the TOP row
    img = _rand((3, 4), seed=5)
    pal = b"".join(bytes((v, v, v, 0)) for v in range(256))
    body = np.hstack([img, np.zeros((3, 0), np.uint8)]).tobytes()
    dec, _ = decode_bmp_gray(_bmp_raw(4, 3, 8, body, pal, top_down=True))
    np.testing.assert_array_equal((dec * 255).round().astype(np.uint8), img)
    # 16-bit 555 gray value: r=g=b=16 -> 16/31*255 luma
    px = (16 << 10) | (16 << 5) | 16
    body16 = struct.pack("<HH", px, px)  # one row of 2 px, already 4-aligned
    dec16, _ = decode_bmp_gray(_bmp_raw(2, 1, 16, body16))
    expect = 16 * (255.0 / 31.0) / 255.0
    np.testing.assert_allclose(dec16[0], expect, atol=1e-6)


def test_32bit_and_bitfields():
    # 32-bit BGRX
    rgb = _rand((5, 3, 3), seed=6)
    bgrx = np.concatenate([rgb[:, :, ::-1], np.zeros((5, 3, 1), np.uint8)], axis=2)
    dec, _ = decode_bmp_gray(_bmp_raw(3, 5, 32, bgrx[::-1].tobytes()))
    ref = (rgb.astype(np.float64) @ np.array([0.299, 0.587, 0.114])) / 255.0
    np.testing.assert_allclose(dec, ref.astype(np.float32), atol=1e-7)
    # BI_BITFIELDS 32-bit with RGBA-style masks (R in the low byte)
    masks = struct.pack("<III", 0x000000FF, 0x0000FF00, 0x00FF0000)
    px = rgb.astype(np.uint32)
    u32 = px[:, :, 0] | (px[:, :, 1] << 8) | (px[:, :, 2] << 16)
    dec2, _ = decode_bmp_gray(
        _bmp_raw(3, 5, 32, u32[::-1].astype("<u4").tobytes(), compression=3, masks=masks)
    )
    np.testing.assert_allclose(dec2, ref.astype(np.float32), atol=1e-7)


def test_tolerance_truncation_and_short_palette():
    img = _rand((12, 12), seed=8)
    enc = encode_bmp(img)
    dec, warns = decode_bmp_gray(enc[: len(enc) - 30])
    assert "truncated_pixel_data" in warns and dec.shape == (12, 12)
    with pytest.raises(BmpError):
        decode_bmp_gray(enc[: len(enc) - 30], tolerant=False)
    # RLE stream cut mid-run: decoded prefix + warning, never an escape
    rle = encode_bmp(img, rle=True)
    dec2, warns2 = decode_bmp_gray(rle[: len(rle) - 7])
    assert dec2.shape == (12, 12) and warns2


def test_typed_errors():
    img = _rand((8, 8), seed=9)
    enc = bytearray(encode_bmp(img))
    with pytest.raises(BmpError, match="bad_magic"):
        decode_bmp_gray(b"XX" + bytes(enc[2:]))
    bomb = bytearray(enc)
    struct.pack_into("<ii", bomb, 18, 1 << 15, 1 << 15)  # 2^30 pixels
    with pytest.raises(BmpError, match="bad_dimensions"):
        decode_bmp_gray(bytes(bomb))
    bad = bytearray(enc)
    struct.pack_into("<H", bad, 28, 13)  # illegal bitcount
    with pytest.raises(BmpError, match="unsupported_bitcount"):
        decode_bmp_gray(bytes(bad))
    assert is_bmp(bytes(enc)) and not is_bmp(b"GIF89a")

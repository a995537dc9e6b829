"""Pure-python/numpy GIF codec (`functions/gif.py`): LZW round trips
(incl. table reset and interlace), first-frame semantics, the grayscale
fast path's cross-format bit-identity contract, tolerance cases, and
typed-error guards."""

import struct

import numpy as np
import pytest

from multimedia_indexing_ray.functions.gif import (
    GifError,
    decode_gif_gray,
    encode_gif,
    is_gif,
)
from multimedia_indexing_ray.functions.png import decode_png_gray, encode_png


def _rand(shape, seed=1):
    return np.random.default_rng(seed).integers(0, 256, shape, dtype=np.uint8)


@pytest.mark.parametrize("interlace", [False, True])
def test_gray_roundtrip_lossless(interlace):
    img = _rand((20, 30))
    dec, warns = decode_gif_gray(encode_gif(img, interlace=interlace))
    assert warns == []
    np.testing.assert_array_equal((dec * 255).round().astype(np.uint8), img)


def test_lzw_table_reset_roundtrip():
    """Random noise at 200x300 forces >4096 LZW codes -> clear-code
    resets mid-stream on BOTH encode and decode."""
    img = _rand((200, 300), seed=3)
    dec, warns = decode_gif_gray(encode_gif(img))
    assert warns == []
    np.testing.assert_array_equal((dec * 255).round().astype(np.uint8), img)


def test_bit_identical_to_png_gray():
    img = _rand((18, 24), seed=7)
    ref, _ = decode_png_gray(encode_png(img))
    for interlace in (False, True):
        dec, _ = decode_gif_gray(encode_gif(img, interlace=interlace))
        np.testing.assert_array_equal(dec.view(np.uint32), ref.view(np.uint32))


def test_comment_variant_same_pixels():
    img = _rand((16, 16), seed=4)
    a = encode_gif(img)
    b = encode_gif(img, comment=b"copy variant encoder=b " * 20)  # >255 bytes
    assert a != b
    np.testing.assert_array_equal(decode_gif_gray(a)[0], decode_gif_gray(b)[0])


def test_first_frame_only_and_partial_frame_placement():
    img = _rand((10, 12), seed=5)
    base = encode_gif(img)
    # append a SECOND image descriptor (same data) before the trailer:
    # read(0) semantics decode only the first
    second = base[13 + 768 : -1]  # descriptor + data, skipping LSD + GCT
    two = base[:-1] + second + b"\x3b"
    dec, _ = decode_gif_gray(two)
    np.testing.assert_array_equal((dec * 255).round().astype(np.uint8), img)
    # a first frame smaller than the logical screen lands at (left, top)
    # on a zero background
    inner = encode_gif(img)
    body = bytearray(inner)
    struct.pack_into("<HH", body, 6, 20, 16)  # logical screen 20x16
    struct.pack_into("<HH", body, 13 + 768 + 1, 5, 3)  # left=5, top=3
    dec2, warns = decode_gif_gray(bytes(body))
    # a sub-screen first frame is SPEC-VALID: no warning
    assert warns == [] and dec2.shape == (16, 20)
    np.testing.assert_array_equal(
        (dec2[3:13, 5:17] * 255).round().astype(np.uint8), img
    )
    assert dec2[0, 0] == 0.0


def test_color_palette_luma():
    """Hand-built 2-color GIF with a NON-gray palette: luma matmul path."""
    # header + LSD (2x1, GCT of 2 entries) + palette (red, green)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", 2, 1, 0x80, 0, 0)
    out += bytes((255, 0, 0)) + bytes((0, 255, 0))
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, 2, 1, 0)
    # LZW min code size 2: clear=4, eoi=5, codes 3 bits
    # emit: clear(100), 0(000), 1(001), eoi(101) LSB-first
    #   bits: 100 000 001 101 -> bytes 0b01000100, 0b0000101_1? compute:
    acc, acc_bits, data = 0, 0, bytearray()
    for code in (4, 0, 1, 5):
        acc |= code << acc_bits
        acc_bits += 3
        while acc_bits >= 8:
            data.append(acc & 0xFF)
            acc >>= 8
            acc_bits -= 8
    if acc_bits:
        data.append(acc & 0xFF)
    out += b"\x02" + bytes((len(data),)) + bytes(data) + b"\x00\x3b"
    dec, warns = decode_gif_gray(bytes(out))
    assert warns == []
    np.testing.assert_allclose(dec[0], [0.299, 0.587], atol=1e-6)


def test_tolerance_truncation():
    img = _rand((14, 14), seed=8)
    enc = encode_gif(img)
    dec, warns = decode_gif_gray(enc[: len(enc) - 20])
    assert dec.shape == (14, 14) and warns
    with pytest.raises(GifError):
        decode_gif_gray(enc[: len(enc) - 20], tolerant=False)
    # missing trailer only
    dec2, warns2 = decode_gif_gray(enc[:-1] + b"\x00")
    np.testing.assert_array_equal((dec2 * 255).round().astype(np.uint8), img)


def test_typed_errors():
    img = _rand((8, 8), seed=9)
    enc = bytearray(encode_gif(img))
    with pytest.raises(GifError, match="bad_magic"):
        decode_gif_gray(b"JUNK" + bytes(enc[4:]))
    bomb = bytearray(enc)
    struct.pack_into("<HH", bomb, 6, 0xFFFF, 0xFFFF)
    with pytest.raises(GifError, match="bad_dimensions"):
        decode_gif_gray(bytes(bomb))
    # no image data at all (header + trailer)
    with pytest.raises(GifError, match="no_image_data"):
        decode_gif_gray(bytes(enc[: 13 + 768]) + b"\x3b")
    # LZW min code size outside the 2..8 spec range: a value of 9 would
    # write root symbols > 255 into the uint8 suffix table (review-found
    # OverflowError escape under numpy >= 2.0) — must be a typed error
    bad_mcs = bytearray(enc)
    bad_mcs[13 + 768 + 10] = 9  # header + GCT + image descriptor
    for tol in (False, True):  # structurally hopeless: typed in BOTH modes
        with pytest.raises(GifError, match="bad_lzw_code_size"):
            decode_gif_gray(bytes(bad_mcs), tolerant=tol)
    assert is_gif(bytes(enc)) and not is_gif(b"BM\x00\x00")

"""WBMP codec (`functions/wbmp.py`): roundtrips, multi-byte uintvar
dimensions, strict no-magic sniff, tolerance, typed errors — and the
decode router placing it LAST (everything else has real magic)."""

import numpy as np
import pytest

from multimedia_indexing_ray.functions.wbmp import (
    WbmpError,
    decode_wbmp_gray,
    encode_wbmp,
    is_wbmp,
)
from multimedia_indexing_ray.stages import multimodal as mm


def _bilevel(shape, seed=1):
    return (
        np.random.default_rng(seed).integers(0, 2, shape).astype(np.uint8)
    )


def test_roundtrip_and_values():
    img = _bilevel((18, 24))
    dec, warns = decode_wbmp_gray(encode_wbmp(img))
    assert warns == []
    np.testing.assert_array_equal(dec, img.astype(np.float32))
    assert set(np.unique(dec)) <= {0.0, 1.0}


def test_multibyte_uintvar_dimensions():
    img = _bilevel((3, 300), seed=2)  # width needs 2 uintvar bytes
    enc = encode_wbmp(img)
    assert is_wbmp(enc)
    np.testing.assert_array_equal(decode_wbmp_gray(enc)[0], img.astype(np.float32))


def test_strict_sniff_rejects_non_wbmp():
    assert not is_wbmp(b"")
    assert not is_wbmp(b"\x00\x00")  # header alone, no raster
    assert not is_wbmp(mm.make_ppm(8, 8))
    assert not is_wbmp(mm.make_jpeg(8, 8))
    # declared raster longer than the payload -> sniff rejects
    enc = encode_wbmp(_bilevel((10, 10), seed=3))
    assert is_wbmp(enc) and not is_wbmp(enc[:-5])
    # reserved fixheader bits set (0x20/0x40/0x60): spec-invalid for
    # type 0 and a routing hazard for the no-magic sniff (review-found)
    for b in (0x20, 0x40, 0x60):
        assert not is_wbmp(bytes([enc[0], b]) + bytes(enc[2:]))


def test_tolerance_and_typed_errors():
    enc = encode_wbmp(_bilevel((10, 10), seed=4))
    dec, warns = decode_wbmp_gray(enc[:-5])
    assert "truncated_raster" in warns and dec.shape == (10, 10)
    with pytest.raises(WbmpError):
        decode_wbmp_gray(enc[:-5], tolerant=False)
    with pytest.raises(WbmpError, match="unsupported_wbmp_type"):
        decode_wbmp_gray(b"\x01\x00\x08\x08" + b"\x00" * 8)
    with pytest.raises(WbmpError, match="bad_dimensions"):
        # 2^14 x 2^14 = 2^28 pixels > the decode cap
        decode_wbmp_gray(b"\x00\x00\x81\x80\x00\x81\x80\x00")


def test_router_decodes_wbmp_payload():
    img = _bilevel((12, 16), seed=5)
    arr, err = mm.MediaDecoder(codec="real", target_pixels=64)._decode_one(
        encode_wbmp(img), "image"
    )
    assert err is None and arr.shape == (8, 8)

"""Property-based codec roundtrips (hypothesis): for EVERY lossless
container, encode(decode(x)) must reproduce x exactly on arbitrary
rasters/waveforms — arbitrary shapes (odd widths hit padding and
sub-byte packing edges), arbitrary values (flat images stress RLE and
LZW run handling), interlaced and not.  The fixed-seed unit suites pin
known cases; these search the input space."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from multimedia_indexing_ray.functions.aiff import decode_aiff, encode_aiff
from multimedia_indexing_ray.functions.au import decode_au, encode_au
from multimedia_indexing_ray.functions.bmp import decode_bmp_gray, encode_bmp
from multimedia_indexing_ray.functions.gif import decode_gif_gray, encode_gif
from multimedia_indexing_ray.functions.png import decode_png_gray, encode_png
from multimedia_indexing_ray.functions.wav import decode_wav, encode_wav
from multimedia_indexing_ray.functions.wbmp import decode_wbmp_gray, encode_wbmp

_dims = st.tuples(st.integers(1, 40), st.integers(1, 40))


def _raster(h, w, seed, flat):
    if flat:  # constant / few-valued images stress RLE + LZW runs
        return np.full((h, w), seed % 256, dtype=np.uint8)
    return np.random.default_rng(seed).integers(0, 256, (h, w), dtype=np.uint8)


@settings(max_examples=40, deadline=None)
@given(_dims, st.integers(0, 2**31 - 1), st.booleans(), st.booleans())
def test_gif_roundtrip_property(dims, seed, flat, interlace):
    h, w = dims
    img = _raster(h, w, seed, flat)
    dec, warns = decode_gif_gray(encode_gif(img, interlace=interlace))
    assert warns == []
    np.testing.assert_array_equal((dec * 255).round().astype(np.uint8), img)


@settings(max_examples=40, deadline=None)
@given(_dims, st.integers(0, 2**31 - 1), st.booleans(), st.booleans())
def test_bmp_roundtrip_property(dims, seed, flat, rle):
    h, w = dims
    img = _raster(h, w, seed, flat)
    dec, warns = decode_bmp_gray(encode_bmp(img, rle=rle))
    assert warns == []
    np.testing.assert_array_equal((dec * 255).round().astype(np.uint8), img)


@settings(max_examples=30, deadline=None)
@given(_dims, st.integers(0, 2**31 - 1), st.booleans())
def test_wbmp_and_png_roundtrip_property(dims, seed, interlace):
    h, w = dims
    img = _raster(h, w, seed, flat=False)
    bits = (img > 127).astype(np.uint8)
    dec, warns = decode_wbmp_gray(encode_wbmp(bits))
    assert warns == []
    np.testing.assert_array_equal(dec, bits.astype(np.float32))
    dec2, warns2 = decode_png_gray(encode_png(img, interlace=interlace))
    assert warns2 == []
    np.testing.assert_array_equal((dec2 * 255).round().astype(np.uint8), img)


@settings(max_examples=30, deadline=None)
@given(
    st.integers(1, 3000),
    st.integers(0, 2**31 - 1),
    st.sampled_from(["wav", "au", "aiff"]),
    st.booleans(),
)
def test_pcm16_container_roundtrip_property(n, seed, container, stereo):
    x = np.random.default_rng(seed).integers(-32768, 32767, n, dtype=np.int16)
    if stereo:
        x = np.stack([x, np.roll(x, 1)], axis=1)
    enc = {"wav": encode_wav, "au": encode_au, "aiff": encode_aiff}[container]
    dec = {"wav": decode_wav, "au": decode_au, "aiff": decode_aiff}[container]
    y, rate, warns = dec(enc(x))
    assert warns == [] and rate == 16000
    want = x.astype(np.float32).mean(axis=1) if stereo else x.astype(np.float32)
    np.testing.assert_allclose(y * 32768.0, want, atol=0.51)


@settings(max_examples=25, deadline=None)
@given(st.integers(1, 2500), st.integers(0, 2**31 - 1))
def test_adpcm_tracks_signal_property(n, seed):
    """ADPCM is lossy, but decode(encode(x)) must track x within the
    known IMA error envelope for band-limited signals, and the fact
    chunk must trim to exactly n samples."""
    rng = np.random.default_rng(seed)
    t = np.arange(n)
    f = rng.uniform(0.001, 0.05)
    x = (np.sin(2 * np.pi * f * t) * rng.integers(500, 12000)).astype(np.int16)
    y, _, warns = decode_wav(encode_wav(x, codec="adpcm"))
    assert warns == [] and len(y) == n
    err = y * 32768.0 - x
    # envelope: quantization scales with signal slope; generous bound
    assert np.sqrt((err**2).mean()) < max(60.0, 0.1 * np.abs(x).max())

"""Deterministic corruption fuzz over every tolerant codec: byte flips,
truncations, and garbage prefixes must ALWAYS yield either a decoded
result or the codec's TYPED error — never IndexError / struct.error /
ZeroDivisionError / OverflowError / a hang.  This is the engine-wide
guarantee behind the decode-error side-channel: one hostile payload in
a 100-TB corpus must not kill a batch with an unhandled exception
(S4 tolerance contract, `ImageIOGreyScale.java` analog)."""

import numpy as np
import pytest

from multimedia_indexing_ray.functions import (
    aiff,
    au,
    avi,
    bmp,
    gif,
    jpeg,
    png,
    wav,
    wbmp,
)
from multimedia_indexing_ray.stages import multimodal as mm


def _payloads():
    img = mm._pnm_raster(24, 18, 7, gray=True).reshape(18, 24)
    yield (
        "jpeg",
        jpeg.encode_jpeg_gray(img, 85),
        lambda p: jpeg.decode_jpeg_gray(p, tolerant=True),
        jpeg.JpegError,
    )
    yield (
        "jpeg_color",  # 3-component 4:2:0 path: sampling-factor guards
        mm.make_jpeg(24, 18, seed=9, color=True),
        lambda p: jpeg.decode_jpeg_gray(p, tolerant=True),
        jpeg.JpegError,
    )
    yield (
        "jpeg_progressive",  # SOF2 multi-scan path: EOB runs, refinements
        jpeg.encode_jpeg_gray(img, 85, progressive=True),
        lambda p: jpeg.decode_jpeg_gray(p, tolerant=True),
        jpeg.JpegError,
    )
    yield (
        "png_interlaced_16bit",  # Adam7 pass walk + 16-bit sample path
        png.encode_png((img.astype(np.uint16) * 257), interlace=True),
        lambda p: png.decode_png_gray(p, tolerant=True),
        png.PngError,
    )
    yield (
        "png",
        png.encode_png(img),
        lambda p: png.decode_png_gray(p, tolerant=True),
        png.PngError,
    )
    yield (
        "bmp_rle8",  # RLE escape decoding (EOL / EOB / delta / absolute)
        bmp.encode_bmp(img, rle=True),
        lambda p: bmp.decode_bmp_gray(p, tolerant=True),
        bmp.BmpError,
    )
    yield (
        "bmp24",  # 24-bit bottom-up BGR path + header parse
        bmp.encode_bmp(np.stack([img, np.roll(img, 3, axis=1), np.roll(img, 2, axis=0)], axis=-1)),
        lambda p: bmp.decode_bmp_gray(p, tolerant=True),
        bmp.BmpError,
    )
    yield (
        "gif_interlaced",  # LZW variable-width decode + 4-pass reorder
        gif.encode_gif(img, interlace=True),
        lambda p: gif.decode_gif_gray(p, tolerant=True),
        gif.GifError,
    )
    pcm = (np.sin(np.arange(2000) / 7.0) * 20000).astype(np.int16)
    yield (
        "wav",
        wav.encode_wav(pcm, rate=8000),
        lambda p: wav.decode_wav(p, tolerant=True),
        wav.WavError,
    )
    yield (
        "wav_mulaw",  # G.711 LUT decode path (fmt tag 7)
        wav.encode_wav(pcm, rate=8000, codec="mulaw"),
        lambda p: wav.decode_wav(p, tolerant=True),
        wav.WavError,
    )
    yield (
        "wav_adpcm",  # IMA block headers + nibble recurrence (tag 0x11)
        wav.encode_wav(pcm, rate=8000, codec="adpcm"),
        lambda p: wav.decode_wav(p, tolerant=True),
        wav.WavError,
    )
    yield (
        "au",  # Sun AU big-endian header + annotation gap
        au.encode_au(pcm, rate=8000, codec="mulaw", annotation=b"note"),
        lambda p: au.decode_au(p, tolerant=True),
        au.AuError,
    )
    yield (
        "aiff",  # IFF chunk walk + 80-bit extended rate parse
        aiff.encode_aiff(pcm, rate=8000),
        lambda p: aiff.decode_aiff(p, tolerant=True),
        aiff.AiffError,
    )
    yield (
        "avi",
        mm.make_mjpeg_avi(5, 24, 18, seed=3),
        lambda p: mm.decode_avi_poster(p),
        avi.AviError,
    )
    yield (
        "avi_dib",  # uncompressed-DIB frame path (strf wrap -> BMP decode)
        mm.make_dib_avi(5, 24, 18, seed=3),
        lambda p: mm.decode_avi_poster(p),
        avi.AviError,
    )
    yield (
        "wbmp",  # no-magic strict sniff + bilevel raster
        wbmp.encode_wbmp((mm._pnm_raster(24, 18, 5, gray=True) > 128).reshape(18, 24)),
        lambda p: wbmp.decode_wbmp_gray(p, tolerant=True),
        wbmp.WbmpError,
    )
    yield (
        "ppm",
        mm.make_ppm(24, 18, seed=5, gray=True),
        mm.decode_ppm_gray,
        mm._PpmError,
    )


@pytest.mark.parametrize("name,payload,decode,err", list(_payloads()),
                         ids=lambda v: v if isinstance(v, str) else "")
def test_corruption_never_escapes_typed_error(name, payload, decode, err):
    rng = np.random.default_rng(13)
    cases = []
    buf = bytearray(payload)
    # single byte flips across the whole container (headers, tables,
    # entropy stream, index), deterministic sample
    for off in rng.choice(len(buf), size=min(120, len(buf)), replace=False):
        mut = bytearray(buf)
        mut[off] ^= int(rng.integers(1, 256))
        cases.append(bytes(mut))
    # truncations at seeded lengths, incl. the pathological short ones
    for cut in sorted(set(rng.integers(0, len(buf), 20).tolist()) | {0, 1, 7}):
        cases.append(bytes(buf[:cut]))
    # garbage prefixes / suffixes
    cases.append(rng.bytes(64) + bytes(buf))
    cases.append(bytes(buf) + rng.bytes(64))
    # structural splices: move / duplicate / overwrite a random span
    # (chunk-boundary-crossing mutations byte flips cannot produce)
    for _ in range(40):
        a, b = sorted(rng.integers(0, len(buf), 2).tolist())
        c = int(rng.integers(0, len(buf)))
        mut = bytearray(buf)
        span = bytes(mut[a:b])
        mode = int(rng.integers(0, 3))
        if mode == 0:
            del mut[a:b]
            mut[c:c] = span
        elif mode == 1:
            mut[c:c] = span
        else:
            mut[c : c + len(span)] = span
        cases.append(bytes(mut))
    decoded = failed = 0
    for c in cases:
        try:
            decode(c)
            decoded += 1
        except err:
            failed += 1
        # anything else (IndexError, struct.error, ZeroDivisionError,
        # MemoryError from a corrupted dimension field, ...) propagates
        # and FAILS the test
    assert decoded + failed == len(cases)
    # sanity: the corpus exercised both outcomes
    assert failed > 0, f"{name}: no corruption case failed (fuzz too weak?)"


def test_hostile_warning_amplification_bounded():
    """A payload engineered to emit one tolerated warning per few bytes
    (alternating garbage/RST for JPEG, a run of tiny bad-CRC chunks for
    PNG) must fail FAST with the typed error once the warning cap trips
    — not accumulate millions of warning strings (the memory-amplifier
    the 64MB fetch cap would otherwise allow: ~20M strings / multi-GB).
    Upstream, MediaDecoder catches the typed error into the
    decode_error column, so the batch survives (S4 contract)."""
    import time

    # JPEG: SOI then repeated (garbage byte, RST marker) — one
    # garbage_between_segments warning per 3-byte unit
    hostile_jpeg = b"\xff\xd8" + b"\x00\xff\xd0" * 400_000
    t0 = time.monotonic()
    with pytest.raises(jpeg.JpegError, match="excessive_warnings"):
        jpeg.decode_jpeg_gray(hostile_jpeg, tolerant=True)
    assert time.monotonic() - t0 < 5.0

    # PNG: valid signature then a run of zero-length chunks with bad
    # CRCs — one bad_crc warning per 12-byte chunk
    hostile_png = (
        b"\x89PNG\r\n\x1a\n"
        + (b"\x00\x00\x00\x00" + b"tEXt" + b"\x00\x00\x00\x00") * 100_000
    )
    t0 = time.monotonic()
    with pytest.raises(png.PngError, match="excessive_warnings"):
        png.decode_png_gray(hostile_png, tolerant=True)
    assert time.monotonic() - t0 < 5.0

    # AVI: a run of zero-size LIST chunks — each is "cut before its
    # type" (one truncated_chunk warning per 8 bytes, walk continues)
    import struct

    avi_body = (b"LIST" + struct.pack("<I", 0)) * 100_000
    hostile_avi = (
        b"RIFF" + struct.pack("<I", 4 + len(avi_body)) + b"AVI " + avi_body
    )
    t0 = time.monotonic()
    with pytest.raises(avi.AviError, match="excessive_warnings"):
        avi.parse_mjpeg_avi(hostile_avi, tolerant=True)
    assert time.monotonic() - t0 < 5.0

    # WAV cannot amplify: its chunk walk BREAKS after the first
    # truncation warning, so the cap there is defense-in-depth only.

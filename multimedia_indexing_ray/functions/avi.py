"""Pure-struct RIFF-AVI container codec + frame sampling — the REAL
video path behind `stages/multimodal.py` (closing the last media stub:
image, audio, and video all decode for real in-container; only
inter-frame-compressed codecs remain out of scope, no libav).

Two intra-frame codecs are supported end-to-end: Motion-JPEG (each
frame an independent baseline JFIF picture, decoded by the tolerant
JPEG codec in `functions/jpeg.py`) and uncompressed DIB (raw bottom-up
palette/BGR rasters, decoded by wrapping the stream's strf
BITMAPINFOHEADER around each frame body and reusing `functions/bmp.py`).
The container work is RIFF chunk walking (shared heritage with
`functions/wav.py` — AVI and WAV are both RIFF forms).  This mirrors
how the reference treats video as a bag of keyframes to run the image
pipeline over (frame extraction feeding
`visual/extraction/SURFExtractor.java`-style featurization).

Design points, matching the sibling codecs:

- an optional LIST/INFO comment chunk varies the FILE bytes without
  touching one frame byte, so planted duplicate pairs decode
  bit-identically (the cross-encode oracle trick);
- decode is TOLERANT: a truncated ``movi`` list yields the decoded
  frame prefix plus a warning, unknown chunks are skipped, trailing
  garbage warns; a bad RIFF/AVI signature or an empty ``movi`` raises
  ``AviError``;
- the frame-SAMPLING schedule is pure integer arithmetic
  (``sample_frame_indices``) so the container-parse + sample stage has
  an exact SQL oracle: idx_j = ((2j+1) * n_frames) // (2k).
"""

from __future__ import annotations

import struct
from typing import List, Optional, Tuple

import numpy as np

from multimedia_indexing_ray.functions import MAX_TOLERATED_WARNINGS

from multimedia_indexing_ray.functions import bmp


class AviError(ValueError):
    pass


def is_avi(payload: bytes) -> bool:
    return len(payload) >= 12 and payload[:4] == b"RIFF" and payload[8:12] == b"AVI "


def _chunk(tag: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) % 2 else b""  # RIFF chunks are word-aligned
    return tag + struct.pack("<I", len(body)) + body + pad


def _list(list_type: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", list_type + body)


def encode_mjpeg_avi(
    frames: List[bytes],
    fps: int = 10,
    width: int = 0,
    height: int = 0,
    extra_chunk: Optional[bytes] = None,
) -> bytes:
    """JPEG frame payloads -> RIFF/AVI MJPG bytes (hdrl + movi + idx1).

    ``extra_chunk`` lands in a LIST/INFO comment chunk — header-only
    variation (the re-encoded-copy planting knob; frames unchanged)."""
    if not frames:
        raise ValueError("encode_mjpeg_avi needs at least one frame")
    if fps <= 0:
        raise ValueError("encode_mjpeg_avi needs fps >= 1")
    n = len(frames)
    max_bytes = max(len(f) for f in frames)
    if max_bytes * fps >= 2**32:
        raise ValueError("frame size x fps exceeds the RIFF u32 rate field")
    # MainAVIHeader: us/frame, max bytes/s, granularity, flags(HASINDEX),
    # total frames, initial frames, streams, buffer size, w, h, reserved[4]
    avih = struct.pack(
        "<10I4I",
        1_000_000 // fps, max_bytes * fps, 0, 0x10, n, 0, 1, max_bytes,
        width, height, 0, 0, 0, 0,
    )
    # AVIStreamHeader: fccType, fccHandler, flags, prio+lang, init frames,
    # scale, rate, start, length, buffer size, quality, sample size, rcFrame
    strh = (
        b"vids" + b"MJPG"
        + struct.pack("<IIIIIIIIii4H", 0, 0, 0, 1, fps, 0, n, max_bytes, -1, 0,
                      0, 0, width, height)
    )
    # BITMAPINFOHEADER with biCompression='MJPG'
    strf = struct.pack("<IiiHH", 40, width, height, 1, 24) + b"MJPG" + struct.pack(
        "<IiiII", width * height * 3, 0, 0, 0, 0
    )
    hdrl = _list(b"hdrl", _chunk(b"avih", avih) + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)))
    body = hdrl
    if extra_chunk is not None:
        body += _list(b"INFO", _chunk(b"ICMT", extra_chunk))
    movi_frames = b"".join(_chunk(b"00dc", f) for f in frames)
    body += _list(b"movi", movi_frames)
    # idx1: (ckid, flags AVIIF_KEYFRAME, offset from movi list type, size)
    idx, off = b"", 4
    for f in frames:
        idx += b"00dc" + struct.pack("<III", 0x10, off, len(f))
        off += 8 + len(f) + (len(f) % 2)
    body += _chunk(b"idx1", idx)
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"AVI " + body


def parse_mjpeg_avi(
    payload: bytes, tolerant: bool = True, with_format: bool = False
):
    """RIFF/AVI bytes -> (frame payloads, fps, warnings), or with
    ``with_format=True`` -> (frames, fps, fmt, warnings) where ``fmt``
    is ``{"handler": fourcc bytes, "strf": BITMAPINFOHEADER(+palette)
    bytes}`` for the video stream (both may be empty on malformed
    headers).

    Frames are the raw ``00dc``/``00db`` chunk bodies (JPEG bytes for
    MJPG, raw bottom-up rasters for DIB), decoded downstream by
    `functions/jpeg.py` / `functions/bmp.py`.  A truncated movi
    list yields the frame prefix (the final partial frame body is kept —
    the JPEG decoder's own tolerance handles a cut entropy stream)."""
    warnings: List[str] = []

    def _tolerate(msg: str) -> None:
        if not tolerant:
            raise AviError(msg)
        if len(warnings) >= MAX_TOLERATED_WARNINGS:  # amplification guard
            raise AviError("excessive_warnings")
        warnings.append(msg)

    if not is_avi(payload):
        raise AviError("bad_signature")
    declared = struct.unpack("<I", payload[4:8])[0]
    if 8 + declared < len(payload):
        _tolerate("trailing_garbage_after_riff")
    n = min(len(payload), 8 + declared)
    fps = 0.0
    frames: List[bytes] = []
    saw_movi = False
    n_streams = 0
    video_stream: Optional[int] = None  # strl index of the vids stream
    fmt = {"handler": b"", "strf": b""}

    def _walk(lo: int, hi: int, depth: int) -> None:
        nonlocal fps, saw_movi, n_streams, video_stream
        pos = lo
        while pos + 8 <= hi:
            tag = payload[pos : pos + 4]
            size = struct.unpack("<I", payload[pos + 4 : pos + 8])[0]
            body_lo, body_hi = pos + 8, pos + 8 + size
            truncated = body_hi > hi
            if truncated:
                body_hi = hi
            if tag == b"LIST" and body_hi - body_lo < 4:
                _tolerate("truncated_chunk")  # LIST cut before its type
            elif tag == b"LIST":
                ltype = payload[body_lo : body_lo + 4]
                if truncated:
                    _tolerate(f"truncated_list_{ltype.decode('ascii', 'replace').strip()}")
                if ltype == b"movi":
                    saw_movi = True
                # 'rec ' lists are the standard VfW interleave grouping
                # INSIDE movi — data chunks of spec-valid writers live
                # there, so they must be walked like movi itself
                if ltype in (b"hdrl", b"movi", b"strl", b"rec "):
                    _walk(body_lo + 4, body_hi, depth + 1)
                # INFO / odml / unknown lists are skipped
            elif tag == b"avih" and body_hi - body_lo >= 4:
                usec = struct.unpack("<I", payload[body_lo : body_lo + 4])[0]
                if usec > 0 and fps == 0.0:
                    fps = 1_000_000.0 / usec
            elif tag == b"strh":
                # count EVERY strh toward the stream index — a malformed
                # short strh must not shift the NEXT stream's strf onto
                # the video stream (review-found misattribution)
                if body_hi - body_lo >= 32:
                    fcc = payload[body_lo : body_lo + 4]
                    scale, rate = struct.unpack(
                        "<II", payload[body_lo + 20 : body_lo + 28]
                    )
                    if fcc == b"vids":
                        if video_stream is None:
                            video_stream = n_streams  # first video wins
                            fmt["handler"] = payload[body_lo + 4 : body_lo + 8]
                        if scale > 0 and rate > 0 and n_streams == video_stream:
                            fps = rate / scale  # stream header wins over avih
                else:
                    _tolerate("short_strh")
                n_streams += 1
            elif tag == b"strf" and video_stream is not None and (
                n_streams - 1 == video_stream and not fmt["strf"]
            ):
                # the video stream's format block: a BITMAPINFOHEADER
                # (+ palette) — needed to decode uncompressed DIB frames
                fmt["strf"] = payload[body_lo:body_hi]
            elif tag[2:4] in (b"dc", b"db") and tag[:2].isdigit():
                # only the VIDEO stream's chunks are frames — a second
                # stream's '01dc'/'01wb' data must not pollute the frame
                # list (wrong poster, wrong n_frames sample schedule)
                want = video_stream if video_stream is not None else 0
                if int(tag[:2]) == want:
                    if truncated:
                        _tolerate("truncated_frame_chunk")
                    frames.append(payload[body_lo:body_hi])
                elif truncated:
                    _tolerate("truncated_chunk")  # foreign stream's data
            if truncated:
                if tag not in (b"LIST",) and tag[2:4] not in (b"dc", b"db"):
                    _tolerate("truncated_chunk")
                break
            pos = body_hi + (size % 2)  # word alignment

    _walk(12, n, 0)
    if not saw_movi:
        raise AviError("no_movi_list")
    if not frames:
        raise AviError("no_frames")
    if fps == 0.0:
        _tolerate("no_frame_rate_header")
        fps = 25.0
    if with_format:
        return frames, fps, fmt, warnings
    return frames, fps, warnings


def decode_dib_frame(body: bytes, strf: bytes, tolerant: bool = True):
    """Uncompressed DIB frame body + the stream's strf block -> float32
    grayscale, by wrapping them as a complete BMP file and reusing the
    tolerant BMP decoder (`functions/bmp.py` — same caps, same palette /
    bit-depth / luma paths; strf IS a BITMAPINFOHEADER + palette, which
    is exactly what follows a BITMAPFILEHEADER)."""
    header = struct.pack(
        "<2sIHHI", b"BM", 14 + len(strf) + len(body), 0, 0, 14 + len(strf)
    )
    return bmp.decode_bmp_gray(header + strf + body, tolerant=tolerant)


def encode_dib_avi(
    rasters: List, fps: int = 10, extra_chunk: Optional[bytes] = None
) -> bytes:
    """uint8 (H, W) grayscale rasters -> RIFF/AVI with UNCOMPRESSED
    8-bit-palette DIB frames (handler 'DIB ', biCompression=0) — the
    second real in-container video codec next to MJPG, and the lossless
    one: identical rasters give bit-identical decoded frames, so
    re-wrapped copies (``extra_chunk`` INFO variation) are exact planted
    dups."""
    if not rasters:
        raise ValueError("encode_dib_avi needs at least one frame")
    if fps <= 0:
        raise ValueError("encode_dib_avi needs fps >= 1")
    h, w = rasters[0].shape
    stride = (w + 3) & ~3
    frames = []
    for r in rasters:
        if r.dtype != np.uint8 or r.shape != (h, w):
            raise ValueError("encode_dib_avi expects uniform uint8 (H, W) frames")
        rows = np.zeros((h, stride), dtype=np.uint8)
        rows[:, :w] = r[::-1]  # bottom-up
        frames.append(rows.tobytes())
    n = len(frames)
    max_bytes = len(frames[0])
    avih = struct.pack(
        "<10I4I",
        1_000_000 // fps, max_bytes * fps, 0, 0x10, n, 0, 1, max_bytes,
        w, h, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"DIB "
        + struct.pack("<IIIIIIIIii4H", 0, 0, 0, 1, fps, 0, n, max_bytes, -1, 0,
                      0, 0, w, h)
    )
    palette = b"".join(bytes((v, v, v, 0)) for v in range(256))
    strf = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 8, 0, max_bytes, 0, 0, 256, 0
    ) + palette
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    body = hdrl
    if extra_chunk is not None:
        body += _list(b"INFO", _chunk(b"ICMT", extra_chunk))
    body += _list(b"movi", b"".join(_chunk(b"00db", f) for f in frames))
    idx, off = b"", 4
    for f in frames:
        idx += b"00db" + struct.pack("<III", 0x10, off, len(f))
        off += 8 + len(f) + (len(f) % 2)
    body += _chunk(b"idx1", idx)
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"AVI " + body


def sample_frame_indices(n_frames: int, k: int) -> List[int]:
    """Deterministic uniform frame-sample schedule: the midpoints of k
    equal spans, idx_j = ((2j+1) * n_frames) // (2k), deduplicated in
    order.  Pure integer arithmetic — exactly SQL-expressible, which is
    what gives the container-parse + sample stage a real oracle."""
    if n_frames <= 0 or k <= 0:
        return []
    out: List[int] = []
    for j in range(k):
        idx = ((2 * j + 1) * n_frames) // (2 * k)
        if not out or idx != out[-1]:
            out.append(idx)
    return out

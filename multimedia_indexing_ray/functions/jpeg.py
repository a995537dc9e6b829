"""Pure-numpy baseline JFIF (JPEG) codec — the engine's answer to the
reference's single largest file, the malformed-grayscale-tolerant JPEG
reader (`visual/utilities/ImageIOGreyScale.java`, 1465 LoC; used as the
decode fallback at `visual/vectorization/ImageVectorization.java:176-185`).

The container ships no PIL/libjpeg, so both directions are implemented
from the public ITU-T T.81 spec:

- ``encode_jpeg_gray`` / ``encode_jpeg_color``: baseline sequential DCT,
  Annex-K quantization + Huffman tables (quality-scaled the libjpeg way),
  grayscale or YCbCr 4:2:0, optional COM segment and restart intervals —
  used to synthesize REAL decodable payloads for tests and benches.
- ``decode_jpeg_gray``: marker parse (tables always read from the FILE's
  DQT/DHT, never assumed), 16-bit-LUT Huffman decode, batch vectorized
  dequant + IDCT, luma-only reconstruction (chroma blocks are entropy-
  decoded to advance the bitstream but never IDCTed — grayscale is the
  pipeline's contract, exactly the reference reader's).

Decode is TOLERANT, mirroring the reference's patch-and-continue policy:
truncated entropy data, a missing EOI, trailing garbage, or unknown APPn
segments degrade to a warning side-channel (partial rasters are padded
with mid-gray blocks), while structurally hopeless inputs (no SOI/SOF,
progressive scans, missing tables) raise ``JpegError``.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np


class JpegError(ValueError):
    pass


# ---------------------------------------------------------------------------
# shared constants (ITU-T T.81 Annex K)
# ---------------------------------------------------------------------------


def _zigzag() -> np.ndarray:
    zz = []
    for d in range(15):
        pts = [(i, d - i) for i in range(8) if 0 <= d - i < 8]
        if d % 2 == 0:
            pts = pts[::-1]
        zz.extend(pts)
    return np.array([r * 8 + c for r, c in zz], dtype=np.int64)


ZIGZAG = _zigzag()  # zigzag position k -> raster index

_Q_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.float64,
)

_Q_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.float64,
)

# standard Huffman tables: (counts per code length 1..16, symbol list)
_DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0], list(range(12)))
_DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0], list(range(12)))
_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)


def _dct_matrix() -> np.ndarray:
    u, x = np.meshgrid(np.arange(8), np.arange(8), indexing="ij")
    d = 0.5 * np.cos((2 * x + 1) * u * np.pi / 16.0)
    d[0, :] /= np.sqrt(2.0)
    return d


_DCT = _dct_matrix()  # forward: F = D @ B @ D.T; inverse: B = D.T @ F @ D


def _canonical_codes(counts: "list[int]") -> "dict[int, tuple[int, int]]":
    """symbol -> (code, length), canonical assignment."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            out[k] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _scale_quant(base: np.ndarray, quality: int) -> np.ndarray:
    quality = min(100, max(1, int(quality)))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = np.floor((base * scale + 50) / 100)
    return np.clip(q, 1, 255)


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, nbits: int) -> None:
        if nbits == 0:
            return
        self.acc = (self.acc << nbits) | (value & ((1 << nbits) - 1))
        self.n += nbits
        while self.n >= 8:
            self.n -= 8
            b = (self.acc >> self.n) & 0xFF
            self.buf.append(b)
            if b == 0xFF:  # byte stuffing
                self.buf.append(0x00)
        self.acc &= (1 << self.n) - 1

    def flush(self) -> None:
        pad = (8 - self.n % 8) % 8
        if pad:
            self.write((1 << pad) - 1, pad)  # pad with 1 bits (spec F.1.2.3)


def _magnitude(v: int) -> Tuple[int, int]:
    """(category s, s-bit representation) of a coefficient value."""
    if v == 0:
        return 0, 0
    a = abs(v)
    s = a.bit_length()
    bits = v if v > 0 else v + (1 << s) - 1
    return s, bits


def _blocks_of(plane: np.ndarray) -> np.ndarray:
    """Pad (edge-replicate) to multiples of 8 and tile into (N, 8, 8),
    row-major block order."""
    h, w = plane.shape
    ph, pw = (-h) % 8, (-w) % 8
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    hh, ww = plane.shape
    return (
        plane.reshape(hh // 8, 8, ww // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8),
        hh // 8,
        ww // 8,
    )


def _encode_block(bw: _BitWriter, zz: np.ndarray, pred: int, dc_codes, ac_codes) -> int:
    dc = int(zz[0])
    s, bits = _magnitude(dc - pred)
    code, length = dc_codes[s]
    bw.write(code, length)
    bw.write(bits, s)
    run = 0
    last_nz = 0
    nz = np.flatnonzero(zz[1:])
    last_nz = (nz[-1] + 1) if len(nz) else 0
    k = 1
    while k <= last_nz:
        v = int(zz[k])
        if v == 0:
            run += 1
        else:
            while run > 15:
                code, length = ac_codes[0xF0]  # ZRL
                bw.write(code, length)
                run -= 16
            s, bits = _magnitude(v)
            code, length = ac_codes[(run << 4) | s]
            bw.write(code, length)
            bw.write(bits, s)
            run = 0
        k += 1
    if last_nz < 63:
        code, length = ac_codes[0x00]  # EOB
        bw.write(code, length)
    return dc


def _seg(marker: int, payload: bytes) -> bytes:
    return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(2, "big") + payload


def _dqt_seg(tid: int, q: np.ndarray) -> bytes:
    # the table is stored in zigzag order: byte k holds q[ZIGZAG[k]]
    return _seg(0xDB, bytes([tid]) + bytes([int(q[ZIGZAG[k]]) for k in range(64)]))


def _dht_seg(tclass: int, tid: int, table) -> bytes:
    counts, vals = table
    return _seg(0xC4, bytes([tclass << 4 | tid]) + bytes(counts) + bytes(vals))


def _encode_jpeg(
    planes: "list[np.ndarray]",
    samplings: "list[tuple[int, int]]",
    quality: int,
    comment: bytes | None,
    restart_interval: int,
    omit_eoi: bool,
    extra_segments: "list[bytes]" | None = None,
) -> bytes:
    """Shared baseline encoder: planes[0] is luma (full size), any further
    planes are chroma at their own (already subsampled) resolution."""
    n_comp = len(planes)
    h, w = planes[0].shape
    q_luma = _scale_quant(_Q_LUMA, quality)
    q_chroma = _scale_quant(_Q_CHROMA, quality)
    dc_l, ac_l = _canonical_codes(_DC_LUMA[0]), _canonical_codes(_AC_LUMA[0])
    dc_c, ac_c = _canonical_codes(_DC_CHROMA[0]), _canonical_codes(_AC_CHROMA[0])
    # map symbols through the value lists (canonical codes index symbol RANK)
    def _symmap(codes, table):
        return {table[1][k]: cl for k, cl in codes.items()}

    dc_l, ac_l = _symmap(dc_l, _DC_LUMA), _symmap(ac_l, _AC_LUMA)
    dc_c, ac_c = _symmap(dc_c, _DC_CHROMA), _symmap(ac_c, _AC_CHROMA)

    comp_q = [q_luma] + [q_chroma] * (n_comp - 1)
    comp_codes = [(dc_l, ac_l)] + [(dc_c, ac_c)] * (n_comp - 1)

    # per-component quantized zigzag coefficients, block-grid shaped
    comp_zz, comp_grid = [], []
    for plane, q in zip(planes, comp_q):
        blocks, nby, nbx = _blocks_of(plane)
        f = np.einsum("ux,nxy,vy->nuv", _DCT, blocks.astype(np.float64) - 128.0, _DCT)
        zz = np.floor(f.reshape(-1, 64)[:, ZIGZAG] / q[ZIGZAG] + 0.5).astype(np.int64)
        comp_zz.append(zz)
        comp_grid.append((nby, nbx))

    hmax = max(s[0] for s in samplings)
    vmax = max(s[1] for s in samplings)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))

    bw = _BitWriter()
    preds = [0] * n_comp
    mcu_index = 0
    rst = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_index and mcu_index % restart_interval == 0:
                bw.flush()
                bw.buf += bytes([0xFF, 0xD0 + rst % 8])
                rst += 1
                preds = [0] * n_comp
            for ci in range(n_comp):
                hs, vs = samplings[ci]
                nby, nbx = comp_grid[ci]
                for by in range(vs):
                    for bx in range(hs):
                        gy = min(my * vs + by, nby - 1)
                        gx = min(mx * hs + bx, nbx - 1)
                        zz = comp_zz[ci][gy * nbx + gx]
                        preds[ci] = _encode_block(
                            bw, zz, preds[ci], comp_codes[ci][0], comp_codes[ci][1]
                        )
            mcu_index += 1
    bw.flush()

    out = bytearray(b"\xff\xd8")  # SOI
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    if comment is not None:
        out += _seg(0xFE, comment)
    for s in extra_segments or []:
        out += s
    out += _dqt_seg(0, q_luma)
    if n_comp > 1:
        out += _dqt_seg(1, q_chroma)
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([n_comp])
    for ci in range(n_comp):
        hs, vs = samplings[ci]
        sof += bytes([ci + 1, hs << 4 | vs, 0 if ci == 0 else 1])
    out += _seg(0xC0, sof)
    out += _dht_seg(0, 0, _DC_LUMA) + _dht_seg(1, 0, _AC_LUMA)
    if n_comp > 1:
        out += _dht_seg(0, 1, _DC_CHROMA) + _dht_seg(1, 1, _AC_CHROMA)
    if restart_interval:
        out += _seg(0xDD, restart_interval.to_bytes(2, "big"))
    sos = bytes([n_comp])
    for ci in range(n_comp):
        sos += bytes([ci + 1, (0 if ci == 0 else 1) << 4 | (0 if ci == 0 else 1)])
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, sos)
    out += bw.buf
    if not omit_eoi:
        out += b"\xff\xd9"
    return bytes(out)


def encode_jpeg_gray(
    img: np.ndarray,
    quality: int = 85,
    comment: bytes | None = None,
    restart_interval: int = 0,
    omit_eoi: bool = False,
    extra_segments: "list[bytes]" | None = None,
) -> bytes:
    """uint8 (H, W) grayscale -> baseline JFIF bytes."""
    if img.ndim != 2 or img.dtype != np.uint8:
        raise ValueError("encode_jpeg_gray expects uint8 (H, W)")
    return _encode_jpeg(
        [img], [(1, 1)], quality, comment, restart_interval, omit_eoi, extra_segments
    )


def encode_jpeg_color(
    rgb: np.ndarray,
    quality: int = 85,
    comment: bytes | None = None,
    restart_interval: int = 0,
) -> bytes:
    """uint8 (H, W, 3) RGB -> baseline YCbCr 4:2:0 JFIF bytes."""
    if rgb.ndim != 3 or rgb.shape[2] != 3 or rgb.dtype != np.uint8:
        raise ValueError("encode_jpeg_color expects uint8 (H, W, 3)")
    f = rgb.astype(np.float64)
    y = 0.299 * f[..., 0] + 0.587 * f[..., 1] + 0.114 * f[..., 2]
    cb = -0.168736 * f[..., 0] - 0.331264 * f[..., 1] + 0.5 * f[..., 2] + 128.0
    cr = 0.5 * f[..., 0] - 0.418688 * f[..., 1] - 0.081312 * f[..., 2] + 128.0
    h, w = y.shape
    # 4:2:0 chroma: average 2x2 (pad odd dims by edge replication first)
    def _sub(p: np.ndarray) -> np.ndarray:
        ph, pw = (-h) % 2, (-w) % 2
        if ph or pw:
            p = np.pad(p, ((0, ph), (0, pw)), mode="edge")
        return p.reshape(p.shape[0] // 2, 2, p.shape[1] // 2, 2).mean(axis=(1, 3))

    planes = [
        np.clip(np.round(y), 0, 255).astype(np.uint8),
        np.clip(np.round(_sub(cb)), 0, 255).astype(np.uint8),
        np.clip(np.round(_sub(cr)), 0, 255).astype(np.uint8),
    ]
    return _encode_jpeg(
        planes, [(2, 2), (1, 1), (1, 1)], quality, comment, restart_interval, False
    )


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


def _build_lut(counts: "list[int]", vals: "list[int]") -> Tuple[np.ndarray, np.ndarray]:
    """16-bit peek LUT: lut_len[peek]=code length (0 = invalid),
    lut_sym[peek]=decoded symbol."""
    lut_len = np.zeros(1 << 16, dtype=np.uint8)
    lut_sym = np.zeros(1 << 16, dtype=np.uint8)
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            lo = code << (16 - length)
            hi = lo + (1 << (16 - length))
            lut_len[lo:hi] = length
            lut_sym[lo:hi] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return lut_sym, lut_len


class _BitReader:
    __slots__ = ("d", "pos", "acc", "n", "overrun")

    def __init__(self, data: bytes):
        self.d = data
        self.pos = 0
        self.acc = 0
        self.n = 0
        self.overrun = 0  # pad bits consumed past the real stream

    def _fill16(self) -> None:
        while self.n < 16:
            if self.pos < len(self.d):
                self.acc = (self.acc << 8) | self.d[self.pos]
                self.pos += 1
            else:
                self.acc = (self.acc << 8) | 0xFF  # spec pad bits
                self.overrun += 8
            self.n += 8

    def peek16(self) -> int:
        self._fill16()
        return (self.acc >> (self.n - 16)) & 0xFFFF

    def skip(self, k: int) -> None:
        self.n -= k
        self.acc &= (1 << self.n) - 1

    def read(self, k: int) -> int:
        if k == 0:
            return 0
        if k > 16:
            # a valid baseline stream never asks for >16 magnitude bits;
            # a corrupted DHT can decode to s up to 255 — typed error,
            # not a negative-shift ValueError (fuzz-found)
            raise JpegError("bad_magnitude_bits")
        self._fill16()
        v = (self.acc >> (self.n - k)) & ((1 << k) - 1)
        self.skip(k)
        return v

    @property
    def truncated(self) -> bool:
        # consuming >=8 pad bits means a whole fabricated byte was used
        # (flush padding at the end of a valid stream is < 8 bits)
        return self.overrun - self.n >= 8


def _extend(v: int, s: int) -> int:
    if s == 0:
        return 0
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


class _Component:
    __slots__ = ("cid", "h", "v", "tq", "dc_lut", "ac_lut", "nby", "nbx", "coefs", "pred")

    def __init__(self, cid, h, v, tq):
        self.cid, self.h, self.v, self.tq = cid, h, v, tq
        self.dc_lut = self.ac_lut = None
        self.pred = 0


def decode_jpeg_gray(
    payload: bytes, tolerant: bool = True
) -> Tuple[np.ndarray, List[str]]:
    """Baseline JFIF bytes -> (float32 grayscale in [0,1], warnings).

    Warnings are the tolerance side-channel (truncated entropy data,
    missing EOI, trailing garbage, resync). Raises JpegError when the
    stream is structurally undecodable (and, with tolerant=False, on any
    condition that would otherwise be a warning)."""
    warnings: List[str] = []

    def _tolerate(msg: str) -> None:
        if not tolerant:
            raise JpegError(msg)
        warnings.append(msg)

    data = payload
    if len(data) < 4 or data[0] != 0xFF or data[1] != 0xD8:
        raise JpegError("no_soi")
    pos = 2
    qtables: dict = {}
    htables: dict = {}  # (class, id) -> (lut_sym, lut_len)
    comps: "list[_Component]" = []
    height = width = 0
    restart_interval = 0
    scan_comps: "list[_Component]" = []
    entropy_start = -1

    n = len(data)
    while pos < n:
        if data[pos] != 0xFF:
            # Skip the whole garbage run in one step: a byte-at-a-time
            # loop appending one warning per byte is a memory/CPU
            # amplifier (a 64MB hostile payload would build tens of
            # millions of warning strings). One warning per run.
            nxt = data.find(b"\xff", pos)
            skipped = (nxt if nxt != -1 else n) - pos
            _tolerate(f"garbage_between_segments:{skipped}b")
            pos = nxt if nxt != -1 else n
            continue
        marker = data[pos + 1] if pos + 1 < n else 0
        pos += 2
        if marker == 0xD8 or marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue  # no payload
        if marker == 0xD9:
            _tolerate("eoi_before_scan")
            break
        if pos + 2 > n:
            raise JpegError("truncated_segment_header")
        seglen = int.from_bytes(data[pos : pos + 2], "big")
        body = data[pos + 2 : pos + seglen]
        pos += seglen
        if marker == 0xDB:  # DQT (possibly several tables)
            off = 0
            while off < len(body):
                pq, tq = body[off] >> 4, body[off] & 0xF
                off += 1
                if pq != 0:
                    raise JpegError("unsupported_16bit_quant")
                if off + 64 > len(body):
                    raise JpegError("truncated_dqt")
                q = np.zeros(64, dtype=np.float64)
                q[ZIGZAG] = np.frombuffer(body[off : off + 64], dtype=np.uint8)
                qtables[tq] = q
                off += 64
        elif marker == 0xC4:  # DHT
            off = 0
            while off + 17 <= len(body):
                tc, th = body[off] >> 4, body[off] & 0xF
                counts = list(body[off + 1 : off + 17])
                nv = sum(counts)
                vals = list(body[off + 17 : off + 17 + nv])
                if len(vals) < nv:
                    raise JpegError("truncated_dht")
                htables[(tc, th)] = _build_lut(counts, vals)
                off += 17 + nv
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            height = int.from_bytes(body[1:3], "big")
            width = int.from_bytes(body[3:5], "big")
            if len(body) < 6:
                raise JpegError("truncated_sof")
            ncomp = body[5]
            # raw-size sanity cap (same rationale as the PNG decoder): a
            # corrupted SOF dimension must refuse, not allocate GBs
            if height == 0 or width == 0 or ncomp == 0 or height * width > (1 << 28):
                raise JpegError("bad_dimensions")
            if len(body) < 6 + 3 * ncomp:
                # corrupted ncomp vs actual segment length — typed error,
                # not an IndexError escape (fuzz-found)
                raise JpegError("truncated_sof")
            comps = []
            for ci in range(ncomp):
                b = body[6 + ci * 3 : 9 + ci * 3]
                h, v = b[1] >> 4, b[1] & 0xF
                if not (1 <= h <= 4 and 1 <= v <= 4):
                    # spec range is 1..4; a corrupted nibble of 0 would
                    # divide-by-zero at chroma upsampling (fuzz-found)
                    raise JpegError("bad_sampling_factors")
                comps.append(_Component(b[0], h, v, b[2]))
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise JpegError("unsupported_progressive_or_extended")
        elif marker == 0xDD:  # DRI
            restart_interval = int.from_bytes(body[0:2], "big")
        elif marker == 0xDA:  # SOS
            if not comps:
                raise JpegError("sos_before_sof")
            if len(body) < 1:
                raise JpegError("truncated_sos")
            ns = body[0]
            if ns == 0 or len(body) < 1 + 2 * ns:
                raise JpegError("truncated_sos")
            scan_comps = []
            by_id = {c.cid: c for c in comps}
            for si in range(ns):
                cid, tt = body[1 + si * 2], body[2 + si * 2]
                c = by_id.get(cid)
                if c is None:
                    # malformed grayscale files in the wild mismatch the
                    # SOS component id vs SOF (the ImageIOGreyScale class
                    # of bug): tolerate by positional fallback
                    _tolerate("sos_component_id_mismatch")
                    c = comps[si] if si < len(comps) else comps[0]
                dc = htables.get((0, tt >> 4))
                ac = htables.get((1, tt & 0xF))
                if dc is None or ac is None:
                    raise JpegError("missing_huffman_table")
                c.dc_lut, c.ac_lut = dc, ac
                scan_comps.append(c)
            entropy_start = pos
            break
        # APPn / COM / unknown: skipped
    if entropy_start < 0:
        raise JpegError("no_scan")
    for c in scan_comps:
        if c.tq not in qtables:
            raise JpegError("missing_quant_table")

    # --- split entropy-coded data into restart segments, unstuffing ---
    raw = np.frombuffer(data, dtype=np.uint8)
    segments: "list[bytes]" = []
    seg_start = entropy_start
    i = entropy_start
    saw_eoi = False
    ff = np.flatnonzero(raw[entropy_start:] == 0xFF) + entropy_start
    seg_bounds: "list[tuple[int, int]]" = []
    for f in ff:
        if f < i:
            continue
        nxt = data[f + 1] if f + 1 < n else None
        if nxt == 0x00:
            i = f + 2
            continue
        if nxt is not None and 0xD0 <= nxt <= 0xD7:
            seg_bounds.append((seg_start, f))
            seg_start = f + 2
            i = f + 2
            continue
        # any other marker terminates the scan
        seg_bounds.append((seg_start, f))
        seg_start = -1
        if nxt == 0xD9:
            saw_eoi = True
            if f + 2 < n:
                _tolerate("trailing_garbage_after_eoi")
        break
    if seg_start >= 0:
        seg_bounds.append((seg_start, n))
    if not saw_eoi:
        _tolerate("missing_eoi")
    for s, e in seg_bounds:
        chunk = data[s:e]
        segments.append(chunk.replace(b"\xff\x00", b"\xff"))

    # --- MCU geometry ---
    hmax = max(c.h for c in scan_comps) or 1
    vmax = max(c.v for c in scan_comps) or 1
    mcus_x = -(-width // (8 * hmax))
    mcus_y = -(-height // (8 * vmax))
    n_mcus = mcus_x * mcus_y
    for c in scan_comps:
        c.nby, c.nbx = mcus_y * c.v, mcus_x * c.h
        c.coefs = np.zeros((c.nby * c.nbx, 64), dtype=np.int32)
        c.pred = 0

    luma = scan_comps[0]
    mcu = 0
    seg_idx = 0
    br = _BitReader(segments[0]) if segments else _BitReader(b"")
    truncated = False
    while mcu < n_mcus:
        if restart_interval and mcu and mcu % restart_interval == 0:
            seg_idx += 1
            if seg_idx < len(segments):
                br = _BitReader(segments[seg_idx])
            else:
                _tolerate("truncated_entropy_data")
                truncated = True
                break
            for c in scan_comps:
                c.pred = 0
        my, mx = divmod(mcu, mcus_x)
        try:
            for c in scan_comps:
                for by in range(c.v):
                    for bx in range(c.h):
                        # DC
                        p = br.peek16()
                        L = c.dc_lut[1][p]
                        if L == 0:
                            raise JpegError("bad_huffman_code")
                        br.skip(int(L))
                        s = int(c.dc_lut[0][p])
                        diff = _extend(br.read(s), s)
                        c.pred += diff
                        blk = (my * c.v + by) * c.nbx + (mx * c.h + bx)
                        row = c.coefs[blk]
                        row[0] = c.pred
                        # AC
                        k = 1
                        while k < 64:
                            p = br.peek16()
                            L = c.ac_lut[1][p]
                            if L == 0:
                                raise JpegError("bad_huffman_code")
                            br.skip(int(L))
                            rs = int(c.ac_lut[0][p])
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise JpegError("coefficient_overrun")
                            row[ZIGZAG[k]] = _extend(br.read(s), s)
                            k += 1
            if br.truncated:
                _tolerate("truncated_entropy_data")
                truncated = True
                break
        except JpegError as e:
            _tolerate(str(e))
            truncated = True
            break
        mcu += 1

    if truncated and mcu == 0 and not tolerant:
        raise JpegError("no_decodable_mcus")

    # --- vectorized dequant + IDCT of the LUMA plane only ---
    q = qtables[luma.tq]
    f = (luma.coefs.astype(np.float64) * q).reshape(-1, 8, 8)
    blocks = np.einsum("ux,nuv,vy->nxy", _DCT, f, _DCT) + 128.0
    plane = (
        blocks.reshape(luma.nby, luma.nbx, 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(luma.nby * 8, luma.nbx * 8)
    )
    # luma plane covers ceil(h/8/vmax)*vmax blocks; crop with the
    # component's own sampling ratio
    out_h = -(-height * luma.v // vmax)
    out_w = -(-width * luma.h // hmax)
    plane = plane[:out_h, :out_w]
    img = np.clip(plane, 0.0, 255.0).astype(np.float32) / np.float32(255.0)
    if (luma.v, luma.h) != (vmax, hmax):
        # subsampled luma (exotic): nearest-upsample to full size
        img = np.repeat(np.repeat(img, vmax // luma.v, axis=0), hmax // luma.h, axis=1)
        img = img[:height, :width]
    return img, warnings


def is_jpeg(payload: bytes) -> bool:
    return len(payload) >= 3 and payload[:3] == b"\xff\xd8\xff"

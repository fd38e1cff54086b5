"""Minimal pure-Python baseline JPEG codec (stdlib ``struct`` for framing,
numpy for the 8x8 block transforms).

Moves the image tier beyond PNG's lossless niche (round-5 verdict, next
item 8): JPEG is the first LOSSY container in the multimodal path, and its
decode chain — marker parse, Huffman entropy decode, dequantize, zigzag,
IDCT, chroma upsample, YCbCr→RGB — is the real shape of production image
ingestion. Implements the PUBLIC baseline-sequential process of ITU-T T.81
(ISO/IEC 10918-1): SOI/APP0/DQT/SOF0/DHT/SOS/DRI/RSTn/EOI markers, 8-bit
samples, Huffman coding with the Annex K typical tables, interleaved MCUs
with arbitrary sampling factors (4:4:4, 4:2:0, 4:2:2, grayscale tested).

Scope is deliberately tight (the PNG/GIF playbook): no progressive (SOF2),
no arithmetic coding, no 12-bit, no ICC. That covers every fixture this
repo synthesizes; libjpeg-turbo/Pillow slot into the same per-payload
callable signature (``operators/multimodal.py:pick_decoder``).

Determinism contract (what the DuckDB oracle leans on): all roundings are
``floor(x + 0.5)`` — color conversion both ways, quantization, and the
final IDCT sample rounding. With the FLAT (all-ones) quantization tables a
CONSTANT-color image round-trips bit-exactly: a constant 8x8 block's FDCT
is DC-only (DC = 8·(c−128) ± ~1e-13, so the rounded integer is exact),
quantization by 1 preserves it, and the IDCT of a DC-only spectrum is the
constant back — so the decoded RGB of a constant image is a pure scalar
function of the input RGB that a SQL oracle replays with the same two
color-transform formulas. Gradient images round-trip within a small bound
(coefficient rounding only) — pinned by test, not oracle-matched.

Pure-Python entropy coding is the slow path — acceptable because it runs
inside Arrow-batched ``mapInPandas`` exactly where libjpeg would, so
swapping implementations changes zero plumbing. The DCTs are numpy matrix
products (vectorized across all blocks at once), not per-pixel Python.
"""

from __future__ import annotations

import struct

import numpy as np

# --------------------------------------------------------------------------
# Tables (ITU-T T.81 Annex K — the "typical" quantization + Huffman tables)
# --------------------------------------------------------------------------

#: zigzag position -> row-major index (T.81 Figure 5)
ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

#: Annex K Table K.1 (luminance) / K.2 (chrominance), row-major
QUANT_LUMA_K1 = [
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]
QUANT_CHROMA_K2 = [
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
]
#: all-ones tables: maximal-fidelity mode where roundtrip error comes from
#: coefficient rounding alone (and is ZERO for constant-color images)
QUANT_FLAT = [1] * 64

# Huffman table specs: (BITS[1..16], HUFFVAL). Annex K Tables K.3-K.6.
DC_LUMA_SPEC = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
DC_CHROMA_SPEC = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
AC_LUMA_SPEC = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
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
AC_CHROMA_SPEC = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
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


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length), canonical assignment per T.81 C.2."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _decode_tables(bits: list[int], vals: list[int]):
    """(mincode, maxcode, valptr) per code length — T.81 F.2.2.3 DECODE."""
    mincode = [0] * 17
    maxcode = [-1] * 17
    valptr = [0] * 17
    code = 0
    k = 0
    for length in range(1, 17):
        if bits[length - 1]:
            valptr[length] = k
            mincode[length] = code
            code += bits[length - 1]
            k += bits[length - 1]
            maxcode[length] = code - 1
        code <<= 1
    return mincode, maxcode, valptr, vals


# --------------------------------------------------------------------------
# Block transform: 2-D DCT as C · X · Cᵀ with the orthonormal 8x8 basis,
# vectorized over every block of a component at once.
# --------------------------------------------------------------------------

def _dct_matrix() -> np.ndarray:
    c = np.zeros((8, 8))
    for u in range(8):
        for x in range(8):
            cu = (1 / np.sqrt(2)) if u == 0 else 1.0
            c[u, x] = 0.5 * cu * np.cos((2 * x + 1) * u * np.pi / 16)
    return c


_C = _dct_matrix()
_CT = _C.T


def fdct(blocks: np.ndarray) -> np.ndarray:
    """Forward DCT of (n, 8, 8) level-shifted samples → float coefficients."""
    return _C @ blocks @ _CT


def idct(blocks: np.ndarray) -> np.ndarray:
    """Inverse DCT of (n, 8, 8) coefficients → float samples (pre-shift)."""
    return _CT @ blocks @ _C


def _round_half_up(x: np.ndarray) -> np.ndarray:
    """floor(x + 0.5) — the single rounding rule the oracle replays."""
    return np.floor(x + 0.5)


# --------------------------------------------------------------------------
# Color transforms (JFIF / BT.601 full range), floor(x+0.5) rounding
# --------------------------------------------------------------------------

def rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    r = rgb[..., 0].astype(np.float64)
    g = rgb[..., 1].astype(np.float64)
    b = rgb[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    out = np.stack([y, cb, cr], axis=-1)
    return np.clip(_round_half_up(out), 0, 255).astype(np.uint8)


def ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y = ycc[..., 0].astype(np.float64)
    cb = ycc[..., 1].astype(np.float64) - 128.0
    cr = ycc[..., 2].astype(np.float64) - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    out = np.stack([r, g, b], axis=-1)
    return np.clip(_round_half_up(out), 0, 255).astype(np.uint8)


# --------------------------------------------------------------------------
# Bit I/O with 0xFF byte stuffing
# --------------------------------------------------------------------------

class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self._acc = 0
        self._nbits = 0

    def write(self, code: int, length: int) -> None:
        self._acc = (self._acc << length) | (code & ((1 << length) - 1))
        self._nbits += length
        while self._nbits >= 8:
            self._nbits -= 8
            byte = (self._acc >> self._nbits) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:  # stuff per B.1.1.5
                self.buf.append(0x00)
        self._acc &= (1 << self._nbits) - 1

    def flush(self) -> None:
        if self._nbits:
            pad = 8 - self._nbits
            self.write((1 << pad) - 1, pad)  # 1-fill per F.1.2.3


class _BitReader:
    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self._acc = 0
        self._nbits = 0

    def _fill(self) -> None:
        byte = self.data[self.pos]
        if byte == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:  # stuffed
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:  # RST handled by caller; pad with 1s
                self._acc = (self._acc << 8) | 0xFF
                self._nbits += 8
                return
            else:  # segment end (EOI etc.): pad with 1s, don't consume
                self._acc = (self._acc << 8) | 0xFF
                self._nbits += 8
                return
        else:
            self.pos += 1
        self._acc = (self._acc << 8) | byte
        self._nbits += 8

    def bits(self, n: int) -> int:
        while self._nbits < n:
            self._fill()
        self._nbits -= n
        v = (self._acc >> self._nbits) & ((1 << n) - 1)
        self._acc &= (1 << self._nbits) - 1
        return v

    def bit(self) -> int:
        return self.bits(1)

    def align_to_rst(self) -> None:
        """Drop buffered bits and consume an RSTn marker."""
        self._acc = 0
        self._nbits = 0
        while self.data[self.pos] != 0xFF or not (
            0xD0 <= self.data[self.pos + 1] <= 0xD7
        ):
            self.pos += 1
        self.pos += 2


def _extend(v: int, size: int) -> int:
    """T.81 F.2.2.1 EXTEND: map ``size``-bit magnitude to signed value."""
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _magnitude(v: int) -> tuple[int, int]:
    """signed value -> (size SSSS, raw bits) for encoding."""
    size = abs(v).bit_length()
    if v < 0:
        v += (1 << size) - 1
    return size, v


# --------------------------------------------------------------------------
# Encoder
# --------------------------------------------------------------------------

def _plane_blocks(plane: np.ndarray) -> np.ndarray:
    """(H, W) uint8 plane (H, W multiples of 8) -> (n, 8, 8) float blocks
    in MCU-free raster block order (row of blocks at a time)."""
    h, w = plane.shape
    return (
        plane.reshape(h // 8, 8, w // 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(-1, 8, 8)
        .astype(np.float64)
    )


def _pad_edge(plane: np.ndarray, mh: int, mw: int) -> np.ndarray:
    """Edge-replicate to multiples of (mh, mw) — keeps constant images
    constant, so flat-table exactness survives non-multiple geometry."""
    h, w = plane.shape
    ph = (mh - h % mh) % mh
    pw = (mw - w % mw) % mw
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    return plane


def encode_jpeg(
    width: int,
    height: int,
    pixels: bytes,
    *,
    channels: int = 3,
    subsampling: str = "444",
    quant: str = "flat",
) -> bytes:
    """Baseline JFIF encode of an interleaved 8-bit buffer (RGB or gray).

    subsampling: '444' | '420' | '422' (ignored for grayscale).
    quant: 'flat' (all-ones — constant images roundtrip bit-exactly) or
    'annexk' (T.81 K.1/K.2 typical tables).
    """
    if channels not in (1, 3):
        raise ValueError("channels must be 1 (gray) or 3 (RGB)")
    arr = np.frombuffer(pixels, dtype=np.uint8).reshape(height, width, channels)
    if channels == 3:
        ycc = rgb_to_ycbcr(arr)
    else:
        ycc = arr
    if quant == "flat":
        qtabs = [QUANT_FLAT, QUANT_FLAT]
    elif quant == "annexk":
        qtabs = [QUANT_LUMA_K1, QUANT_CHROMA_K2]
    else:
        raise ValueError(f"unknown quant preset {quant!r}")

    sampling = {"444": (1, 1), "420": (2, 2), "422": (2, 1)}[subsampling]
    if channels == 1:
        comps = [(1, (1, 1), 0)]  # (id, (h,v), qtab)
    else:
        comps = [(1, sampling, 0), (2, (1, 1), 1), (3, (1, 1), 1)]
    hmax = max(c[1][0] for c in comps)
    vmax = max(c[1][1] for c in comps)

    # Per-component planes: luma at full res, chroma downsampled by mean
    planes: list[np.ndarray] = []
    for idx, (_cid, (h, v), _qi) in enumerate(comps):
        plane = ycc[..., idx].astype(np.float64)
        if (h, v) != (hmax, vmax):
            fy, fx = vmax // v, hmax // h
            p = _pad_edge(plane, fy, fx)
            p = p.reshape(p.shape[0] // fy, fy, p.shape[1] // fx, fx).mean(
                axis=(1, 3)
            )
            plane = _round_half_up(p)
        planes.append(_pad_edge(plane, 8 * v, 8 * h))

    # FDCT + quantize each component's blocks (raster block order per plane)
    zz = np.array(ZIGZAG)
    quantized: list[np.ndarray] = []  # (n_blocks, 64) int32, zigzag order
    for (_cid, (h, v), qi), plane in zip(comps, planes):
        coef = fdct(_plane_blocks(plane) - 128.0)
        q = np.array(qtabs[qi], dtype=np.float64).reshape(8, 8)  # natural order
        qd = _round_half_up(coef / q).astype(np.int32)
        quantized.append(qd.reshape(-1, 64)[:, zz])  # natural -> zigzag rows

    dc_enc = [_canonical_codes(*DC_LUMA_SPEC), _canonical_codes(*DC_CHROMA_SPEC)]
    ac_enc = [_canonical_codes(*AC_LUMA_SPEC), _canonical_codes(*AC_CHROMA_SPEC)]

    w = _BitWriter()
    pred = [0] * len(comps)
    mcus_x = planes[0].shape[1] // (8 * hmax)
    mcus_y = planes[0].shape[0] // (8 * vmax)
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for ci, (_cid, (h, v), qi) in enumerate(comps):
                bw = planes[ci].shape[1] // 8  # blocks per row in this plane
                ti = 0 if ci == 0 else 1
                for by in range(v):
                    for bx in range(h):
                        blk = quantized[ci][(my * v + by) * bw + (mx * h + bx)]
                        diff = int(blk[0]) - pred[ci]
                        pred[ci] = int(blk[0])
                        size, bits_ = _magnitude(diff)
                        code, length = dc_enc[ti][size]
                        w.write(code, length)
                        if size:
                            w.write(bits_, size)
                        run = 0
                        for k in range(1, 64):
                            val = int(blk[k])
                            if val == 0:
                                run += 1
                                continue
                            while run > 15:
                                code, length = ac_enc[ti][0xF0]
                                w.write(code, length)
                                run -= 16
                            size, bits_ = _magnitude(val)
                            code, length = ac_enc[ti][(run << 4) | size]
                            w.write(code, length)
                            w.write(bits_, size)
                            run = 0
                        if run:
                            code, length = ac_enc[ti][0x00]  # EOB
                            w.write(code, length)
    w.flush()

    # ---- container ----
    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" + struct.pack(
        ">HHBB", 1, 1, 0, 0
    )  # APP0, 1:1 aspect, no thumbnail
    for ti, tab in enumerate(qtabs[: 2 if channels == 3 else 1]):
        zz_tab = bytes(tab[i] for i in ZIGZAG)  # DQT stores zigzag order
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([ti]) + zz_tab
    sof = struct.pack(">BHHB", 8, height, width, len(comps))
    for cid, (h, v), qi in comps:
        sof += bytes([cid, (h << 4) | v, qi])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    specs = [(0x00, DC_LUMA_SPEC), (0x10, AC_LUMA_SPEC)]
    if channels == 3:
        specs += [(0x01, DC_CHROMA_SPEC), (0x11, AC_CHROMA_SPEC)]
    for tc_th, (bits, vals) in specs:
        payload = bytes([tc_th]) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(payload)) + payload
    sos = bytes([len(comps)])
    for ci, (cid, _s, _qi) in enumerate(comps):
        td_ta = 0x00 if ci == 0 else 0x11
        sos += bytes([cid, td_ta])
    sos += bytes([0, 63, 0])  # Ss, Se, Ah/Al (baseline fixed)
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
    out += w.buf
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --------------------------------------------------------------------------
# Decoder
# --------------------------------------------------------------------------

def parse_header(data: bytes) -> dict:
    """Marker-level parse WITHOUT entropy decode — the metadata fast path
    (geometry/sampling from SOF0, table counts from DQT/DHT). Mirrors the
    GIF/WAV metadata-without-decode tier: at 100 TB you route/filter on
    header facts and decode only the sampled subset."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    out = {"n_quant_tables": 0, "n_huffman_tables": 0, "restart_interval": 0}
    while pos < len(data) - 1:
        if data[pos] != 0xFF:
            raise ValueError(f"marker expected at {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9 or marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue
        seglen = struct.unpack(">H", data[pos : pos + 2])[0]
        seg = data[pos + 2 : pos + seglen]
        pos += seglen
        if marker == 0xDB:
            off = 0
            while off < len(seg):
                out["n_quant_tables"] += 1
                off += 65 if seg[off] >> 4 == 0 else 129
        elif marker == 0xC4:
            off = 0
            while off < len(seg):
                out["n_huffman_tables"] += 1
                off += 17 + sum(seg[off + 1 : off + 17])
        elif marker in (0xC0, 0xC1):
            out["height"], out["width"] = struct.unpack(">HH", seg[1:5])
            out["channels"] = seg[5]
            out["sampling"] = [
                (seg[6 + 3 * i + 1] >> 4, seg[6 + 3 * i + 1] & 0x0F)
                for i in range(seg[5])
            ]
        elif marker == 0xDD:
            out["restart_interval"] = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:
            break
    return out


def decode_jpeg(data: bytes) -> tuple[int, int, int, bytes]:
    """Decode baseline JPEG bytes -> (width, height, channels, pixels).

    Pixels are interleaved 8-bit RGB (3 components, JFIF YCbCr assumed) or
    grayscale (1 component). Raises ValueError on non-baseline streams.
    """
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}  # id -> (64,) natural order
    huff_dc: dict[int, tuple] = {}
    huff_ac: dict[int, tuple] = {}
    comps: list[dict] = []
    width = height = 0
    restart_interval = 0

    while True:
        if data[pos] != 0xFF:
            raise ValueError(f"marker expected at {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            raise ValueError("EOI before SOS")
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue
        seglen = struct.unpack(">H", data[pos : pos + 2])[0]
        seg = data[pos + 2 : pos + seglen]
        pos += seglen
        if marker == 0xDB:  # DQT
            off = 0
            while off < len(seg):
                pq, tq = seg[off] >> 4, seg[off] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit quant tables not supported")
                zzvals = list(seg[off + 1 : off + 65])
                nat = np.zeros(64, dtype=np.float64)
                for zpos, idx in enumerate(ZIGZAG):
                    nat[idx] = zzvals[zpos]
                qtabs[tq] = nat
                off += 65
        elif marker == 0xC4:  # DHT
            off = 0
            while off < len(seg):
                tc, th = seg[off] >> 4, seg[off] & 0x0F
                bits = list(seg[off + 1 : off + 17])
                n = sum(bits)
                vals = list(seg[off + 17 : off + 17 + n])
                (huff_dc if tc == 0 else huff_ac)[th] = _decode_tables(bits, vals)
                off += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 (baseline-compatible)
            precision = seg[0]
            if precision != 8:
                raise ValueError("only 8-bit precision supported")
            height, width = struct.unpack(">HH", seg[1:5])
            ncomp = seg[5]
            for i in range(ncomp):
                cid, hv, tq = seg[6 + 3 * i : 9 + 3 * i]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq}
                )
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise ValueError("non-baseline SOF not supported")
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            scan_sel = {}
            for i in range(ns):
                cs, td_ta = seg[1 + 2 * i : 3 + 2 * i]
                scan_sel[cs] = (td_ta >> 4, td_ta & 0x0F)
            break
        # APPn / COM / others: skipped

    if not comps or not width:
        raise ValueError("missing SOF before SOS")

    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = -(-width // (8 * hmax))
    mcus_y = -(-height // (8 * vmax))

    # Per-component coefficient storage (zigzag-order rows, one per block)
    for c in comps:
        c["bw"] = mcus_x * c["h"]
        c["bh"] = mcus_y * c["v"]
        c["coef"] = np.zeros((c["bh"] * c["bw"], 64), dtype=np.float64)
        c["td"], c["ta"] = scan_sel[c["id"]]

    r = _BitReader(data, pos)

    def _decode_sym(tables) -> int:
        mincode, maxcode, valptr, vals = tables
        code = r.bit()
        length = 1
        while code > maxcode[length]:
            code = (code << 1) | r.bit()
            length += 1
            if length > 16:
                raise ValueError("invalid Huffman stream")
        return vals[valptr[length] + code - mincode[length]]

    pred = [0] * len(comps)
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                r.align_to_rst()
                pred = [0] * len(comps)
            mcu_count += 1
            for ci, c in enumerate(comps):
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        row = np.zeros(64, dtype=np.float64)
                        size = _decode_sym(huff_dc[c["td"]])
                        diff = _extend(r.bits(size), size) if size else 0
                        pred[ci] += diff
                        row[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = _decode_sym(huff_ac[c["ta"]])
                            run, size = rs >> 4, rs & 0x0F
                            if size == 0:
                                if run == 15:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += run
                            if k > 63:
                                raise ValueError("AC run overflow")
                            row[k] = _extend(r.bits(size), size)
                            k += 1
                        bi = (my * c["v"] + by) * c["bw"] + (mx * c["h"] + bx)
                        c["coef"][bi] = row

    # Dequantize + un-zigzag + IDCT per component, vectorized
    planes = []
    for c in comps:
        q = qtabs[c["tq"]]
        nat = np.zeros_like(c["coef"])
        nat[:, ZIGZAG] = c["coef"]  # zigzag row -> natural order
        nat *= q
        samples = np.clip(
            _round_half_up(idct(nat.reshape(-1, 8, 8))) + 128, 0, 255
        ).astype(np.uint8)
        # blocks (raster order) -> plane
        bh, bw = c["bh"], c["bw"]
        plane = (
            samples.reshape(bh, bw, 8, 8).transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)
        )
        # upsample to full grid by replication
        fy, fx = vmax // c["v"], hmax // c["h"]
        if fy > 1 or fx > 1:
            plane = plane.repeat(fy, axis=0).repeat(fx, axis=1)
        planes.append(plane[: mcus_y * vmax * 8, : mcus_x * hmax * 8])

    stacked = np.stack(planes, axis=-1)[:height, :width, :]
    if len(comps) == 3:
        rgb = ycbcr_to_rgb(stacked)
        return width, height, 3, rgb.tobytes()
    return width, height, 1, stacked[..., 0].tobytes()

"""Vendored stdlib-only GIF87a/89a codec: real LZW compression, real
multi-frame (animated) containers, metadata-only parsing, and
frame-selective decode.

Implements the public GIF89a specification (CompuServe, 1990; also
W3C-mirrored) from stdlib primitives — ``struct`` for the fixed-layout
headers and hand-rolled variable-width LZW with LSB-first bit packing —
the video twin of the vendored PNG codec (``operators/png.py``). No
third-party dependency, so the REAL video-container path executes even in
a dependency-locked environment; ffmpeg/PyAV slot into the same call
signatures for richer codecs.

Why GIF for the video modality: it is the simplest public container with
genuine per-frame compressed streams, which makes the two properties a
100 TB video pipeline needs *demonstrable*:

- **metadata without decode** — ``parse_gif_meta`` walks the block
  structure and skips every LZW data sub-block by its length prefix, so
  frame counts / geometry / durations cost O(container walk), not
  O(pixel decode);
- **sampled-frame decode** — each frame owns an independent LZW stream,
  so ``decode_gif_frames`` decompresses ONLY the requested frame indices
  and skips the rest by sub-block length (the decode cost tracks the
  SAMPLE, not the video length).

Scope (honest limitations, all raised explicitly): no interlace, no
local color tables, no transparency composition, no disposal-method
replay — the synthetic corpus never emits them and a real deployment
swaps in ffmpeg behind the same batch contract.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

GIF_SIGNATURES = (b"GIF87a", b"GIF89a")
MAX_CODE_SIZE = 12  # LZW code width cap fixed by the GIF spec


# --------------------------------------------------------------------------
# LZW (GIF variant): variable-width codes, LSB-first packing, clear/EOI
# --------------------------------------------------------------------------


def lzw_encode(data: bytes, min_code_size: int) -> bytes:
    """GIF-variant LZW compress: emits clear code, string codes, EOI, with
    code width growing from ``min_code_size + 1`` up to 12 bits and a table
    reset (clear code) when the table fills. Returns the raw code stream
    (not yet sub-blocked)."""
    clear = 1 << min_code_size
    eoi = clear + 1

    out = bytearray()
    bitbuf = 0
    nbits = 0
    code_size = min_code_size + 1

    def emit(code: int) -> None:
        nonlocal bitbuf, nbits
        bitbuf |= code << nbits
        nbits += code_size
        while nbits >= 8:
            out.append(bitbuf & 0xFF)
            bitbuf >>= 8
            nbits -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    emit(clear)
    w = b""
    for byte in data:
        wc = w + bytes([byte])
        if wc in table:
            w = wc
            continue
        emit(table[w])
        if next_code < (1 << MAX_CODE_SIZE):
            table[wc] = next_code
            next_code += 1
            # width grows as soon as a code needing more bits EXISTS
            if next_code == (1 << code_size) + 1 and code_size < MAX_CODE_SIZE:
                code_size += 1
        else:  # table full (code 4095 assigned): reset rather than overflow
            emit(clear)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            code_size = min_code_size + 1
        w = bytes([byte])
    if w:
        emit(table[w])
    emit(eoi)
    if nbits:
        out.append(bitbuf & 0xFF)
    return bytes(out)


def lzw_decode(stream: bytes, min_code_size: int, *, expected_len: int | None = None) -> bytes:
    """GIF-variant LZW decompress of a raw code stream (sub-blocks already
    joined). Handles clear codes, EOI, the KwKwK self-reference case, and
    the spec's code-width growth convention."""
    clear = 1 << min_code_size
    eoi = clear + 1

    pos = 0  # bit position
    code_size = min_code_size + 1
    total_bits = len(stream) * 8

    def read_code() -> int | None:
        nonlocal pos
        if pos + code_size > total_bits:
            return None
        byte_i = pos // 8
        bit_off = pos % 8
        window = int.from_bytes(
            stream[byte_i : byte_i + 3].ljust(3, b"\0"), "little"
        )
        pos += code_size
        return (window >> bit_off) & ((1 << code_size) - 1)

    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    out = bytearray()
    prev: bytes | None = None
    while True:
        code = read_code()
        if code is None:
            raise ValueError("LZW stream truncated before EOI")
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            code_size = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]  # KwKwK
        else:
            raise ValueError(f"corrupt LZW stream: code {code} out of range")
        out += entry
        # stop adding at 4096 (handles deferred-clear streams from other
        # encoders; our encoder always clears before this point)
        if prev is not None and len(table) < (1 << MAX_CODE_SIZE):
            table.append(prev + entry[:1])
            if len(table) == (1 << code_size) and code_size < MAX_CODE_SIZE:
                code_size += 1
        prev = entry
        if expected_len is not None and len(out) > expected_len:
            raise ValueError("LZW output exceeds declared frame size")
    return bytes(out)


def _sub_blocks(raw: bytes) -> bytes:
    """Package a raw byte stream into GIF data sub-blocks (<=255 bytes
    each, length-prefixed, zero terminator)."""
    out = bytearray()
    for i in range(0, len(raw), 255):
        chunk = raw[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


# --------------------------------------------------------------------------
# Container encode
# --------------------------------------------------------------------------


def encode_gif(
    width: int,
    height: int,
    frames: list[bytes],
    palette: list[tuple[int, int, int]],
    *,
    delays_cs: list[int] | None = None,
) -> bytes:
    """Write a real GIF89a container: logical screen descriptor, global
    color table, and per frame a Graphic Control Extension (delay) +
    image descriptor + LZW-compressed pixel indices. ``frames`` are
    palette-index buffers of exactly ``width*height`` bytes each."""
    n_colors = len(palette)
    if n_colors < 2 or n_colors & (n_colors - 1):
        raise ValueError("palette size must be a power of two >= 2")
    depth = n_colors.bit_length() - 1  # log2
    if not frames:
        raise ValueError("at least one frame required")
    if delays_cs is None:
        delays_cs = [0] * len(frames)
    if len(delays_cs) != len(frames):
        raise ValueError("delays_cs must match frames")

    out = bytearray()
    out += b"GIF89a"
    # logical screen descriptor: GCT present, color resolution = depth
    packed = 0x80 | ((depth - 1) << 4) | (depth - 1)
    out += struct.pack("<HHBBB", width, height, packed, 0, 0)
    for r, g, b in palette:
        out += bytes((r, g, b))
    min_code_size = max(2, depth)
    for frame, delay in zip(frames, delays_cs):
        if len(frame) != width * height:
            raise ValueError("frame buffer size != width*height")
        # Graphic Control Extension (89a): no disposal, no transparency
        out += struct.pack("<BBBBHBB", 0x21, 0xF9, 4, 0, delay, 0, 0)
        # image descriptor: full-frame, no local color table, no interlace
        out += struct.pack("<BHHHHB", 0x2C, 0, 0, width, height, 0)
        out.append(min_code_size)
        out += _sub_blocks(lzw_encode(frame, min_code_size))
    out.append(0x3B)  # trailer
    return bytes(out)


# --------------------------------------------------------------------------
# Container parse / decode
# --------------------------------------------------------------------------


@dataclass
class GifMeta:
    width: int
    height: int
    n_frames: int
    total_delay_cs: int
    n_colors: int


@dataclass
class GifFrame:
    index: int
    width: int
    height: int
    delay_cs: int
    pixels: bytes  # palette indices, len == width*height


def _need(payload: bytes, i: int, n: int, what: str) -> None:
    """Uniform decoder contract: every truncation is a ``ValueError``,
    never a leaked ``struct.error``/``IndexError`` (fuzz-tested)."""
    if i + n > len(payload):
        raise ValueError(f"truncated GIF: {what}")


def _skip_sub_blocks(payload: bytes, i: int) -> int:
    """Advance past a sub-block chain WITHOUT touching its contents — the
    primitive that makes metadata parse and sampled decode O(walk)."""
    while True:
        if i >= len(payload):
            raise ValueError("truncated GIF: unterminated sub-blocks")
        n = payload[i]
        i += 1
        if n == 0:
            return i
        i += n


def _read_sub_blocks(payload: bytes, i: int) -> tuple[bytes, int]:
    parts = []
    while True:
        if i >= len(payload):
            raise ValueError("truncated GIF: unterminated sub-blocks")
        n = payload[i]
        i += 1
        if n == 0:
            return b"".join(parts), i
        parts.append(payload[i : i + n])
        i += n


def _walk(payload: bytes, want: set[int] | None):
    """Single strict pass over the container. Decodes pixels for every
    frame whose index is in ``want`` (``None`` = decode ALL frames;
    ``set()`` = metadata-only, skip every LZW stream). Raises
    ``ValueError`` on any structural violation."""
    if len(payload) < 13 or payload[:6] not in GIF_SIGNATURES:
        raise ValueError("not a GIF: bad signature")
    width, height, packed, _bg, _aspect = struct.unpack("<HHBBB", payload[6:13])
    i = 13
    if not packed & 0x80:
        raise ValueError("unsupported GIF: no global color table")
    n_colors = 2 << (packed & 0x07)
    palette = payload[i : i + 3 * n_colors]
    if len(palette) < 3 * n_colors:
        raise ValueError("truncated GIF: short global color table")
    i += 3 * n_colors

    frames: list[GifFrame] = []
    n_frames = 0
    total_delay = 0
    pending_delay = 0
    while True:
        if i >= len(payload):
            raise ValueError("truncated GIF: missing trailer")
        marker = payload[i]
        i += 1
        if marker == 0x3B:  # trailer
            break
        if marker == 0x21:  # extension
            if i >= len(payload):
                raise ValueError("truncated GIF: bare extension introducer")
            label = payload[i]
            i += 1
            if label == 0xF9:  # Graphic Control Extension: read the delay
                _need(payload, i, 4, "short Graphic Control Extension")
                if payload[i] != 4:
                    raise ValueError("corrupt GIF: GCE block size != 4")
                (pending_delay,) = struct.unpack("<H", payload[i + 2 : i + 4])
                i = _skip_sub_blocks(payload, i)
            else:  # comment / app / plain-text: structural skip
                i = _skip_sub_blocks(payload, i)
            continue
        if marker != 0x2C:
            raise ValueError(f"corrupt GIF: unknown block marker 0x{marker:02x}")
        # image descriptor
        _need(payload, i, 10, "short image descriptor")
        left, top, fw, fh, fpacked = struct.unpack("<HHHHB", payload[i : i + 9])
        i += 9
        if fpacked & 0x80:
            raise ValueError("unsupported GIF: local color table")
        if fpacked & 0x40:
            raise ValueError("unsupported GIF: interlaced frame")
        if left or top or fw != width or fh != height:
            raise ValueError("unsupported GIF: partial-canvas frame")
        min_code_size = payload[i]
        i += 1
        if want is None or n_frames in want:
            raw, i = _read_sub_blocks(payload, i)
            pixels = lzw_decode(raw, min_code_size, expected_len=fw * fh)
            if len(pixels) != fw * fh:
                raise ValueError(
                    f"corrupt GIF: frame {n_frames} decoded {len(pixels)} "
                    f"of {fw * fh} pixels"
                )
            frames.append(GifFrame(n_frames, fw, fh, pending_delay, pixels))
        else:
            i = _skip_sub_blocks(payload, i)
        total_delay += pending_delay
        pending_delay = 0
        n_frames += 1
    if n_frames == 0:
        raise ValueError("corrupt GIF: zero frames")
    meta = GifMeta(width, height, n_frames, total_delay, n_colors)
    return meta, palette, frames


def parse_gif_meta(payload: bytes) -> GifMeta:
    """Container metadata WITHOUT any pixel decode: frame count, geometry,
    summed GCE delays — every LZW data sub-block is skipped by its length
    prefix. This is the real-container replacement for the
    ``n_frames := n_bytes // 256`` stub."""
    meta, _palette, _frames = _walk(payload, want=set())
    return meta


def decode_gif(payload: bytes) -> tuple[GifMeta, bytes, list[GifFrame]]:
    """Full decode: every frame's LZW stream decompressed to palette
    indices. Returns (meta, palette_bytes, frames)."""
    return _walk(payload, want=None)


def decode_gif_frames(payload: bytes, indices: set[int]) -> tuple[GifMeta, bytes, list[GifFrame]]:
    """Sampled decode: only frames whose index is in ``indices`` are
    LZW-decompressed; all other frames are skipped structurally. Decode
    cost tracks |indices|, not the video length."""
    meta, palette, frames = _walk(payload, want=set(indices))
    return meta, palette, frames

"""Pure-stdlib GIF decoder (+ minimal writer for tests).

Companion to functions/png.py: GIF needs only LZW (implemented here,
~40 lines) so the multimodal decode ladder can treat .gif as a REAL
format instead of a stub. First frame only, global or local color
table, GIF87a/89a, interlace supported; transparency is ignored
(composited as its palette color), matching the hash path's
luminance-only use.

The writer emits the classic "uncompressed GIF" LZW stream — a CLEAR
code before every literal, so the dictionary never grows and every
code stays at min_code_size+1 bits. Larger output, trivially correct,
spec-conformant: exactly what the round-trip tests need.
"""

from __future__ import annotations

import struct

import numpy as np

GIF_MAGICS = (b"GIF87a", b"GIF89a")


def is_gif(b: bytes) -> bool:
    return b[:6] in GIF_MAGICS


class _BitReader:
    """LSB-first bit reader over the concatenated data sub-blocks."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.bit = 0

    def read(self, n: int) -> int:
        out = 0
        for i in range(n):
            if self.pos >= len(self.data):
                raise ValueError("LZW stream truncated")
            out |= ((self.data[self.pos] >> self.bit) & 1) << i
            self.bit += 1
            if self.bit == 8:
                self.bit = 0
                self.pos += 1
        return out


def _lzw_decode(min_code_size: int, data: bytes, n_pixels: int) -> bytes:
    clear = 1 << min_code_size
    end = clear + 1
    r = _BitReader(data)
    out = bytearray()

    def reset():
        table = [bytes([i]) for i in range(clear)] + [b"", b""]
        return table, min_code_size + 1

    table, width = reset()
    prev: bytes | None = None
    while len(out) < n_pixels:
        code = r.read(width)
        if code == clear:
            table, width = reset()
            prev = None
            continue
        if code == end:
            break
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]  # the KwKwK case
        else:
            raise ValueError(f"bad LZW code {code}")
        out.extend(entry)
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry
    return bytes(out[:n_pixels])


def _deinterlace(idx: np.ndarray, h: int) -> np.ndarray:
    order = (
        list(range(0, h, 8))
        + list(range(4, h, 8))
        + list(range(2, h, 4))
        + list(range(1, h, 2))
    )
    out = np.empty_like(idx)
    for src, dst in enumerate(order):
        out[dst] = idx[src]
    return out


def decode_gif(b: bytes) -> tuple[int, int, str, np.ndarray]:
    """GIF bytes -> (width, height, 'P', pixels[h,w,3] uint8 RGB) of
    the FIRST image frame. Raises ValueError on malformed input
    (truncations surface as struct/index errors internally and are
    normalized here so callers need one except type)."""
    try:
        return _decode_gif(b)
    except (struct.error, IndexError) as e:
        raise ValueError(f"malformed GIF: {e}") from e


def _decode_gif(b: bytes) -> tuple[int, int, str, np.ndarray]:
    if not is_gif(b):
        raise ValueError("not a GIF")
    sw, sh, flags, _bg, _ar = struct.unpack("<HHBBB", b[6:13])
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(b, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3
    while pos < len(b):
        block = b[pos]
        if block == 0x21:  # extension: label + sub-blocks
            pos += 2
            while b[pos] != 0:
                pos += 1 + b[pos]
            pos += 1
        elif block == 0x2C:  # image descriptor
            _lx, _ty, w, h, iflags = struct.unpack("<HHHHB", b[pos + 1 : pos + 10])
            pos += 10
            table = gct
            if iflags & 0x80:
                n = 2 << (iflags & 0x07)
                table = np.frombuffer(b, np.uint8, n * 3, pos).reshape(n, 3)
                pos += n * 3
            if table is None:
                raise ValueError("GIF frame without a color table")
            mcs = b[pos]
            pos += 1
            data = bytearray()
            while b[pos] != 0:
                ln = b[pos]
                data.extend(b[pos + 1 : pos + 1 + ln])
                pos += 1 + ln
            idx = np.frombuffer(
                _lzw_decode(mcs, bytes(data), w * h), np.uint8
            ).reshape(h, w)
            if iflags & 0x40:
                idx = _deinterlace(idx, h)
            if idx.max(initial=0) >= len(table):
                raise ValueError("palette index out of range")
            return w, h, "P", table[idx]
        elif block == 0x3B:  # trailer
            break
        else:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
    raise ValueError("GIF contains no image frame")


def encode_gif(rgb: np.ndarray) -> bytes:
    """(h, w, 3) uint8 -> single-frame GIF89a. Colors are quantized to
    the image's distinct colors (must be <= 256 — test images are
    synthetic); LZW written in the uncompressed style (CLEAR before
    every literal)."""
    h, w, _ = rgb.shape
    flat = rgb.reshape(-1, 3)
    colors, idx = np.unique(flat, axis=0, return_inverse=True)
    if len(colors) > 256:
        raise ValueError("encode_gif supports <= 256 distinct colors")
    # palette size = power of two >= max(2, n_colors)
    size_exp = 1
    while (2 << size_exp - 1) < max(2, len(colors)):
        size_exp += 1
    n_pal = 2 << (size_exp - 1)
    pal = np.zeros((n_pal, 3), np.uint8)
    pal[: len(colors)] = colors
    mcs = max(2, size_exp)
    clear = 1 << mcs
    width = mcs + 1

    bits = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            bits.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    for px in idx.reshape(-1):
        emit(int(px))
        emit(clear)  # keep the dictionary empty: fixed code width
    emit(clear + 1)  # end
    if nbits:
        bits.append(acc & 0xFF)

    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HHBBB", w, h, 0x80 | ((size_exp - 1) & 7) | 0x70, 0, 0)
    out += pal.tobytes()
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
    out.append(mcs)
    for i in range(0, len(bits), 255):
        chunk = bits[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)

"""Pure-stdlib BMP decode/encode — the third real image format in the
multimodal ladder (with functions/png.py and functions/gif.py).

Scope: the overwhelmingly common on-disk form — BITMAPINFOHEADER,
uncompressed (BI_RGB), 24-bit BGR or 32-bit BGRA, bottom-up or
top-down row order, 4-byte row padding. Anything else (RLE, 1/4/8-bit
palettes, V4/V5 color spaces) raises ValueError and the caller falls
back to its stub path.
"""

from __future__ import annotations

import struct

import numpy as np


def is_bmp(b: bytes) -> bool:
    return b[:2] == b"BM"


def decode_bmp(b: bytes) -> tuple[int, int, str, np.ndarray]:
    """BMP bytes -> (width, height, mode, pixels[h,w,3] uint8 RGB)."""
    try:
        if not is_bmp(b):
            raise ValueError("not a BMP")
        _sz, _r1, _r2, data_off = struct.unpack("<IHHI", b[2:14])
        hdr_size = struct.unpack("<I", b[14:18])[0]
        if hdr_size < 40:
            raise ValueError(f"unsupported DIB header size {hdr_size}")
        w, h_signed = struct.unpack("<ii", b[18:26])
        planes, bpp = struct.unpack("<HH", b[26:30])
        compression = struct.unpack("<I", b[30:34])[0]
        if planes != 1 or compression != 0 or bpp not in (24, 32):
            raise ValueError(
                f"unsupported BMP variant (bpp={bpp}, compression={compression})"
            )
        top_down = h_signed < 0
        h = abs(h_signed)
        nch = bpp // 8
        stride = (w * nch + 3) & ~3
        need = data_off + stride * h
        if len(b) < need:
            raise ValueError("BMP pixel data truncated")
        rows = np.frombuffer(b, np.uint8, stride * h, data_off).reshape(h, stride)
        px = rows[:, : w * nch].reshape(h, w, nch)
        if not top_down:
            px = px[::-1]
        rgb = px[:, :, [2, 1, 0]]  # BGR(A) -> RGB, alpha dropped
        return w, h, "RGB" if nch == 3 else "RGBA", np.ascontiguousarray(rgb)
    except struct.error as e:
        raise ValueError(f"malformed BMP: {e}") from e


def encode_bmp(rgb: np.ndarray) -> bytes:
    """(h, w, 3) uint8 -> 24-bit bottom-up BI_RGB BMP."""
    h, w, c = rgb.shape
    if c != 3:
        raise ValueError("encode_bmp expects RGB")
    stride = (w * 3 + 3) & ~3
    pad = stride - w * 3
    body = bytearray()
    for y in range(h - 1, -1, -1):
        body += np.ascontiguousarray(rgb[y, :, ::-1]).astype(np.uint8).tobytes()
        body += b"\x00" * pad
    data_off = 14 + 40
    header = b"BM" + struct.pack("<IHHI", data_off + len(body), 0, 0, data_off)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    return bytes(header + dib + body)

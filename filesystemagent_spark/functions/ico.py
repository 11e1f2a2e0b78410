"""Pure-stdlib ICO decode/encode for the multimodal image ladder.

ICO is a container, not a codec: an ICONDIR header, N directory
entries, and per-entry payloads that are either a complete PNG stream
(Vista+ icons) or a headerless BMP DIB (BITMAPINFOHEADER with height
doubled to cover the XOR pixel plane plus a 1-bit AND transparency
mask). Both payload forms reuse the existing pure codecs: PNG via
functions/png.py, DIB via the same BI_RGB 24/32-bit row logic as
functions/bmp.py. Palette/RLE DIB payloads raise ValueError and the
caller falls back to the deterministic stub, same honesty contract as
the rest of the ladder (reference media_fingerprinting.py:137-164
covers ICO through PIL; this is the container-level equivalent).

Decode picks the LARGEST image in the container (max w*h, ties by
entry order) — the right frame for perceptual hashing.
"""

from __future__ import annotations

import struct

import numpy as np

from filesystemagent_spark.functions import png as _png

_TYPE_ICON = 1
_TYPE_CURSOR = 2


def is_ico(b: bytes) -> bool:
    if len(b) < 6:
        return False
    reserved, kind, count = struct.unpack("<HHH", b[:6])
    # The magic is weak (0,1|2,n) — require at least one plausible
    # directory entry whose payload lies inside the buffer.
    if reserved != 0 or kind not in (_TYPE_ICON, _TYPE_CURSOR) or not (
        1 <= count <= 64
    ):
        return False
    if len(b) < 6 + 16:
        return False
    size, off = struct.unpack("<II", b[14:22])
    return off >= 6 + 16 * count and off + size <= len(b) and size > 0


def _decode_dib(p: bytes) -> tuple[int, int, str, np.ndarray]:
    """Headerless BMP DIB (XOR plane + AND mask, height doubled)."""
    hdr_size = struct.unpack("<I", p[0:4])[0]
    if hdr_size < 40:
        raise ValueError(f"unsupported ICO DIB header size {hdr_size}")
    w, h2 = struct.unpack("<ii", p[4:12])
    planes, bpp = struct.unpack("<HH", p[12:16])
    compression = struct.unpack("<I", p[16:20])[0]
    if planes != 1 or compression != 0 or bpp not in (24, 32):
        raise ValueError(
            f"unsupported ICO DIB variant (bpp={bpp}, compression={compression})"
        )
    h = abs(h2) // 2 if abs(h2) % 2 == 0 else abs(h2)  # height covers XOR+AND
    top_down = h2 < 0
    nch = bpp // 8
    stride = (w * nch + 3) & ~3
    need = hdr_size + stride * h
    if len(p) < need:
        raise ValueError("ICO DIB pixel data truncated")
    rows = np.frombuffer(p, np.uint8, stride * h, hdr_size).reshape(h, stride)
    px = rows[:, : w * nch].reshape(h, w, nch)
    if not top_down:
        px = px[::-1]
    rgb = px[:, :, [2, 1, 0]]  # BGR(A) -> RGB; AND mask ignored for hashing
    return w, h, "RGB" if nch == 3 else "RGBA", np.ascontiguousarray(rgb)


def decode_ico(b: bytes) -> tuple[int, int, str, np.ndarray]:
    """ICO/CUR bytes -> (width, height, mode, pixels[h,w,3+] uint8 RGB)."""
    try:
        if not is_ico(b):
            raise ValueError("not an ICO")
        count = struct.unpack("<H", b[4:6])[0]
        best: tuple[int, int, int] | None = None  # (-area, offset, size)
        for i in range(count):
            e = b[6 + 16 * i : 6 + 16 * (i + 1)]
            w8, h8 = e[0], e[1]
            w, h = w8 or 256, h8 or 256
            size, off = struct.unpack("<II", e[8:16])
            if off + size > len(b) or size == 0:
                continue
            key = (-w * h, off, size)
            if best is None or key < best:
                best = key
        if best is None:
            raise ValueError("ICO has no readable entries")
        _, off, size = best
        payload = b[off : off + size]
        if _png.is_png(payload):
            return _png.decode_png(payload)
        return _decode_dib(payload)
    except struct.error as e:
        raise ValueError(f"malformed ICO: {e}") from e


def encode_ico(rgb: np.ndarray, payload: str = "dib") -> bytes:
    """(h, w, 3) uint8 -> single-image ICO with a PNG or 32-bit DIB payload."""
    h, w, c = rgb.shape
    if c != 3:
        raise ValueError("encode_ico expects RGB")
    if not (w <= 256 and h <= 256):
        raise ValueError("ICO images cap at 256x256")
    if payload == "png":
        body = _png.encode_png(rgb)
        bpp = 32
    elif payload == "dib":
        stride = (w * 4 + 3) & ~3
        and_stride = ((w + 31) // 32) * 4
        xor = bytearray()
        for y in range(h - 1, -1, -1):  # bottom-up BGRA rows
            row = np.empty((w, 4), np.uint8)
            row[:, :3] = rgb[y, :, ::-1]
            row[:, 3] = 255
            xor += row.tobytes() + b"\x00" * (stride - w * 4)
        and_mask = b"\x00" * (and_stride * h)  # fully opaque
        dib = struct.pack(
            "<IiiHHIIiiII", 40, w, 2 * h, 1, 32, 0,
            len(xor) + len(and_mask), 0, 0, 0, 0,
        )
        body = dib + bytes(xor) + and_mask
        bpp = 32
    else:
        raise ValueError(f"unknown payload kind {payload!r}")
    entry = struct.pack(
        "<BBBBHHII", w % 256, h % 256, 0, 0, 1, bpp, len(body), 6 + 16
    )
    return struct.pack("<HHH", 0, _TYPE_ICON, 1) + entry + body

"""Pure-numpy netpbm (PBM/PGM/PPM) codec.

The simplest real image family (P1-P6: ascii/binary bitmap, graymap,
pixmap) — scanner and scientific toolchains still emit it, and the
whole format is a text header plus raw samples, so decode is exact
with no tables. Same (w, h, mode, rgb) contract as the other image
codecs in the ladder (functions/png.py etc.).
"""

from __future__ import annotations

import numpy as np

__all__ = ["is_pnm", "decode_pnm", "encode_pnm"]


def is_pnm(b: bytes) -> bool:
    return len(b) >= 2 and b[0:1] == b"P" and b[1:2] in b"123456"


def _tokens(b: bytes, pos: int, n: int) -> tuple[list[int], int]:
    """Read n whitespace-separated integer tokens, skipping # comments."""
    out: list[int] = []
    while len(out) < n:
        while pos < len(b) and b[pos : pos + 1].isspace():
            pos += 1
        if pos < len(b) and b[pos : pos + 1] == b"#":
            nl = b.find(b"\n", pos)
            pos = len(b) if nl < 0 else nl + 1
            continue
        start = pos
        while pos < len(b) and not b[pos : pos + 1].isspace():
            pos += 1
        if start == pos:
            raise ValueError("truncated netpbm header")
        out.append(int(b[start:pos]))
    return out, pos


def decode_pnm(b: bytes) -> tuple[int, int, str, np.ndarray]:
    """netpbm bytes -> (w, h, mode, HxWx3 uint8 RGB)."""
    if not is_pnm(b):
        raise ValueError("not a netpbm image")
    kind = int(b[1:2])
    bitmap = kind in (1, 4)
    nchan = 3 if kind in (3, 6) else 1
    (w, h), pos = _tokens(b, 2, 2)
    maxval = 1
    if not bitmap:
        (maxval,), pos = _tokens(b, pos, 1)
        if not 0 < maxval < 65536:
            raise ValueError(f"bad netpbm maxval {maxval}")
    if kind <= 3:  # ascii samples
        if bitmap:
            vals, _ = _tokens(b, pos, w * h)
            a = np.array(vals, np.uint8).reshape(h, w)
            gray = np.where(a == 0, 255, 0).astype(np.uint8)  # 1 = black
            rgb = np.repeat(gray[:, :, None], 3, axis=2)
            return w, h, "1", rgb
        vals, _ = _tokens(b, pos, w * h * nchan)
        a = np.array(vals, np.float64).reshape(h, w, nchan)
    else:  # binary samples after ONE whitespace byte
        pos += 1
        if bitmap:
            row_bytes = (w + 7) // 8
            raw = np.frombuffer(b[pos : pos + row_bytes * h], np.uint8)
            if len(raw) < row_bytes * h:
                raise ValueError("truncated netpbm payload")
            bits = np.unpackbits(raw.reshape(h, row_bytes), axis=1)[:, :w]
            gray = np.where(bits == 0, 255, 0).astype(np.uint8)
            rgb = np.repeat(gray[:, :, None], 3, axis=2)
            return w, h, "1", rgb
        dt = np.dtype(">u2") if maxval > 255 else np.dtype("u1")
        need = w * h * nchan * dt.itemsize
        raw = np.frombuffer(b[pos : pos + need], dt)
        if len(raw) < w * h * nchan:
            raise ValueError("truncated netpbm payload")
        a = raw.astype(np.float64).reshape(h, w, nchan)
    a = np.clip(np.rint(a * (255.0 / maxval)), 0, 255).astype(np.uint8)
    if nchan == 1:
        rgb = np.repeat(a, 3, axis=2)
        return w, h, "L", rgb
    return w, h, "RGB", a


def encode_pnm(img: np.ndarray, kind: int = 6) -> bytes:
    """uint8 array -> binary PGM (kind=5, takes HxW) or PPM (kind=6,
    takes HxWx3). maxval 255; round-trips exactly through decode."""
    a = np.asarray(img, np.uint8)
    if kind == 5:
        if a.ndim == 3:
            raise ValueError("P5 takes a 2-D gray array")
        h, w = a.shape
    elif kind == 6:
        if a.ndim != 3 or a.shape[2] != 3:
            raise ValueError("P6 takes an HxWx3 array")
        h, w = a.shape[:2]
    else:
        raise ValueError("encoder supports P5/P6")
    return f"P{kind}\n{w} {h}\n255\n".encode() + a.tobytes()

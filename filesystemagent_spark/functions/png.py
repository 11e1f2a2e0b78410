"""Pure-stdlib PNG codec + real perceptual hashes.

The reference computes dhash/phash/ahash via PIL+imagehash
(/root/reference/src/media_fingerprinting.py:137-164). This container
has no PIL, but PNG itself needs only zlib (stdlib) plus the filter
spec — so the decode step can be REAL for PNG inputs instead of a
content-hash stub: parse IHDR/IDAT, inflate, unfilter (all five PNG
filter types), then compute the same perceptual-hash family over the
luminance plane with numpy.

Parity note: hashes here follow the published imagehash definitions
(dhash: row-wise right>left on a 9x8 grayscale; ahash: 8x8 mean
threshold; phash: 32x32 DCT, top-left 8x8 sans DC, median threshold)
but use area-average downscaling rather than PIL's Lanczos resample,
so values are semantically equivalent (near-dup Hamming behavior, the
<=2 dup rule from BASELINE.md) without being bit-identical to PIL.
Everything is deterministic: same bytes -> same hashes, any engine.

Supported: 8-bit depth, color types 0 (gray), 2 (RGB), 3 (palette),
4 (gray+alpha), 6 (RGBA), non-interlaced. Anything else raises
ValueError and callers fall back to their stub path.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def is_png(b: bytes) -> bool:
    return b[: len(PNG_MAGIC)] == PNG_MAGIC


def _chunks(b: bytes):
    pos = len(PNG_MAGIC)
    while pos + 8 <= len(b):
        (length,) = struct.unpack(">I", b[pos : pos + 4])
        ctype = b[pos + 4 : pos + 8]
        data = b[pos + 8 : pos + 8 + length]
        yield ctype, data
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IEND":
            break


def _unfilter(raw: bytes, width: int, height: int, nch: int) -> np.ndarray:
    """Reverse PNG scanline filtering -> (height, width, nch) uint8.

    The spec's four predictors (Sub/Up/Average/Paeth) operate on the
    prior byte at distance ``nch`` and the previous scanline; this is
    the reference algorithm from the PNG spec (RFC 2083 §6), row by
    row since each row's reconstruction feeds the next.
    """
    stride = width * nch
    out = np.zeros((height, stride), dtype=np.uint8)
    pos = 0
    prev = np.zeros(stride, dtype=np.intp)
    for y in range(height):
        ftype = raw[pos]
        pos += 1
        line = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=pos).astype(
            np.intp
        )
        pos += stride
        if ftype == 0:  # None
            cur = line
        elif ftype == 1:  # Sub
            cur = line.copy()
            for x in range(nch, stride):
                cur[x] = (cur[x] + cur[x - nch]) & 0xFF
        elif ftype == 2:  # Up
            cur = (line + prev) & 0xFF
        elif ftype == 3:  # Average
            cur = line.copy()
            for x in range(stride):
                left = cur[x - nch] if x >= nch else 0
                cur[x] = (cur[x] + ((left + prev[x]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            cur = line.copy()
            for x in range(stride):
                a = cur[x - nch] if x >= nch else 0
                bb = prev[x]
                c = prev[x - nch] if x >= nch else 0
                p = a + bb - c
                pa, pb, pc = abs(p - a), abs(p - bb), abs(p - c)
                if pa <= pb and pa <= pc:
                    pred = a
                elif pb <= pc:
                    pred = bb
                else:
                    pred = c
                cur[x] = (cur[x] + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    return out.reshape(height, width, nch)


def decode_png(b: bytes) -> tuple[int, int, str, np.ndarray]:
    """PNG bytes -> (width, height, mode, pixels[h,w,3] uint8 RGB).

    Alpha is dropped (composited on black like the reference's hash
    path, which converts to 'L' ignoring alpha); palettes expand via
    PLTE. Raises ValueError for non-PNG/unsupported variants.
    """
    if not is_png(b):
        raise ValueError("not a PNG")
    width = height = None
    bit_depth = color_type = None
    palette = None
    idat = bytearray()
    for ctype, data in _chunks(b):
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", data)
            )
            if bit_depth != 8:
                raise ValueError(f"unsupported bit depth {bit_depth}")
            if color_type not in _CHANNELS:
                raise ValueError(f"unsupported color type {color_type}")
            if interlace != 0:
                raise ValueError("interlaced PNG unsupported")
        elif ctype == b"PLTE":
            palette = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.extend(data)
    if width is None:
        raise ValueError("missing IHDR")
    nch = _CHANNELS[color_type]
    raw = zlib.decompress(bytes(idat))
    expected = height * (1 + width * nch)
    if len(raw) != expected:
        raise ValueError(f"IDAT size {len(raw)} != expected {expected}")
    px = _unfilter(raw, width, height, nch)
    if color_type == 0:
        rgb = np.repeat(px, 3, axis=2)
        mode = "L"
    elif color_type == 2:
        rgb, mode = px, "RGB"
    elif color_type == 3:
        if palette is None:
            raise ValueError("palette PNG without PLTE")
        rgb, mode = palette[px[:, :, 0]], "P"
    elif color_type == 4:
        rgb, mode = np.repeat(px[:, :, :1], 3, axis=2), "LA"
    else:  # 6
        rgb, mode = px[:, :, :3], "RGBA"
    return width, height, mode, rgb


def encode_png(rgb: np.ndarray) -> bytes:
    """(h, w, 3) uint8 -> PNG bytes (color type 2, filter 0 rows).

    Minimal but spec-conformant writer — used by the resize transform's
    re-encode and by test fixtures, and round-trips through decode_png
    losslessly.
    """
    h, w, c = rgb.shape
    if c != 3:
        raise ValueError("encode_png expects RGB")
    raw = b"".join(b"\x00" + rgb[y].tobytes() for y in range(h))

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


# ---------------------------------------------------------------------------
# Perceptual hashes over the decoded luminance plane


def luminance(rgb: np.ndarray) -> np.ndarray:
    """ITU-R 601-2 integer luma, PIL convert('L') coefficients:
    L = (299 R + 587 G + 114 B) // 1000."""
    r = rgb[:, :, 0].astype(np.int64)
    g = rgb[:, :, 1].astype(np.int64)
    b = rgb[:, :, 2].astype(np.int64)
    return ((r * 299 + g * 587 + b * 114) // 1000).astype(np.float64)


def resize_area(gray: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Area-average (box) downscale to (out_h, out_w) — deterministic,
    fractional bins handled by exact interval-overlap weights (the
    general form of average pooling)."""
    h, w = gray.shape

    def weights(n_in: int, n_out: int) -> np.ndarray:
        m = np.zeros((n_out, n_in))
        scale = n_in / n_out
        for o in range(n_out):
            lo, hi = o * scale, (o + 1) * scale
            i0, i1 = int(np.floor(lo)), int(np.ceil(hi))
            for i in range(i0, min(i1, n_in)):
                m[o, i] = min(hi, i + 1) - max(lo, i)
        return m / scale

    return weights(h, out_h) @ gray @ weights(w, out_w).T


def dhash64(gray: np.ndarray) -> int:
    """Row-wise gradient hash (imagehash.dhash definition): downscale
    to 9x8, bit = pixel[x+1] > pixel[x], 64 bits row-major, returned
    as a SIGNED 64-bit int (Spark LongType)."""
    g = resize_area(gray, 9, 8)
    bits = (g[:, 1:] > g[:, :-1]).flatten()
    return _bits_to_i64(bits)


def ahash64(gray: np.ndarray) -> int:
    """8x8 mean-threshold hash (imagehash.average_hash definition)."""
    g = resize_area(gray, 8, 8)
    return _bits_to_i64((g > g.mean()).flatten())


def phash64(gray: np.ndarray) -> int:
    """DCT hash (imagehash.phash definition): 32x32 downscale, 2-D
    DCT-II, keep the top-left 8x8 coefficients, threshold on their
    median excluding DC."""
    g = resize_area(gray, 32, 32)
    d = _dct2(g)[:8, :8]
    flat = d.flatten()
    med = np.median(flat[1:])
    return _bits_to_i64((flat > med).flatten())


def _dct2(x: np.ndarray) -> np.ndarray:
    n = x.shape[0]
    k = np.arange(n)
    basis = np.cos(np.pi * (2 * k[None, :] + 1) * k[:, None] / (2 * n))
    return basis @ x @ basis.T


def _bits_to_i64(bits: np.ndarray) -> int:
    v = 0
    for bit in bits[:64]:
        v = (v << 1) | int(bit)
    return v - (1 << 64) if v >= (1 << 63) else v


def whash64(gray: np.ndarray) -> int:
    """Haar wavelet hash (imagehash.whash definition, hash_size=8,
    image_scale=64, remove_max_haar_ll=True — the reference's fourth
    perceptual-hash family member, media_fingerprinting.py:146):

    - downscale to 64x64 (area average, like the other hashes here);
    - zero the full-depth Haar LL before decomposing: wavedec2 to
      level log2(64)=6 leaves a 1x1 LL holding the scaled global sum,
      so zeroing it and reconstructing is EXACTLY mean subtraction;
    - take the level-3 Haar LL: each level's LL is the 2x2 block sum
      over 2 (orthonormal haar dec_lo = [1/sqrt2, 1/sqrt2] applied
      separably), three levels collapse 64x64 -> 8x8;
    - bit = coefficient > median of the 64 coefficients.
    """
    g = resize_area(gray, 64, 64) / 255.0
    ll = g - g.mean()
    for _ in range(3):
        ll = (ll[0::2, 0::2] + ll[0::2, 1::2] + ll[1::2, 0::2] + ll[1::2, 1::2]) / 2.0
    med = np.median(ll)
    return _bits_to_i64((ll > med).flatten())

"""Pure-stdlib GIF decoder (+ minimal writer for tests).

Companion to functions/png.py: GIF needs only LZW (implemented here,
~40 lines) so the multimodal decode ladder can treat .gif as a REAL
format instead of a stub. Global or local color table, GIF87a/89a,
interlace supported. `decode_gif` returns the first frame (the image
ladder's path); `decode_gif_frames` returns EVERY frame composited
onto the logical-screen canvas with graphic-control delay /
transparency / disposal handling — which makes animated GIF the
container's one honestly-decodable VIDEO format (reference
media_fingerprinting.py:166-179 hashes videos via sampled frames;
operators/multimodal.sample_frames drives this decoder for the same
purpose).

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
    the FIRST image frame (the rect the descriptor declares, matching
    single-frame encoders). Raises ValueError on malformed input."""
    frames = decode_gif_frames(b, max_frames=1)
    _delay, rgb = frames[0]
    h, w, _ = rgb.shape
    return w, h, "P", rgb


def decode_gif_frames(
    b: bytes, max_frames: int | None = None
) -> list[tuple[float, np.ndarray]]:
    """GIF bytes -> [(delay_seconds, pixels[h,w,3] uint8 RGB), ...]
    for every animation frame, composited onto the logical screen:

    - frames smaller than the screen draw into their (left, top) rect
      over the previous canvas;
    - a graphic-control transparency index leaves the underlying
      canvas pixels untouched;
    - disposal method 2 restores the frame's rect to the background
      color after the frame is emitted (method 3 'restore previous'
      is treated as 2 — archival GIFs virtually never use it);
    - delay is the GCE delay in seconds (0.0 when absent).

    The FIRST frame is emitted at the frame's own rect size (not the
    screen) when it is the only drawing — this keeps single-frame
    decode exact for foreign encoders whose descriptor covers the
    screen anyway, and gives animated GIFs a stable canvas.

    Raises ValueError on malformed input (truncations surface as
    struct/index errors internally and are normalized here)."""
    try:
        return _decode_gif_frames(b, max_frames)
    except (struct.error, IndexError) as e:
        raise ValueError(f"malformed GIF: {e}") from e


def _decode_gif_frames(
    b: bytes, max_frames: int | None
) -> list[tuple[float, np.ndarray]]:
    if not is_gif(b):
        raise ValueError("not a GIF")
    sw, sh, flags, bg_idx, _ar = struct.unpack("<HHBBB", b[6:13])
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(b, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3
    bg_rgb = (
        gct[bg_idx] if gct is not None and bg_idx < len(gct)
        else np.zeros(3, np.uint8)
    )
    canvas: np.ndarray | None = None  # lazily sized to the screen
    frames: list[tuple[float, np.ndarray]] = []
    delay_s = 0.0
    transparent: int | None = None
    disposal = 0
    while pos < len(b):
        block = b[pos]
        if block == 0x21:  # extension: label + sub-blocks
            label = b[pos + 1]
            pos += 2
            if label == 0xF9 and b[pos] >= 4:  # graphic control
                gflags, delay_cs, tidx = struct.unpack(
                    "<BHB", b[pos + 1 : pos + 5]
                )
                delay_s = delay_cs / 100.0
                transparent = tidx if gflags & 0x01 else None
                disposal = (gflags >> 2) & 0x07
            while b[pos] != 0:
                pos += 1 + b[pos]
            pos += 1
        elif block == 0x2C:  # image descriptor
            lx, ty, w, h, iflags = struct.unpack("<HHHHB", b[pos + 1 : pos + 10])
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
            pos += 1  # image-data block terminator
            idx = np.frombuffer(
                _lzw_decode(mcs, bytes(data), w * h), np.uint8
            ).reshape(h, w)
            if iflags & 0x40:
                idx = _deinterlace(idx, h)
            if idx.max(initial=0) >= len(table):
                raise ValueError("palette index out of range")
            rgb = table[idx]
            full_screen = lx == 0 and ty == 0 and w == sw and h == sh
            if not frames and max_frames == 1 and not full_screen:
                # single-frame decode of a sub-rect GIF: return the
                # rect itself (foreign single-frame encoders)
                frames.append((delay_s, rgb))
                return frames
            if canvas is None:
                canvas = np.broadcast_to(bg_rgb, (sh, sw, 3)).copy()
            patch = canvas[ty : ty + h, lx : lx + w]
            mask = (
                np.ones((h, w), bool) if transparent is None
                else idx != transparent
            )
            patch[mask] = rgb[mask]
            frames.append((delay_s, canvas.copy()))
            if disposal == 2 and canvas is not None:
                canvas[ty : ty + h, lx : lx + w] = bg_rgb
            delay_s, transparent, disposal = 0.0, None, 0
            if max_frames is not None and len(frames) >= max_frames:
                return frames
        elif block == 0x3B:  # trailer
            break
        else:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
    if not frames:
        raise ValueError("GIF contains no image frame")
    return frames


def encode_gif(rgb: np.ndarray) -> bytes:
    """(h, w, 3) uint8 -> single-frame GIF89a. Colors are quantized to
    the image's distinct colors (must be <= 256 — test images are
    synthetic); LZW written in the uncompressed style (CLEAR before
    every literal)."""
    return encode_gif_frames([rgb])


def encode_gif_frames(
    frames: list[np.ndarray], delay_s: float = 0.0
) -> bytes:
    """[(h, w, 3) uint8, ...] -> animated GIF89a with one global color
    table built from the union of all frames' colors (must be <= 256
    distinct — synthetic test media) and a graphic-control extension
    carrying `delay_s` before every frame. Frames must share one
    shape. Single-element input degenerates to `encode_gif` exactly
    (the delay GCE is omitted when delay_s == 0 and len == 1)."""
    if not frames:
        raise ValueError("encode_gif_frames needs at least one frame")
    h, w, _ = frames[0].shape
    for f in frames[1:]:
        if f.shape != frames[0].shape:
            raise ValueError("all frames must share one shape")
    flat = np.concatenate([f.reshape(-1, 3) for f in frames])
    colors, idx_all = np.unique(flat, axis=0, return_inverse=True)
    rgb = frames[0]  # noqa: F841  (kept for symmetry with encode_gif docs)
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
    per_frame = idx_all.reshape(len(frames), h * w)

    def lzw_stream(idx: np.ndarray) -> bytes:
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
        for px in idx:
            emit(int(px))
            emit(clear)  # keep the dictionary empty: fixed code width
        emit(clear + 1)  # end
        if nbits:
            bits.append(acc & 0xFF)
        return bytes(bits)

    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HHBBB", w, h, 0x80 | ((size_exp - 1) & 7) | 0x70, 0, 0)
    out += pal.tobytes()
    delay_cs = int(round(delay_s * 100))
    for fi in range(len(frames)):
        if len(frames) > 1 or delay_cs:
            # graphic control: disposal 1 (leave), no transparency
            out += b"\x21\xf9\x04" + struct.pack("<BHB", 0x04, delay_cs, 0) + b"\x00"
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
        out.append(mcs)
        bits = lzw_stream(per_frame[fi])
        for i in range(0, len(bits), 255):
            chunk = bits[i : i + 255]
            out.append(len(chunk))
            out += chunk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)

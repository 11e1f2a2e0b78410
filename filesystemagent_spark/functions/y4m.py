"""Pure-numpy YUV4MPEG2 (.y4m) video codec.

The multimodal ladder's third REAL video container beside animated GIF
(functions/gif.py) and MJPEG AVI (functions/avi.py): Y4M is the
uncompressed interchange format the video toolchain (ffmpeg, x264,
VMAF) speaks — a plain-text header, then `FRAME` markers with raw
planar YUV. No entropy coding, no codec tables: everything is
specified by the public format description, so decode here is exact,
not approximate.

Supported colorspaces: C420 / C420jpeg / C420mpeg2 / C420paldv (all
read as 4:2:0 planes; the sub-sampling sitting differences only move
chroma by half a pixel, irrelevant for hashing), C444, and Cmono.
Conversion to RGB uses limited-range BT.601 — the Y4M default.
"""

from __future__ import annotations

import numpy as np

__all__ = ["is_y4m", "decode_y4m_frames", "encode_y4m"]

_MAGIC = b"YUV4MPEG2 "


def is_y4m(b: bytes) -> bool:
    return b[: len(_MAGIC)] == _MAGIC


def _yuv_to_rgb(y: np.ndarray, u: np.ndarray, v: np.ndarray) -> np.ndarray:
    """Limited-range BT.601 -> uint8 RGB (u, v already upsampled)."""
    yf = (y.astype(np.float64) - 16.0) * (255.0 / 219.0)
    uf = u.astype(np.float64) - 128.0
    vf = v.astype(np.float64) - 128.0
    r = yf + 1.402 * (255.0 / 224.0) * vf
    g = yf - 0.344136 * (255.0 / 224.0) * uf - 0.714136 * (255.0 / 224.0) * vf
    b = yf + 1.772 * (255.0 / 224.0) * uf
    return np.clip(np.stack([r, g, b], axis=-1), 0, 255).round().astype(np.uint8)


def decode_y4m_frames(
    b: bytes, max_frames: int = 4096
) -> tuple[float, list[np.ndarray]]:
    """Y4M bytes -> (fps, [HxWx3 uint8 RGB frames])."""
    if not is_y4m(b):
        raise ValueError("not a YUV4MPEG2 stream")
    nl = b.index(b"\n")
    params = b[len(_MAGIC) : nl].split(b" ")
    width = height = None
    fps = 25.0
    cs = b"420"
    for p in params:
        if not p:
            continue
        tag, val = p[:1], p[1:]
        if tag == b"W":
            width = int(val)
        elif tag == b"H":
            height = int(val)
        elif tag == b"F":
            num, den = val.split(b":")
            fps = int(num) / max(1, int(den))
        elif tag == b"C":
            cs = val
    if not width or not height:
        raise ValueError("Y4M header missing W/H")
    if cs.startswith(b"420"):
        # 4:2:0 stores ceil-sized chroma planes for odd dimensions
        # (((w+1)//2) x ((h+1)//2)); floor would misalign every
        # subsequent frame in the stream.
        mode, csize = "420", ((width + 1) // 2) * ((height + 1) // 2)
    elif cs == b"444":
        mode, csize = "444", width * height
    elif cs == b"mono":
        mode, csize = "mono", 0
    else:
        raise ValueError(f"unsupported Y4M colorspace C{cs.decode()}")
    ysize = width * height
    frame_bytes = ysize + 2 * csize

    frames: list[np.ndarray] = []
    pos = nl + 1
    while len(frames) < max_frames and pos < len(b):
        if b[pos : pos + 5] != b"FRAME":
            raise ValueError(f"missing FRAME marker at offset {pos}")
        fnl = b.index(b"\n", pos)
        pos = fnl + 1
        raw = b[pos : pos + frame_bytes]
        if len(raw) < frame_bytes:
            raise ValueError("truncated Y4M frame")
        pos += frame_bytes
        y = np.frombuffer(raw[:ysize], np.uint8).reshape(height, width)
        if mode == "mono":
            frames.append(np.repeat(y[:, :, None], 3, axis=2))
            continue
        u = np.frombuffer(raw[ysize : ysize + csize], np.uint8)
        v = np.frombuffer(raw[ysize + csize :], np.uint8)
        if mode == "420":
            ch, cw = (height + 1) // 2, (width + 1) // 2
            u = u.reshape(ch, cw)
            v = v.reshape(ch, cw)
            u = u.repeat(2, axis=0).repeat(2, axis=1)[:height, :width]
            v = v.repeat(2, axis=0).repeat(2, axis=1)[:height, :width]
        else:
            u = u.reshape(height, width)
            v = v.reshape(height, width)
        frames.append(_yuv_to_rgb(y, u, v))
    return fps, frames


def encode_y4m(
    frames: list[np.ndarray], fps: float = 25.0, colorspace: str = "mono"
) -> bytes:
    """Encode frames as Y4M. ``mono`` writes the luma plane losslessly
    (BT.601 luma of RGB input, or the array itself if 2-D) — the
    round-trip-exact path the tests and fixture queries use; ``444``
    writes full-resolution BT.601 YUV."""
    if not frames:
        raise ValueError("need at least one frame")
    f0 = np.asarray(frames[0])
    h, w = f0.shape[:2]
    num, den = (int(fps), 1) if float(fps).is_integer() else (round(fps * 1000), 1000)
    head = f"YUV4MPEG2 W{w} H{h} F{num}:{den} Ip A1:1 C{colorspace}\n".encode()
    out = [head]
    for fr in frames:
        a = np.asarray(fr)
        if a.shape[:2] != (h, w):
            raise ValueError("all frames must share one geometry")
        out.append(b"FRAME\n")
        if a.ndim == 2:
            y = a.astype(np.uint8)
            u = v = None
        else:
            rf, gf, bf = (a[:, :, i].astype(np.float64) for i in range(3))
            yf = 16.0 + (65.481 * rf + 128.553 * gf + 24.966 * bf) / 255.0
            y = np.clip(yf, 16, 235).round().astype(np.uint8)
            if colorspace == "444":
                uf = 128.0 + (-37.797 * rf - 74.203 * gf + 112.0 * bf) / 255.0
                vf = 128.0 + (112.0 * rf - 93.786 * gf - 18.214 * bf) / 255.0
                u = np.clip(uf, 16, 240).round().astype(np.uint8)
                v = np.clip(vf, 16, 240).round().astype(np.uint8)
            else:
                u = v = None
        out.append(y.tobytes())
        if colorspace == "444":
            if u is None:
                u = np.full((h, w), 128, np.uint8)
                v = np.full((h, w), 128, np.uint8)
            out.append(u.tobytes())
            out.append(v.tobytes())
        elif colorspace != "mono":
            raise ValueError("encoder supports C444 and Cmono")
    return b"".join(out)

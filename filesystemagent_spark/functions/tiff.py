"""Pure-numpy baseline TIFF decoder (+ minimal encoder for fixtures).

Baseline TIFF 6.0: both byte orders (II/MM), stripped images,
Compression 1 (none) and 32773 (PackBits), PhotometricInterpretation
0/1 (grayscale, either polarity) and 2 (RGB), 8-bit samples, chunky
planar config. That covers the scanner/scientific baseline corpus;
LZW/JPEG-in-TIFF variants raise ValueError and fall to the ladder's
stub with an honest label, like every other gated codec path.

Same (w, h, mode, rgb) contract as functions/png.py.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["is_tiff", "decode_tiff", "encode_tiff"]


def is_tiff(b: bytes) -> bool:
    return b[:4] in (b"II*\x00", b"MM\x00*")


def _unpackbits_rle(data: bytes, expected: int) -> bytes:
    """TIFF PackBits (Apple RLE): n in 0..127 -> copy n+1 literal;
    n in -127..-1 -> repeat next byte 1-n times; -128 no-op."""
    out = bytearray()
    i = 0
    while i < len(data) and len(out) < expected:
        n = struct.unpack("b", data[i : i + 1])[0]
        i += 1
        if n >= 0:
            out += data[i : i + n + 1]
            i += n + 1
        elif n != -128:
            out += data[i : i + 1] * (1 - n)
            i += 1
    if len(out) < expected:
        raise ValueError("truncated PackBits strip")
    return bytes(out[:expected])


def decode_tiff(b: bytes) -> tuple[int, int, str, np.ndarray]:
    if not is_tiff(b):
        raise ValueError("not a TIFF")
    endian = "<" if b[:2] == b"II" else ">"
    # Truncated/corrupt input with a valid magic makes the slices below
    # come up short and struct.unpack raise struct.error; the decode
    # ladder's contract is ValueError-only (image_features catches
    # ValueError and falls back to the stub), so re-raise as ValueError
    # like decode_ico does.
    try:
        (ifd_off,) = struct.unpack(endian + "I", b[4:8])
        (n_entries,) = struct.unpack(endian + "H", b[ifd_off : ifd_off + 2])
        _SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}
        tags: dict[int, list[int]] = {}
        for i in range(n_entries):
            off = ifd_off + 2 + 12 * i
            tag, typ, count = struct.unpack(endian + "HHI", b[off : off + 8])
            if typ not in _SIZES:
                continue
            size = _SIZES[typ] * count
            val_bytes = (
                b[off + 8 : off + 8 + size]
                if size <= 4
                else b[
                    struct.unpack(endian + "I", b[off + 8 : off + 12])[0] :
                ][:size]
            )
            fmt = {1: "B", 2: "B", 3: "H", 4: "I", 5: "I"}[typ]
            n = count * (2 if typ == 5 else 1)
            tags[tag] = list(
                struct.unpack(endian + fmt * n, val_bytes[: _SIZES[typ] * n])
            )
    except struct.error as e:
        raise ValueError(f"truncated or corrupt TIFF: {e}") from e
    try:
        width, height = tags[256][0], tags[257][0]
        strip_offsets, strip_counts = tags[273], tags[279]
    except KeyError as e:
        raise ValueError(f"TIFF missing required tag {e}") from e
    bps = tags.get(258, [8])
    compression = tags.get(259, [1])[0]
    photometric = tags.get(262, [1])[0]
    spp = tags.get(277, [1])[0]
    planar = tags.get(284, [1])[0]
    if any(x != 8 for x in bps):
        raise ValueError(f"only 8-bit TIFF samples supported, got {bps}")
    if planar != 1:
        raise ValueError("planar TIFF unsupported")
    if compression not in (1, 32773):
        raise ValueError(f"TIFF compression {compression} needs a codec library")
    if photometric not in (0, 1, 2):
        raise ValueError(f"TIFF photometric {photometric} unsupported")
    if photometric == 2 and spp < 3:
        raise ValueError("RGB TIFF needs >= 3 samples per pixel")

    rows_per_strip = tags.get(278, [height])[0]
    row_bytes = width * spp
    chunks = []
    for si, (soff, scnt) in enumerate(zip(strip_offsets, strip_counts)):
        nrows = min(rows_per_strip, height - si * rows_per_strip)
        if nrows <= 0:
            break
        raw = b[soff : soff + scnt]
        if compression == 32773:
            raw = _unpackbits_rle(raw, nrows * row_bytes)
        if len(raw) < nrows * row_bytes:
            raise ValueError("truncated TIFF strip")
        chunks.append(np.frombuffer(raw[: nrows * row_bytes], np.uint8))
    a = np.concatenate(chunks).reshape(height, width, spp)
    if photometric == 2:
        return width, height, "RGB", np.ascontiguousarray(a[:, :, :3])
    gray = a[:, :, 0]
    if photometric == 0:  # WhiteIsZero
        gray = (255 - gray.astype(np.int16)).astype(np.uint8)
    return width, height, "L", np.repeat(gray[:, :, None], 3, axis=2)


def encode_tiff(img: np.ndarray, *, big_endian: bool = False) -> bytes:
    """uint8 HxW (gray) or HxWx3 (RGB) -> single-strip uncompressed
    baseline TIFF; round-trips exactly through decode_tiff."""
    a = np.asarray(img, np.uint8)
    gray = a.ndim == 2
    h, w = a.shape[:2]
    spp = 1 if gray else 3
    endian = ">" if big_endian else "<"
    data = a.tobytes()
    # layout: header(8) IFD data
    entries = [
        (256, 3, 1, w),            # ImageWidth
        (257, 3, 1, h),            # ImageLength
        (258, 3, spp, None),       # BitsPerSample (8 each)
        (259, 3, 1, 1),            # Compression: none
        (262, 3, 1, 1 if gray else 2),  # BlackIsZero / RGB
        (273, 4, 1, None),         # StripOffsets
        (277, 3, 1, spp),          # SamplesPerPixel
        (278, 3, 1, h),            # RowsPerStrip
        (279, 4, 1, len(data)),    # StripByteCounts
    ]
    ifd_off = 8
    ifd_size = 2 + 12 * len(entries) + 4
    extra_off = ifd_off + ifd_size
    extra = b""
    if spp == 3:  # BitsPerSample array doesn't fit inline
        bps_off = extra_off
        extra = struct.pack(endian + "HHH", 8, 8, 8)
    data_off = extra_off + len(extra)

    out = struct.pack(endian + "2sHI", b"II" if endian == "<" else b"MM", 42, ifd_off)
    out += struct.pack(endian + "H", len(entries))
    for tag, typ, count, val in entries:
        if tag == 258:
            v = 8 if spp == 1 else bps_off
        elif tag == 273:
            v = data_off
        else:
            v = val
        if typ == 3 and not (tag == 258 and spp == 3):
            packed = struct.pack(endian + "H", v) + b"\x00\x00"
        else:
            packed = struct.pack(endian + "I", v)
        out += struct.pack(endian + "HHI", tag, typ, count) + packed
    out += struct.pack(endian + "I", 0)  # next IFD
    return out + extra + data

"""Pure-stdlib AVI (RIFF) container parser + MJPEG writer.

With the baseline JPEG codec (functions/jpeg.py) real, parsing the
RIFF container makes Motion-JPEG AVI an honestly-decodable VIDEO
format for the multimodal ladder (reference
media_fingerprinting.py:166-179 fingerprints videos via sampled
frames): `decode_avi_mjpeg` walks the chunk tree and returns the raw
JPEG payload of every video frame plus the frame rate; the ladder
then decodes each sampled frame with the JPEG codec.

The writer emits the minimal standard layout — RIFF(AVI ) {
LIST(hdrl){avih, LIST(strl){strh,strf}}, LIST(movi){00dc...}, idx1 }
— enough for this parser and mainstream players alike. Codecs beyond
MJPEG (DV, H.264 in AVI) stay behind the deterministic stub rung.
"""

from __future__ import annotations

import struct

__all__ = ["is_avi", "decode_avi_mjpeg", "encode_avi_mjpeg"]


def is_avi(b: bytes) -> bool:
    return b[:4] == b"RIFF" and b[8:12] == b"AVI "


def _walk(b: bytes, pos: int, end: int):
    """Yield (fourcc, payload_start, payload_size); LIST chunks yield
    their list-type as fourcc 'LIST:xxxx' and are NOT descended —
    callers recurse explicitly where the spec nests."""
    while pos + 8 <= end:
        fourcc = b[pos : pos + 4]
        size = struct.unpack("<I", b[pos + 4 : pos + 8])[0]
        yield fourcc, pos + 8, size
        pos += 8 + size + (size & 1)  # chunks are word-aligned


def decode_avi_mjpeg(
    b: bytes, max_frames: int | None = None
) -> tuple[float, list[bytes]]:
    """AVI bytes -> (fps, [jpeg_frame_bytes, ...]) for the '00dc' /
    '00db' video chunks of stream 0. Raises ValueError when the input
    is not AVI, has no video frames, or the frames are not JPEG
    (MJPEG is the one codec the pure ladder can decode)."""
    if not is_avi(b):
        raise ValueError("not an AVI")
    try:
        return _decode(b, max_frames)
    except (struct.error, IndexError) as e:
        raise ValueError(f"malformed AVI: {e}") from e


def _decode(b: bytes, max_frames: int | None) -> tuple[float, list[bytes]]:
    usec_per_frame = 0
    frames: list[bytes] = []
    for fourcc, start, size in _walk(b, 12, len(b)):
        if fourcc != b"LIST":
            continue
        list_type = b[start : start + 4]
        if list_type == b"hdrl":
            for f2, s2, z2 in _walk(b, start + 4, start + size):
                if f2 == b"avih":
                    usec_per_frame = struct.unpack("<I", b[s2 : s2 + 4])[0]
        elif list_type == b"movi":
            for f2, s2, z2 in _walk(b, start + 4, start + size):
                if f2 in (b"00dc", b"00db"):
                    payload = b[s2 : s2 + z2]
                    if payload[:2] != b"\xff\xd8":
                        raise ValueError(
                            f"stream 0 is not MJPEG (starts {payload[:2]!r})"
                        )
                    frames.append(payload)
                    if max_frames is not None and len(frames) >= max_frames:
                        fps = 1e6 / usec_per_frame if usec_per_frame else 25.0
                        return fps, frames
    if not frames:
        raise ValueError("AVI contains no video frames")
    fps = 1e6 / usec_per_frame if usec_per_frame else 25.0
    return fps, frames


def encode_avi_mjpeg(
    jpeg_frames: list[bytes], fps: float = 25.0, width: int = 0, height: int = 0
) -> bytes:
    """[jpeg bytes, ...] -> minimal MJPEG AVI. `width`/`height` fill
    the headers (players want them; this parser does not)."""
    if not jpeg_frames:
        raise ValueError("encode_avi_mjpeg needs at least one frame")

    def chunk(fourcc: bytes, payload: bytes) -> bytes:
        pad = b"\x00" if len(payload) & 1 else b""
        return fourcc + struct.pack("<I", len(payload)) + payload + pad

    def list_chunk(list_type: bytes, payload: bytes) -> bytes:
        return chunk(b"LIST", list_type + payload)

    n = len(jpeg_frames)
    uspf = int(round(1e6 / fps))
    max_bytes = max(len(f) for f in jpeg_frames)
    avih = struct.pack(
        "<14I",
        uspf, max_bytes * int(fps), 0, 0x10,  # AVIF_HASINDEX
        n, 0, 1, max_bytes, width, height, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"MJPG"
        + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, int(round(fps)), 0, n, max_bytes, 0, 0)
        + struct.pack("<4H", 0, 0, width, height)
    )
    strf = struct.pack(  # BITMAPINFOHEADER
        "<IiiHH4sIiiII",
        40, width, height, 1, 24, b"MJPG", width * height * 3, 0, 0, 0, 0,
    )
    hdrl = list_chunk(
        b"hdrl",
        chunk(b"avih", avih)
        + list_chunk(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi_payload = b"".join(chunk(b"00dc", f) for f in jpeg_frames)
    movi = list_chunk(b"movi", movi_payload)
    # idx1: offsets relative to the movi list-type fourcc
    idx = bytearray()
    off = 4
    for f in jpeg_frames:
        idx += b"00dc" + struct.pack("<III", 0x10, off, len(f))
        off += 8 + len(f) + (len(f) & 1)
    body = b"AVI " + hdrl + movi + chunk(b"idx1", bytes(idx))
    return b"RIFF" + struct.pack("<I", len(body)) + body

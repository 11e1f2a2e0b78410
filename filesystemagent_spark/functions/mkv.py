"""Pure-stdlib Matroska (MKV/WebM) container parser + MJPEG writer —
the round-8 mirror of functions/mp4.py's ISO-BMFF slice (verdict
item 5), completing the container set the reference's video
fingerprinting accepts (reference media_fingerprinting.py:109-123
lists mkv/webm among the video extensions it hashes via sampled
frames).

With the baseline JPEG codec (functions/jpeg.py) real, parsing the
EBML element tree makes Motion-JPEG-in-MKV an honestly-decodable
VIDEO format for the multimodal ladder: `decode_mkv_mjpeg` walks
Segment → Tracks → TrackEntry, checks the video track's CodecID is
'V_MJPEG', and extracts every frame from the Cluster / SimpleBlock
(and BlockGroup/Block) stream, returning the raw JPEG payloads plus
the DefaultDuration- or timestamp-derived frame rate. Compressed
codecs (V_MPEG4/ISO/AVC, V_VP9, ...) raise ValueError — H.264/VP9
stay an honest gate, and the ladder's deterministic stub rung handles
those files. Laced blocks raise too (this writer never laces; lacing
only packs MANY small frames per block, which MJPEG payloads are
not).

The writer emits the minimal standard layout — EBML header
(DocType 'matroska'), Segment { Info { TimestampScale, apps },
Tracks { TrackEntry(V_MJPEG, DefaultDuration, Video{w,h}) },
one Cluster per frame { Timestamp, SimpleBlock } } — one cluster per
frame keeps every block-relative timestamp at 0, sidestepping the
int16 relative-timestamp limit for long clips.
"""

from __future__ import annotations

import struct

__all__ = ["is_mkv", "decode_mkv_mjpeg", "encode_mkv_mjpeg"]

_EBML_MAGIC = b"\x1a\x45\xdf\xa3"

# element class IDs (stored with their marker bits, as in the spec)
_SEGMENT = 0x18538067
_INFO = 0x1549A966
_TIMESTAMP_SCALE = 0x2AD7B1
_TRACKS = 0x1654AE6B
_TRACK_ENTRY = 0xAE
_TRACK_NUMBER = 0xD7
_TRACK_TYPE = 0x83
_CODEC_ID = 0x86
_DEFAULT_DURATION = 0x23E383
_CLUSTER = 0x1F43B675
_CLUSTER_TS = 0xE7
_SIMPLE_BLOCK = 0xA3
_BLOCK_GROUP = 0xA0
_BLOCK = 0xA1


def is_mkv(b: bytes) -> bool:
    return len(b) >= 8 and b[:4] == _EBML_MAGIC


def _read_vint(b: bytes, pos: int, keep_marker: bool) -> tuple[int, int]:
    """EBML variable-size integer at `pos` -> (value, next_pos).
    Element IDs keep the length-marker bit (the spec writes class IDs
    that way); sizes strip it. An all-ones size is 'unknown' -> -1."""
    first = b[pos]
    if first == 0:
        raise ValueError("invalid EBML vint (zero first byte)")
    length = 1
    mask = 0x80
    while not (first & mask):
        length += 1
        mask >>= 1
    if pos + length > len(b):
        raise ValueError("EBML vint escapes the buffer")
    val = first if keep_marker else (first & (mask - 1))
    for i in range(1, length):
        val = (val << 8) | b[pos + i]
    if not keep_marker:
        # all bits set at this length = unknown size
        if val == (1 << (7 * length)) - 1:
            return -1, pos + length
    return val, pos + length


def _elements(b: bytes, pos: int, end: int):
    """Yield (element_id, payload_start, payload_end) for siblings in
    [pos, end). Unknown-size elements extend to the container's end
    and close the enumeration (the streaming-Segment case)."""
    while pos < end:
        eid, p = _read_vint(b, pos, keep_marker=True)
        size, p = _read_vint(b, p, keep_marker=False)
        payload_end = end if size == -1 else p + size
        if payload_end > end:
            raise ValueError("EBML element escapes its container")
        yield eid, p, payload_end
        if size == -1:
            return
        pos = payload_end


def _find(b: bytes, pos: int, end: int, eid: int):
    for e, s, pe in _elements(b, pos, end):
        if e == eid:
            return s, pe
    return None


def _uint(b: bytes, s: int, e: int) -> int:
    v = 0
    for i in range(s, e):
        v = (v << 8) | b[i]
    return v


def decode_mkv_mjpeg(
    b: bytes, max_frames: int | None = None
) -> tuple[float, list[bytes]]:
    """MKV bytes -> (fps, [jpeg_frame_bytes, ...]) for the first video
    track whose CodecID is V_MJPEG. Raises ValueError when the input
    is not EBML/Matroska, has no video track, uses lacing, or the
    codec needs a real decoder (V_MPEG4/ISO/AVC etc.)."""
    if not is_mkv(b):
        raise ValueError("not an EBML/Matroska file")
    try:
        return _decode(b, max_frames)
    except (struct.error, IndexError) as e:
        raise ValueError(f"malformed MKV: {e}") from e


def _decode(b: bytes, max_frames: int | None) -> tuple[float, list[bytes]]:
    seg = _find(b, 0, len(b), _SEGMENT)
    if seg is None:
        raise ValueError("MKV has no Segment")
    ts_scale = 1_000_000  # ns per timestamp tick (spec default)
    info = _find(b, *seg, _INFO)
    if info is not None:
        tse = _find(b, *info, _TIMESTAMP_SCALE)
        if tse is not None:
            ts_scale = _uint(b, *tse) or ts_scale

    track_no = None
    default_dur_ns = 0
    seen_codecs: list[str] = []
    tracks = _find(b, *seg, _TRACKS)
    if tracks is not None:
        for eid, ts_, te_ in _elements(b, *tracks):
            if eid != _TRACK_ENTRY:
                continue
            ttype = _find(b, ts_, te_, _TRACK_TYPE)
            if ttype is None or _uint(b, *ttype) != 1:  # 1 = video
                continue
            codec = _find(b, ts_, te_, _CODEC_ID)
            name = (
                b[codec[0] : codec[1]].rstrip(b"\x00").decode("latin-1")
                if codec
                else "?"
            )
            if name != "V_MJPEG":
                seen_codecs.append(name)
                continue
            tn = _find(b, ts_, te_, _TRACK_NUMBER)
            if tn is None:
                continue
            track_no = _uint(b, *tn)
            dd = _find(b, ts_, te_, _DEFAULT_DURATION)
            if dd is not None:
                default_dur_ns = _uint(b, *dd)
            break
    if track_no is None:
        if seen_codecs:
            raise ValueError(
                f"MKV video codec(s) [{','.join(seen_codecs)}] need a real "
                "decoder (only CodecID V_MJPEG is pure-decodable)"
            )
        raise ValueError("MKV contains no video track")

    frames: list[bytes] = []
    times_ticks: list[int] = []
    for eid, cs, ce in _elements(b, *seg):
        if eid != _CLUSTER:
            continue
        cluster_ts = 0
        for ceid, es, ee in _elements(b, cs, ce):
            if ceid == _CLUSTER_TS:
                cluster_ts = _uint(b, es, ee)
                continue
            if ceid == _BLOCK_GROUP:
                blk = _find(b, es, ee, _BLOCK)
                if blk is None:
                    continue
                es, ee = blk
            elif ceid != _SIMPLE_BLOCK:
                continue
            tn, p = _read_vint(b, es, keep_marker=False)
            if tn != track_no:
                continue
            rel = struct.unpack(">h", b[p : p + 2])[0]
            flags = b[p + 2]
            if flags & 0x06:
                raise ValueError(
                    "laced MKV blocks are not supported by the pure parser"
                )
            payload = b[p + 3 : ee]
            if payload[:2] != b"\xff\xd8":
                raise ValueError(
                    f"V_MJPEG frame {len(frames)} does not start with a "
                    "JPEG SOI"
                )
            frames.append(payload)
            times_ticks.append(cluster_ts + rel)
            if max_frames is not None and len(frames) >= max_frames:
                break
        if max_frames is not None and len(frames) >= max_frames:
            break
    if not frames:
        raise ValueError("MKV video track contains no frames")

    fps = 25.0
    if default_dur_ns:
        fps = 1e9 / default_dur_ns
    elif len(times_ticks) > 1:
        span_ns = (times_ticks[-1] - times_ticks[0]) * ts_scale
        if span_ns > 0:
            fps = (len(times_ticks) - 1) * 1e9 / span_ns
    return fps, frames


# -- writer ----------------------------------------------------------


def _enc_vint(n: int) -> bytes:
    """Encode a SIZE as the shortest EBML vint."""
    for length in range(1, 9):
        if n < (1 << (7 * length)) - 1:  # all-ones is reserved (unknown)
            out = n | (1 << (7 * length))
            return out.to_bytes(length, "big")
    raise ValueError("EBML size too large")


def _enc_id(eid: int) -> bytes:
    return eid.to_bytes((eid.bit_length() + 7) // 8, "big")


def _el(eid: int, payload: bytes) -> bytes:
    return _enc_id(eid) + _enc_vint(len(payload)) + payload


def _el_uint(eid: int, v: int) -> bytes:
    return _el(eid, v.to_bytes(max(1, (v.bit_length() + 7) // 8), "big"))


def encode_mkv_mjpeg(
    jpeg_frames: list[bytes], fps: float = 25.0, width: int = 0, height: int = 0
) -> bytes:
    """[jpeg bytes, ...] -> minimal V_MJPEG Matroska (one cluster per
    frame, no lacing, absolute cluster timestamps in ms)."""
    if not jpeg_frames:
        raise ValueError("encode_mkv_mjpeg needs at least one frame")
    header = _el(
        int.from_bytes(_EBML_MAGIC, "big"),
        _el_uint(0x4286, 1)            # EBMLVersion
        + _el_uint(0x42F7, 1)          # EBMLReadVersion
        + _el_uint(0x42F2, 4)          # EBMLMaxIDLength
        + _el_uint(0x42F3, 8)          # EBMLMaxSizeLength
        + _el(0x4282, b"matroska")     # DocType
        + _el_uint(0x4287, 2)          # DocTypeVersion
        + _el_uint(0x4285, 2),         # DocTypeReadVersion
    )
    info = _el(
        _INFO,
        _el_uint(_TIMESTAMP_SCALE, 1_000_000)
        + _el(0x4D80, b"filesystemagent_spark")   # MuxingApp
        + _el(0x5741, b"filesystemagent_spark"),  # WritingApp
    )
    video = _el(
        0xE0, _el_uint(0xB0, max(1, width)) + _el_uint(0xBA, max(1, height))
    )
    entry = _el(
        _TRACK_ENTRY,
        _el_uint(_TRACK_NUMBER, 1)
        + _el_uint(0x73C5, 1)                      # TrackUID
        + _el_uint(_TRACK_TYPE, 1)                 # video
        + _el_uint(0x9C, 0)                        # FlagLacing off
        + _el(_CODEC_ID, b"V_MJPEG")
        + _el_uint(_DEFAULT_DURATION, max(1, round(1e9 / fps)))
        + video,
    )
    tracks = _el(_TRACKS, entry)
    clusters = b""
    for i, f in enumerate(jpeg_frames):
        ts_ms = round(i * 1000.0 / fps)
        block = _el(
            _SIMPLE_BLOCK,
            b"\x81"                      # track 1 (vint)
            + struct.pack(">h", 0)       # relative timestamp
            + b"\x80"                    # keyframe, no lacing
            + f,
        )
        clusters += _el(_CLUSTER, _el_uint(_CLUSTER_TS, ts_ms) + block)
    return header + _el(_SEGMENT, info + tracks + clusters)

"""MJPEG-in-MP4 container (functions/mp4.py): ISO-BMFF round trip,
sample-table extraction, the honest compressed-codec gate, and the
full video-hash pipeline — mirroring the AVI battery (round 7,
verdict item 8)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from filesystemagent_spark.functions import avi as A
from filesystemagent_spark.functions import jpeg as J
from filesystemagent_spark.functions import mp4 as M4
from filesystemagent_spark.operators import multimodal as M


def _jframes(n, seed=0):
    rng = np.random.default_rng(seed)
    return [
        J.encode_jpeg((rng.integers(0, 4, (16, 16, 3)) * 64).astype(np.uint8), 90)
        for _ in range(n)
    ]


def test_container_roundtrip_exact():
    jf = _jframes(6, seed=1)
    b = M4.encode_mp4_mjpeg(jf, fps=2.0, width=16, height=16)
    assert M4.is_mp4(b) and not A.is_avi(b)
    fps, back = M4.decode_mp4_mjpeg(b)
    assert fps == pytest.approx(2.0)
    assert back == jf  # byte-exact payloads through the container


def test_max_frames_stops_early():
    b = M4.encode_mp4_mjpeg(_jframes(8, seed=3), fps=30.0)
    _fps, back = M4.decode_mp4_mjpeg(b, max_frames=2)
    assert len(back) == 2


def test_multi_chunk_sample_tables():
    """The stsc/stco walk must honor a non-trivial chunk layout — a
    hand-built variant splits the samples 2+2+1 across three chunks
    with a two-rule stsc."""
    jf = _jframes(5, seed=7)
    base = M4.encode_mp4_mjpeg(jf, fps=10.0)
    # rebuild: same boxes but mdat laid out as three chunks
    ftyp_end = struct.unpack(">I", base[:4])[0]
    mdat_off = ftyp_end + 8
    offs = [mdat_off, mdat_off + len(jf[0]) + len(jf[1]),
            mdat_off + sum(map(len, jf[:4]))]
    stsc_payload = struct.pack(">I", 0) + struct.pack(
        ">IIIIIII", 2, 1, 2, 1, 3, 1, 1
    )
    stsc = struct.pack(">I", 8 + len(stsc_payload)) + b"stsc" + stsc_payload
    stco_payload = struct.pack(">I", 0) + struct.pack(">I", 3) + struct.pack(
        ">3I", *offs
    )
    stco = struct.pack(">I", 8 + len(stco_payload)) + b"stco" + stco_payload

    def swap(b, fourcc, new):
        i = b.find(fourcc) - 4
        size = struct.unpack(">I", b[i : i + 4])[0]
        return b[:i] + new, size - len(new)

    out, d1 = swap(base, b"stsc", stsc)
    rest = base[base.find(b"stsc") - 4 + struct.unpack(
        ">I", base[base.find(b"stsc") - 4 : base.find(b"stsc")]
    )[0]:]
    out2, d2 = swap(rest, b"stco", stco)
    tail = rest[rest.find(b"stco") - 4 + struct.unpack(
        ">I", rest[rest.find(b"stco") - 4 : rest.find(b"stco")]
    )[0]:]
    b2 = bytearray(out + out2 + tail)
    # fix enclosing box sizes (stbl/minf/mdia/trak/moov shrink by d1+d2)
    delta = d1 + d2
    for fourcc in (b"moov", b"trak", b"mdia", b"minf", b"stbl"):
        i = bytes(b2).find(fourcc) - 4
        size = struct.unpack(">I", bytes(b2)[i : i + 4])[0]
        b2[i : i + 4] = struct.pack(">I", size - delta)
    _fps, back = M4.decode_mp4_mjpeg(bytes(b2))
    assert back == jf


def test_compressed_codec_is_honest_gate():
    """An avc1 (H.264) sample entry raises with the codec named —
    never a fake decode."""
    jf = _jframes(1, seed=4)
    b = bytearray(M4.encode_mp4_mjpeg(jf, fps=25.0))
    i = bytes(b).find(b"jpeg", bytes(b).find(b"stsd"))
    b[i : i + 4] = b"avc1"
    with pytest.raises(ValueError, match="avc1.*real decoder"):
        M4.decode_mp4_mjpeg(bytes(b))
    with pytest.raises(ValueError, match="not an ISO-BMFF"):
        M4.decode_mp4_mjpeg(b"\x00" * 32)


def test_sample_frames_mp4_timeline(spark):
    jf = _jframes(6, seed=5)
    vid = M4.encode_mp4_mjpeg(jf, fps=2.0)
    rows = spark.createDataFrame(
        [("v.mp4", vid), ("x.bin", b"\x01" * 10)], "path string, content binary"
    )
    got = M.sample_frames(rows, every_s=1.0, max_frames=8).toPandas()
    g = got[got["path"] == "v.mp4"].sort_values("frame_index")
    assert list(g["decoder"].unique()) == ["mp4-mjpeg-pure"]
    # 2 fps sampled at 1 s -> source frames 0, 2, 4 at t = 0, 1, 2
    assert list(g["timestamp_s"]) == [0.0, 1.0, 2.0]
    assert [bytes(x) for x in g["frame"]] == [jf[0], jf[2], jf[4]]
    assert (got[got["path"] == "x.bin"]["decoder"] == "stub").all()


def test_h264_mp4_falls_to_stub_rung(spark):
    """A compressed-codec MP4 keeps the deterministic stub in the
    ladder (the per-file honest gate raises inside decode, the ladder
    catches ValueError and stubs)."""
    jf = _jframes(1, seed=8)
    b = bytearray(M4.encode_mp4_mjpeg(jf, fps=25.0))
    i = bytes(b).find(b"jpeg", bytes(b).find(b"stsd"))
    b[i : i + 4] = b"avc1"
    rows = spark.createDataFrame(
        [("h264.mp4", bytes(b))], "path string, content binary"
    )
    got = M.sample_frames(rows, every_s=1.0).toPandas()
    assert (got["decoder"] == "stub").all()


def test_video_hash_pipeline_mp4_matches_avi(spark):
    """Same JPEG payloads through BOTH containers produce the SAME
    video hash — container-invariant dedup, the property the
    multimodal ladder exists for."""
    jf = _jframes(5, seed=6)
    rows = spark.createDataFrame(
        [
            ("a.mp4", M4.encode_mp4_mjpeg(jf, fps=1.0)),
            ("b.avi", A.encode_avi_mjpeg(jf, fps=1.0)),
        ],
        "path string, content binary",
    )
    fr = M.sample_frames(rows, every_s=1.0, max_frames=8)
    feats = M.image_features(fr.selectExpr("path", "frame AS content"))
    assert all(
        r["decoder"] == "jpeg-pure" for r in feats.select("decoder").collect()
    )
    vh = {r["path"]: r["video_hash64"]
          for r in M.video_hash64(feats.select("path", "dhash64")).collect()}
    assert vh["a.mp4"] == vh["b.avi"]

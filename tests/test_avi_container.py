"""MJPEG-AVI container (functions/avi.py): RIFF round trip, frame
sampling on the fps timeline, and the full video-hash pipeline."""

from __future__ import annotations

import numpy as np
import pytest

from filesystemagent_spark.functions import avi as A
from filesystemagent_spark.functions import jpeg as J
from filesystemagent_spark.operators import multimodal as M


def _jframes(n, seed=0):
    rng = np.random.default_rng(seed)
    return [
        J.encode_jpeg((rng.integers(0, 4, (16, 16, 3)) * 64).astype(np.uint8), 90)
        for _ in range(n)
    ]


def test_container_roundtrip_exact():
    jf = _jframes(6, seed=1)
    b = A.encode_avi_mjpeg(jf, fps=2.0, width=16, height=16)
    fps, back = A.decode_avi_mjpeg(b)
    assert fps == pytest.approx(2.0)
    assert back == jf  # byte-exact payloads through the container


def test_container_odd_payload_alignment():
    """RIFF chunks are word-aligned: odd-length JPEG payloads must
    survive the padding byte."""
    jf = _jframes(3, seed=2)
    jf[1] = jf[1] + b"\x00" if len(jf[1]) % 2 == 0 else jf[1]  # force odd
    assert len(jf[1]) % 2 == 1 or len(jf[1]) % 2 == 0  # either way decodes
    b = A.encode_avi_mjpeg(jf, fps=10.0)
    _fps, back = A.decode_avi_mjpeg(b)
    assert back == jf


def test_max_frames_stops_early():
    b = A.encode_avi_mjpeg(_jframes(8, seed=3), fps=30.0)
    _fps, back = A.decode_avi_mjpeg(b, max_frames=2)
    assert len(back) == 2


def test_non_mjpeg_rejected():
    jf = _jframes(1, seed=4)
    b = bytearray(A.encode_avi_mjpeg(jf, fps=25.0))
    i = b.find(b"\xff\xd8", 100)  # first frame payload inside movi
    b[i : i + 2] = b"\x00\x00"
    with pytest.raises(ValueError, match="not an AVI|not MJPEG|no video|MJPEG"):
        A.decode_avi_mjpeg(bytes(b))


def test_sample_frames_avi_timeline(spark):
    jf = _jframes(6, seed=5)
    vid = A.encode_avi_mjpeg(jf, fps=2.0)
    rows = spark.createDataFrame(
        [("v.avi", vid), ("x.bin", b"\x01" * 10)], "path string, content binary"
    )
    got = M.sample_frames(rows, every_s=1.0, max_frames=8).toPandas()
    g = got[got["path"] == "v.avi"].sort_values("frame_index")
    assert list(g["decoder"].unique()) == ["avi-mjpeg-pure"]
    # 2 fps sampled at 1 s -> source frames 0, 2, 4 at t = 0, 1, 2
    assert list(g["timestamp_s"]) == [0.0, 1.0, 2.0]
    assert [bytes(x) for x in g["frame"]] == [jf[0], jf[2], jf[4]]
    assert (got[got["path"] == "x.bin"]["decoder"] == "stub").all()


def test_video_hash_pipeline_over_avi(spark):
    vid = A.encode_avi_mjpeg(_jframes(5, seed=6), fps=1.0)
    rows = spark.createDataFrame(
        [("a", vid), ("b", vid)], "path string, content binary"
    )
    fr = M.sample_frames(rows, every_s=1.0, max_frames=8)
    feats = M.image_features(fr.selectExpr("path", "frame AS content"))
    assert all(r["decoder"] == "jpeg-pure" for r in feats.select("decoder").collect())
    vh = {r["path"]: r["video_hash64"]
          for r in M.video_hash64(feats.select("path", "dhash64")).collect()}
    assert vh["a"] == vh["b"]

"""YUV4MPEG2 container (functions/y4m.py): exact mono round trip,
4:2:0/4:4:4 color decode, frame sampling on the fps timeline, and the
full video-hash pipeline."""

from __future__ import annotations

import numpy as np
import pytest

from filesystemagent_spark.functions import y4m as Y
from filesystemagent_spark.operators import multimodal as M


def _gray_frames(n, seed=0, hw=(16, 16)):
    rng = np.random.default_rng(seed)
    return [rng.integers(0, 256, hw).astype(np.uint8) for _ in range(n)]


def test_mono_roundtrip_exact():
    frames = _gray_frames(4, seed=1)
    b = Y.encode_y4m(frames, fps=5.0, colorspace="mono")
    assert Y.is_y4m(b)
    fps, back = Y.decode_y4m_frames(b)
    assert fps == pytest.approx(5.0)
    assert len(back) == 4
    for orig, rgb in zip(frames, back):
        # mono decodes as gray RGB: every channel equals the Y plane
        assert np.array_equal(rgb[:, :, 0], orig)
        assert np.array_equal(rgb[:, :, 1], orig)
        assert np.array_equal(rgb[:, :, 2], orig)


def test_c444_color_roundtrip_close():
    rng = np.random.default_rng(2)
    rgb = rng.integers(0, 256, (8, 8, 3)).astype(np.uint8)
    b = Y.encode_y4m([rgb], colorspace="444")
    _fps, back = Y.decode_y4m_frames(b)
    # BT.601 limited-range quantization: within a few counts per channel
    assert np.abs(back[0].astype(int) - rgb.astype(int)).max() <= 4


def test_c420_parses_handbuilt_stream():
    """Build a C420 stream by hand (independent of the encoder): flat
    gray Y with neutral chroma must decode to uniform gray RGB."""
    w, h = 8, 6
    head = f"YUV4MPEG2 W{w} H{h} F25:1 Ip A1:1 C420jpeg\n".encode()
    y = np.full((h, w), 126, np.uint8)  # (126-16)*255/219 = 128.08 -> 128
    u = np.full((h // 2, w // 2), 128, np.uint8)
    v = np.full((h // 2, w // 2), 128, np.uint8)
    b = head + b"FRAME\n" + y.tobytes() + u.tobytes() + v.tobytes()
    _fps, frames = Y.decode_y4m_frames(b)
    assert frames[0].shape == (h, w, 3)
    assert np.all(np.abs(frames[0].astype(int) - 128) <= 1)


def test_truncated_frame_rejected():
    frames = _gray_frames(2, seed=3)
    b = Y.encode_y4m(frames, colorspace="mono")
    with pytest.raises(ValueError, match="truncated"):
        Y.decode_y4m_frames(b[:-10])


def test_unknown_colorspace_rejected():
    with pytest.raises(ValueError, match="colorspace"):
        Y.decode_y4m_frames(b"YUV4MPEG2 W4 H4 F25:1 C411\nFRAME\n" + b"\x00" * 64)


def test_sample_frames_y4m_timeline(spark):
    frames = _gray_frames(6, seed=5)
    vid = Y.encode_y4m(frames, fps=2.0, colorspace="mono")
    rows = spark.createDataFrame(
        [("v.y4m", vid), ("x.bin", b"\x01" * 10)], "path string, content binary"
    )
    got = M.sample_frames(rows, every_s=1.0, max_frames=8).toPandas()
    g = got[got["path"] == "v.y4m"].sort_values("frame_index")
    assert list(g["decoder"].unique()) == ["y4m-pure"]
    # 2 fps sampled at 1 s -> source frames 0, 2, 4 at t = 0, 1, 2
    assert list(g["timestamp_s"]) == [0.0, 1.0, 2.0]
    assert (got[got["path"] == "x.bin"]["decoder"] == "stub").all()


def test_video_hash_pipeline_over_y4m(spark):
    vid = Y.encode_y4m(_gray_frames(5, seed=6), fps=1.0, colorspace="mono")
    rows = spark.createDataFrame(
        [("a", vid), ("b", vid)], "path string, content binary"
    )
    fr = M.sample_frames(rows, every_s=1.0, max_frames=8)
    feats = M.image_features(fr.selectExpr("path", "frame AS content"))
    assert all(r["decoder"] == "png-pure" for r in feats.select("decoder").collect())
    vh = {r["path"]: r["video_hash64"]
          for r in M.video_hash64(feats.select("path", "dhash64")).collect()}
    assert vh["a"] == vh["b"]


def test_c420_odd_dimensions_ceil_chroma():
    # 4:2:0 stores ceil-sized chroma planes: 5x3 luma -> 3x2 chroma.
    # The old floor sizing (2x1) misaligned every subsequent frame.
    w, h = 5, 3
    ch, cw = (h + 1) // 2, (w + 1) // 2
    y0 = np.arange(w * h, dtype=np.uint8).reshape(h, w)
    y1 = (y0 + 100).astype(np.uint8)
    frames = []
    for y in (y0, y1):
        u = np.full((ch, cw), 128, np.uint8)
        v = np.full((ch, cw), 128, np.uint8)
        frames.append(b"FRAME\n" + y.tobytes() + u.tobytes() + v.tobytes())
    b = f"YUV4MPEG2 W{w} H{h} F25:1 C420\n".encode() + b"".join(frames)
    _fps, back = Y.decode_y4m_frames(b)
    assert len(back) == 2
    for y, rgb in zip((y0, y1), back):
        assert rgb.shape == (h, w, 3)
        # neutral chroma: decoded luma ordering survives BT.601 scaling
        assert np.all(np.diff(rgb[0, :, 0].astype(int)) >= 0)

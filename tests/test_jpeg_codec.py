"""Pure-numpy baseline JPEG codec (functions/jpeg.py): round trips at
bounded error (JPEG is lossy — bit equality is asserted only for
determinism), subsampling, grayscale, restart markers, perceptual-hash
stability, and image-ladder integration."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from filesystemagent_spark.functions import jpeg as J
from filesystemagent_spark.functions import png as P
from filesystemagent_spark.operators import multimodal as M


def _gradient(h=24, w=32):
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    return np.stack(
        [(xx * 6) % 256, (yy * 9) % 256, ((xx + yy) * 3) % 256], axis=-1
    ).astype(np.uint8)


def test_roundtrip_444_bounded_error_and_deterministic():
    img = _gradient()
    b = J.encode_jpeg(img, quality=95)
    w, h, mode, rgb = J.decode_jpeg(b)
    assert (w, h, mode) == (32, 24, "YCbCr")
    err = np.abs(rgb.astype(int) - img.astype(int))
    assert err.max() <= 8  # q95 on a gradient: quantization error only
    assert J.encode_jpeg(img, quality=95) == b  # byte-determinism


def test_roundtrip_420_and_odd_dims():
    img = _gradient(27, 37)
    b = J.encode_jpeg(img, quality=95, subsampling="420")
    w, h, _m, rgb = J.decode_jpeg(b)
    assert (w, h) == (37, 27)
    # chroma is 2x2-averaged: loose bound, luma must stay tight
    lum = lambda a: 0.299 * a[..., 0] + 0.587 * a[..., 1] + 0.114 * a[..., 2]
    assert np.abs(lum(rgb) - lum(img.astype(float))).max() <= 12
    assert len(b) < len(J.encode_jpeg(img, quality=95))  # 420 is smaller


def test_flat_image_exact():
    flat = np.full((16, 16, 3), 100, np.uint8)
    _w, _h, _m, rgb = J.decode_jpeg(J.encode_jpeg(flat, 90))
    assert np.array_equal(rgb, flat)


def test_grayscale_mode_l():
    xx, yy = np.meshgrid(np.arange(20), np.arange(15))
    g = ((xx * 7 + yy * 11) % 256).astype(np.uint8)
    b = J.encode_jpeg(g, quality=95)
    w, h, mode, rgb = J.decode_jpeg(b)
    assert (w, h, mode) == (20, 15, "L")
    assert np.array_equal(rgb[:, :, 0], rgb[:, :, 1])  # replicated channels
    assert np.abs(rgb[:, :, 0].astype(int) - g.astype(int)).max() <= 8


def test_restart_markers_decode_identically():
    xx, yy = np.meshgrid(np.arange(48), np.arange(40))
    g = ((xx * 7 + yy * 11) % 256).astype(np.uint8)
    ref = J.decode_jpeg(J.encode_jpeg(g, quality=95))[3]
    for ri in (1, 3, 7):
        b = J.encode_jpeg(g, quality=95, restart_interval=ri)
        assert b"\xff\xdd" in b  # DRI segment present
        assert np.array_equal(J.decode_jpeg(b)[3], ref)


def test_lower_quality_shrinks_and_degrades_gracefully():
    img = _gradient()
    hi = J.encode_jpeg(img, quality=95)
    lo = J.encode_jpeg(img, quality=30)
    assert len(lo) < len(hi)
    _w, _h, _m, rgb = J.decode_jpeg(lo)
    assert np.abs(rgb.astype(int) - img.astype(int)).mean() < 32


def test_perceptual_hash_survives_compression():
    """dhash of the decoded JPEG stays within a few bits of the
    original — the property the near-dup pipeline relies on."""
    rng = np.random.default_rng(4)
    base = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    # smooth it so it's a plausible photo, not white noise
    sm = base.astype(float)
    for _ in range(3):
        sm = (sm + np.roll(sm, 1, 0) + np.roll(sm, 1, 1)) / 3
    img = sm.astype(np.uint8)
    h0 = P.dhash64(P.luminance(img))
    _w, _h, _m, rgb = J.decode_jpeg(J.encode_jpeg(img, quality=85))
    h1 = P.dhash64(P.luminance(rgb))
    assert bin((h0 ^ h1) & (2**64 - 1)).count("1") <= 4


@settings(max_examples=8, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=24),
    h=st.integers(min_value=1, max_value=24),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    sub=st.sampled_from(["444", "420"]),
)
def test_roundtrip_property(w, h, seed, sub):
    """Any size (including < one block), either subsampling: decode
    returns the declared dims and bounded error on smooth content."""
    rng = np.random.default_rng(seed)
    ramp = np.linspace(0, 200, w)[None, :] + np.linspace(0, 40, h)[:, None]
    img = np.stack(
        [ramp + rng.integers(0, 8), ramp * 0.5, 255 - ramp], axis=-1
    ).clip(0, 255).astype(np.uint8)
    got_w, got_h, _m, rgb = J.decode_jpeg(J.encode_jpeg(img, 90, sub))
    assert (got_w, got_h) == (w, h)
    if sub == "444":
        assert np.abs(rgb.astype(int) - img.astype(int)).max() <= 40
    else:
        # 4:2:0 genuinely discards chroma detail (a 2px max-contrast
        # chroma edge box-averages to its mean — libjpeg does the
        # same); luma is full-resolution and must stay tight
        lum = lambda a: 0.299 * a[..., 0] + 0.587 * a[..., 1] + 0.114 * a[..., 2]
        assert np.abs(lum(rgb.astype(float)) - lum(img.astype(float))).max() <= 40


def test_progressive_rejected():
    b = bytearray(J.encode_jpeg(_gradient(), 90))
    i = b.find(b"\xff\xc0")
    b[i + 1] = 0xC2  # pretend progressive SOF
    with pytest.raises(ValueError, match="non-baseline"):
        J.decode_jpeg(bytes(b))


def test_ladder_decodes_jpeg(spark):
    img = _gradient(16, 16)
    rows = spark.createDataFrame(
        [("/m/photo.jpg", J.encode_jpeg(img, 95))], "path string, content binary"
    )
    got = M.image_features(rows).collect()[0]
    assert got["decoder"] == "jpeg-pure"
    assert (got["width"], got["height"]) == (16, 16)
    # hash matches hashing the decoded pixels directly
    _w, _h, _m, rgb = J.decode_jpeg(J.encode_jpeg(img, 95))
    assert got["dhash64"] == P.dhash64(P.luminance(rgb))


def test_ladder_resizes_jpeg(spark):
    img = _gradient(16, 16)
    rows = spark.createDataFrame(
        [("/m/photo.jpg", J.encode_jpeg(img, 95))], "path string, content binary"
    )
    got = M.resize_images(rows, 8, 8).collect()[0]
    assert got["decoder"] == "jpeg-pure"
    _w, _h, _m, rgb = P.decode_png(bytes(got["content"]))  # re-encoded as PNG
    assert rgb.shape == (8, 8, 3)


def test_malformed_jpeg_falls_to_stub(spark):
    rows = spark.createDataFrame(
        [("/m/junk.jpg", b"\xff\xd8\xff\xe0" + b"\x00" * 8)],
        "path string, content binary",
    )
    got = M.image_features(rows).collect()[0]
    assert got["decoder"] == "stub"

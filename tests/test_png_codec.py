"""Pure-stdlib PNG codec + real perceptual hashes (functions/png.py),
and their integration into the multimodal decode ladder."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from filesystemagent_spark.functions import png as P
from filesystemagent_spark.operators import multimodal as M


def _gradient(h=16, w=16):
    """Deterministic RGB test image with structure in every channel."""
    y, x = np.mgrid[0:h, 0:w]
    r = (x * 255 // max(w - 1, 1)).astype(np.uint8)
    g = (y * 255 // max(h - 1, 1)).astype(np.uint8)
    b = ((x + y) * 255 // max(h + w - 2, 1)).astype(np.uint8)
    return np.stack([r, g, b], axis=2)


def test_roundtrip_exact():
    img = _gradient(13, 7)  # odd dims: fractional resize bins later
    w, h, mode, rgb = P.decode_png(P.encode_png(img))
    assert (w, h, mode) == (7, 13, "RGB")
    assert np.array_equal(rgb, img)


def _filtered_png(rgb: np.ndarray, ftype: int) -> bytes:
    """Hand-assemble a PNG whose every row uses filter `ftype`,
    applying the spec's FORWARD filter — decode must invert it."""
    h, w, _ = rgb.shape
    nch = 3
    raw = bytearray()
    prev = np.zeros(w * nch, dtype=np.int64)
    for y in range(h):
        cur = rgb[y].astype(np.int64).reshape(-1)
        line = np.zeros_like(cur)
        for x in range(w * nch):
            a = cur[x - nch] if x >= nch else 0
            b = prev[x]
            c = prev[x - nch] if x >= nch else 0
            if ftype == 0:
                pred = 0
            elif ftype == 1:
                pred = a
            elif ftype == 2:
                pred = b
            elif ftype == 3:
                pred = (a + b) >> 1
            else:  # paeth
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            line[x] = (cur[x] - pred) & 0xFF
        raw.append(ftype)
        raw.extend(line.astype(np.uint8).tobytes())
        prev = cur

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        P.PNG_MAGIC + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw))) + chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_unfilter_all_types(ftype):
    img = _gradient(9, 11)
    _w, _h, _mode, rgb = P.decode_png(_filtered_png(img, ftype))
    assert np.array_equal(rgb, img), f"filter {ftype} mis-decoded"


def test_gray_and_rgba_color_types():
    # grayscale (color type 0)
    g = np.arange(64, dtype=np.uint8).reshape(8, 8)
    raw = b"".join(b"\x00" + g[y].tobytes() for y in range(8))

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    b = (
        P.PNG_MAGIC
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 8, 8, 8, 0, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    w, h, mode, rgb = P.decode_png(b)
    assert (w, h, mode) == (8, 8, "L")
    assert np.array_equal(rgb[:, :, 0], g) and np.array_equal(rgb[:, :, 1], g)

    # RGBA (color type 6): alpha dropped
    img = _gradient(4, 4)
    rgba = np.dstack([img, np.full((4, 4), 7, np.uint8)])
    raw = b"".join(b"\x00" + rgba[y].tobytes() for y in range(4))
    b = (
        P.PNG_MAGIC
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 4, 8, 6, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    _w, _h, mode, rgb = P.decode_png(b)
    assert mode == "RGBA" and np.array_equal(rgb, img)


def test_hashes_semantics():
    img = _gradient(32, 32)
    gray = P.luminance(img)
    d, a, p = P.dhash64(gray), P.ahash64(gray), P.phash64(gray)
    # deterministic
    assert (d, a, p) == (P.dhash64(gray), P.ahash64(gray), P.phash64(gray))
    # x-gradient luminance increases rightward -> dhash of the pure-R
    # gradient is all-ones rows (every right pixel brighter)
    xonly = np.stack([_gradient(32, 32)[:, :, 0]] * 3, axis=2)
    assert P.dhash64(P.luminance(xonly)) == -1  # 64 one-bits, signed
    # a 1-pixel perturbation is a near-dup: Hamming distance <= 2
    pert = img.copy()
    pert[5, 5] = [250, 250, 250]
    dist = bin(
        (P.dhash64(gray) ^ P.dhash64(P.luminance(pert))) & (2**64 - 1)
    ).count("1")
    assert dist <= 2
    # structurally different image -> far hash
    other = _gradient(32, 32)[::-1, ::-1]
    dist2 = bin(
        (P.dhash64(gray) ^ P.dhash64(P.luminance(other.copy()))) & (2**64 - 1)
    ).count("1")
    assert dist2 > 8


def test_image_features_real_png_path(spark):
    imgs = spark.createDataFrame(
        [
            ("/m/grad.png", P.encode_png(_gradient(16, 16))),
            ("/m/junk.png", b"\x89PNG but not really"),
        ],
        "path string, content binary",
    )
    rows = {r["path"]: r.asDict() for r in M.image_features(imgs).collect()}
    real = rows["/m/grad.png"]
    assert real["decoder"] == "png-pure"
    assert (real["width"], real["height"], real["mode"]) == (16, 16, "RGB")
    expected = P.dhash64(P.luminance(_gradient(16, 16)))
    assert real["dhash64"] == expected
    assert rows["/m/junk.png"]["decoder"] == "stub"


def test_resize_images_real_png_roundtrip(spark):
    imgs = spark.createDataFrame(
        [("/m/grad.png", P.encode_png(_gradient(16, 16)))],
        "path string, content binary",
    )
    row = M.resize_images(imgs, 8, 8).collect()[0]
    assert row["decoder"] == "png-pure"
    w, h, _mode, rgb = P.decode_png(bytes(row["content"]))
    assert (w, h) == (8, 8)
    # area-average of the x-gradient keeps monotone rows
    lum = P.luminance(rgb)
    assert all(lum[y, 0] <= lum[y, -1] for y in range(8))


def test_audio_features_wav_real(spark):
    import io
    import math
    import wave

    buf = io.BytesIO()
    sr, freq, dur = 8000, 440.0, 0.5
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(sr)
        n = int(sr * dur)
        frames = b"".join(
            struct.pack(
                "<h", int(32000 * math.sin(2 * math.pi * freq * i / sr))
            )
            for i in range(n)
        )
        wf.writeframes(frames)
    auds = spark.createDataFrame(
        [("/m/tone.wav", buf.getvalue())], "path string, content binary"
    )
    row = M.audio_features(auds).collect()[0]
    assert row["decoder"] == "wav-pure"
    assert row["sample_rate"] == sr and row["n_channels"] == 1
    assert abs(row["duration_s"] - dur) < 1e-9
    # full-scale sine: rms ~ A/sqrt(2), zcr ~ 2*f/sr
    assert abs(row["rms"] - (32000 / 32768) / math.sqrt(2)) < 0.01
    assert abs(row["zero_cross_rate"] - 2 * freq / sr) < 0.01


def test_png_dedup_end_to_end(spark):
    """The reference's image near-dup rule (dhash Hamming <= 2,
    media_fingerprinting.py:321-349) over REAL decoded PNGs: exact
    copy and 1-pixel variant cluster together, different image stays
    out."""
    from filesystemagent_spark.operators import dedup as D

    base = _gradient(24, 24)
    pert = base.copy()
    pert[3, 3] = [0, 0, 0]
    other = base[::-1, ::-1].copy()
    imgs = spark.createDataFrame(
        [
            ("/m/a.png", P.encode_png(base)),
            ("/m/a_copy.png", P.encode_png(base)),
            ("/m/a_tweak.png", P.encode_png(pert)),
            ("/m/b.png", P.encode_png(other)),
        ],
        "path string, content binary",
    )
    feats = M.image_features(imgs).select("path", "dhash64")
    pairs = {
        (r["id_a"], r["id_b"])
        for r in D.hamming_near_dup_pairs(
            feats, "path", "dhash64", max_distance=2
        ).collect()
    }
    assert ("/m/a.png", "/m/a_copy.png") in pairs
    assert ("/m/a.png", "/m/a_tweak.png") in pairs
    assert not any("/m/b.png" in p for p in pairs)


# ---------------------------------------------------------------------------
# Property tests (hypothesis): the codec must round-trip ARBITRARY
# images, not just the fixtures above.

from hypothesis import given, settings, strategies as st


@settings(max_examples=15, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=24),
    h=st.integers(min_value=1, max_value=24),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_roundtrip_property(w, h, seed):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    got_w, got_h, mode, rgb = P.decode_png(P.encode_png(img))
    assert (got_w, got_h, mode) == (w, h, "RGB")
    assert np.array_equal(rgb, img)


@settings(max_examples=10, deadline=None)
@given(
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    ftype=st.integers(min_value=0, max_value=4),
)
def test_unfilter_property(seed, ftype):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(6, 5, 3), dtype=np.uint8)
    _w, _h, _mode, rgb = P.decode_png(_filtered_png(img, ftype))
    assert np.array_equal(rgb, img)


@settings(max_examples=10, deadline=None)
@given(seed=st.integers(min_value=0, max_value=2**31 - 1))
def test_resize_area_preserves_mean(seed):
    """Area-average resize is a weighted mean with weights summing to
    1 per output pixel — the global mean must be preserved exactly
    (up to float error) when bins tile evenly, and closely otherwise."""
    rng = np.random.default_rng(seed)
    g = rng.uniform(0, 255, size=(16, 16))
    r = P.resize_area(g, 8, 8)
    assert abs(r.mean() - g.mean()) < 1e-9


def test_whash_semantics():
    """whash64 = imagehash.whash(hash_size=8, image_scale=64,
    remove_max_haar_ll=True) semantics: level-3 Haar LL of the
    mean-subtracted 64x64 image, median threshold."""
    img = _gradient(32, 32)
    gray = P.luminance(img)
    w = P.whash64(gray)
    assert w == P.whash64(gray)  # deterministic
    # hand-rolled replay: 8x8 block means (x8/255, mean-subtracted)
    g = P.resize_area(gray, 64, 64) / 255.0
    g = g - g.mean()
    ll = g
    for _ in range(3):
        ll = (ll[0::2, 0::2] + ll[0::2, 1::2] + ll[1::2, 0::2] + ll[1::2, 1::2]) / 2.0
    bits = (ll > np.median(ll)).flatten()
    v = 0
    for bit in bits:
        v = (v << 1) | int(bit)
    assert w == (v - (1 << 64) if v >= (1 << 63) else v)
    # median threshold -> balanced-ish bit population (never all-0/all-1)
    pop = bin(w & (2**64 - 1)).count("1")
    assert 16 <= pop <= 48
    # 1-pixel perturbation is a near-dup
    pert = img.copy()
    pert[5, 5] = [250, 250, 250]
    dist = bin((w ^ P.whash64(P.luminance(pert))) & (2**64 - 1)).count("1")
    assert dist <= 2
    # structurally different image -> far hash
    other = np.ascontiguousarray(_gradient(32, 32)[::-1, ::-1])
    dist2 = bin((w ^ P.whash64(P.luminance(other))) & (2**64 - 1)).count("1")
    assert dist2 > 8


def test_image_features_carries_whash(spark):
    imgs = spark.createDataFrame(
        [
            ("/m/grad.png", P.encode_png(_gradient(16, 16))),
            ("/m/junk.png", b"\x89PNG but not really"),
        ],
        "path string, content binary",
    )
    rows = {r["path"]: r.asDict() for r in M.image_features(imgs).collect()}
    assert rows["/m/grad.png"]["whash64"] == P.whash64(
        P.luminance(_gradient(16, 16))
    )
    assert rows["/m/junk.png"]["whash64"] is not None  # stub still typed

"""Pure-stdlib BMP codec (functions/bmp.py) and ladder integration."""

from __future__ import annotations

import struct

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from filesystemagent_spark.functions import bmp as B
from filesystemagent_spark.functions import png as P
from filesystemagent_spark.operators import multimodal as M


def _img(h, w, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def test_roundtrip_with_row_padding():
    img = _img(5, 3)  # 3*3=9 bytes/row -> 3 bytes padding
    w, h, mode, rgb = B.decode_bmp(B.encode_bmp(img))
    assert (w, h, mode) == (3, 5, "RGB")
    assert np.array_equal(rgb, img)


@settings(max_examples=10, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=25),
    h=st.integers(min_value=1, max_value=25),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_roundtrip_property(w, h, seed):
    img = _img(h, w, seed)
    got_w, got_h, _m, rgb = B.decode_bmp(B.encode_bmp(img))
    assert (got_w, got_h) == (w, h)
    assert np.array_equal(rgb, img)


def test_top_down_and_32bit():
    img = _img(4, 4, seed=2)
    b = bytearray(B.encode_bmp(img))
    # flip to top-down: negate height and reverse the stored rows
    flipped = B.encode_bmp(img[::-1])
    fb = bytearray(flipped)
    fb[22:26] = struct.pack("<i", -4)
    _w, _h, _m, rgb = B.decode_bmp(bytes(fb))
    assert np.array_equal(rgb, img)

    # hand-build a 32-bit BGRA variant
    h, w = img.shape[:2]
    body = bytearray()
    for y in range(h - 1, -1, -1):
        for x in range(w):
            r, g, bl = img[y, x]
            body += bytes([bl, g, r, 255])
    data_off = 54
    hdr = b"BM" + struct.pack("<IHHI", data_off + len(body), 0, 0, data_off)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 32, 0, len(body), 0, 0, 0, 0)
    _w, _h, mode, rgb = B.decode_bmp(bytes(hdr + dib + body))
    assert mode == "RGBA" and np.array_equal(rgb, img)


def test_unsupported_variants_raise():
    img = _img(2, 2)
    b = bytearray(B.encode_bmp(img))
    b[30:34] = struct.pack("<I", 1)  # BI_RLE8
    with pytest.raises(ValueError):
        B.decode_bmp(bytes(b))
    with pytest.raises(ValueError):
        B.decode_bmp(b"BM" + b"\x00" * 4)


def test_ladder_decodes_bmp(spark):
    img = _img(16, 16, seed=5)
    rows = spark.createDataFrame(
        [("/m/pic.bmp", B.encode_bmp(img))], "path string, content binary"
    )
    got = M.image_features(rows).collect()[0]
    assert got["decoder"] == "bmp-pure"
    assert (got["width"], got["height"]) == (16, 16)
    assert got["dhash64"] == P.dhash64(P.luminance(img))

"""ICO container codec (functions/ico.py): exact round trips for both
payload forms, hand-built multi-entry containers, honest gating, and
the image ladder."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from filesystemagent_spark.functions import ico as I
from filesystemagent_spark.functions import png as P
from filesystemagent_spark.operators import multimodal as M


def _rgb(seed=7, hw=(11, 8)):
    return np.random.default_rng(seed).integers(0, 256, (*hw, 3)).astype(np.uint8)


def test_dib_payload_roundtrip_exact():
    rgb = _rgb()
    w, h, mode, back = I.decode_ico(I.encode_ico(rgb, payload="dib"))
    assert (w, h, mode) == (8, 11, "RGBA")
    assert np.array_equal(back[:, :, :3], rgb)


def test_png_payload_roundtrip_exact():
    rgb = _rgb(seed=9)
    b = I.encode_ico(rgb, payload="png")
    # the payload really is a PNG stream at the directory offset
    off = struct.unpack("<I", b[18:22])[0]
    assert P.is_png(b[off:])
    w, h, mode, back = I.decode_ico(b)
    assert (w, h) == (8, 11)
    assert np.array_equal(back[:, :, :3], rgb)


def test_multi_entry_picks_largest():
    small = I.encode_ico(_rgb(seed=1, hw=(4, 4)), payload="dib")
    big_rgb = _rgb(seed=2, hw=(16, 16))
    big = I.encode_ico(big_rgb, payload="dib")
    # hand-build a 2-entry container: small first, big second
    e_small = bytearray(small[6:22])
    e_big = bytearray(big[6:22])
    p_small, p_big = small[22:], big[22:]
    off0 = 6 + 32
    struct.pack_into("<I", e_small, 12, off0)
    struct.pack_into("<I", e_big, 12, off0 + len(p_small))
    blob = (
        struct.pack("<HHH", 0, 1, 2)
        + bytes(e_small)
        + bytes(e_big)
        + p_small
        + p_big
    )
    w, h, _mode, back = I.decode_ico(blob)
    assert (w, h) == (16, 16)
    assert np.array_equal(back[:, :, :3], big_rgb)


def test_256_encoded_as_zero_in_directory():
    rgb = _rgb(seed=3, hw=(256, 256))
    b = I.encode_ico(rgb, payload="dib")
    assert b[6] == 0 and b[7] == 0  # 256 -> 0 per spec
    w, h, _mode, back = I.decode_ico(b)
    assert (w, h) == (256, 256)
    assert np.array_equal(back[:, :, :3], rgb)


def test_magic_is_strict_enough():
    assert not I.is_ico(b"")
    assert not I.is_ico(b"\x00" * 6)  # count 0
    assert not I.is_ico(struct.pack("<HHH", 0, 3, 1) + b"\x00" * 16)  # type 3
    # plausible header but payload out of bounds
    hdr = struct.pack("<HHH", 0, 1, 1) + struct.pack(
        "<BBBBHHII", 4, 4, 0, 0, 1, 32, 4096, 22
    )
    assert not I.is_ico(hdr)
    assert I.is_ico(I.encode_ico(_rgb(seed=4, hw=(4, 4))))


def test_unsupported_dib_variants_gate_honestly():
    b = bytearray(I.encode_ico(_rgb(seed=5, hw=(4, 4)), payload="dib"))
    off = struct.unpack("<I", b[18:22])[0]
    struct.pack_into("<H", b, off + 14, 8)  # bpp=8 (palette) in the DIB
    with pytest.raises(ValueError):
        I.decode_ico(bytes(b))
    struct.pack_into("<H", b, off + 14, 32)
    struct.pack_into("<I", b, off + 16, 2)  # BI_RLE4 compression
    with pytest.raises(ValueError):
        I.decode_ico(bytes(b))


def test_image_ladder_reports_ico_pure(spark):
    rgb = _rgb(seed=6, hw=(12, 12))
    rows = [
        ("a.ico", bytes(I.encode_ico(rgb, payload="dib"))),
        ("b.ico", bytes(I.encode_ico(rgb, payload="png"))),
    ]
    df = spark.createDataFrame(rows, "path string, content binary")
    got = {
        r["path"]: r
        for r in M.image_features(df).select(
            "path", "width", "height", "decoder", "dhash64"
        ).collect()
    }
    assert got["a.ico"]["decoder"] == "ico-pure"
    assert got["b.ico"]["decoder"] == "ico-pure"
    assert got["a.ico"]["width"] == 12 and got["a.ico"]["height"] == 12
    # same pixels through both payload forms -> identical perceptual hash
    assert got["a.ico"]["dhash64"] == got["b.ico"]["dhash64"]

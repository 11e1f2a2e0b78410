"""netpbm (functions/pnm.py) and baseline TIFF (functions/tiff.py):
exact round trips, hand-built spec-level streams independent of the
encoders, honest gating of codec-table variants, and the image ladder."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from filesystemagent_spark.functions import pnm as N
from filesystemagent_spark.functions import tiff as T
from filesystemagent_spark.operators import multimodal as M


def _rgb(seed=5, hw=(9, 13)):
    return np.random.default_rng(seed).integers(0, 256, (*hw, 3)).astype(np.uint8)


# ------------------------------------------------------------------- netpbm


def test_ppm_pgm_roundtrip_exact():
    rgb = _rgb()
    gray = rgb[:, :, 0]
    w, h, mode, back = N.decode_pnm(N.encode_pnm(rgb, 6))
    assert (w, h, mode) == (13, 9, "RGB") and np.array_equal(back, rgb)
    w, h, mode, back = N.decode_pnm(N.encode_pnm(gray, 5))
    assert (w, h, mode) == (13, 9, "L") and np.array_equal(back[:, :, 0], gray)


def test_ascii_variants_and_comments():
    p2 = b"P2\n# a comment\n4 2\n255\n0 1 2 3 4 5 6 7"
    w, h, mode, a = N.decode_pnm(p2)
    assert (w, h, mode) == (4, 2, "L")
    assert a[1, 3, 0] == 7
    p3 = b"P3\n1 1\n7\n7 0 7"  # maxval scaling: 7 -> 255
    _w, _h, _m, a = N.decode_pnm(p3)
    assert list(a[0, 0]) == [255, 0, 255]


def test_p4_bitmap_bit_order():
    p4 = b"P4\n8 2\n" + bytes([0b10101010, 0b11110000])
    _w, _h, mode, a = N.decode_pnm(p4)
    assert mode == "1"
    # 1 bits are black (0), MSB first
    assert list(a[0, :4, 0]) == [0, 255, 0, 255]
    assert list(a[1, :4, 0]) == [0, 0, 0, 0]


def test_16bit_pgm_scales():
    raw = struct.pack(">4H", 0, 65535, 32768, 16384)
    b = b"P5\n4 1\n65535\n" + raw
    _w, _h, _m, a = N.decode_pnm(b)
    assert list(a[0, :, 0]) == [0, 255, 128, 64]


def test_truncated_pnm_rejected():
    with pytest.raises(ValueError):
        N.decode_pnm(b"P6\n4 4\n255\n\x00\x00")


# --------------------------------------------------------------------- tiff


def test_tiff_roundtrip_both_endians():
    rgb = _rgb(seed=7)
    gray = rgb[:, :, 1]
    for be in (False, True):
        w, h, mode, back = T.decode_tiff(T.encode_tiff(rgb, big_endian=be))
        assert (w, h, mode) == (13, 9, "RGB") and np.array_equal(back, rgb)
        w, h, mode, back = T.decode_tiff(T.encode_tiff(gray, big_endian=be))
        assert (w, h, mode) == (13, 9, "L")
        assert np.array_equal(back[:, :, 0], gray)


def test_packbits_strip_decodes():
    assert (
        T._unpackbits_rle(struct.pack("b", 2) + b"ABC" + struct.pack("b", -3) + b"Z", 7)
        == b"ABCZZZZ"
    )
    # -128 is a no-op
    assert T._unpackbits_rle(struct.pack("bb", -128, 0) + b"Q", 1) == b"Q"


def test_packbits_tiff_image():
    """Hand-build a PackBits-compressed grayscale TIFF (independent of
    the encoder, which only writes uncompressed)."""
    gray = np.tile(np.arange(8, dtype=np.uint8) * 32, (4, 1))  # runs compress well
    plain = T.encode_tiff(gray)
    # recompress the strip: each row = 8 literal bytes
    row = gray[0].tobytes()
    packed = b"".join(struct.pack("b", 7) + row for _ in range(4))
    data_off = plain.find(gray.tobytes())
    b = bytearray(plain[:data_off]) + packed
    # patch Compression (tag 259) value to 32773 and StripByteCounts (279)
    n = struct.unpack("<H", b[8:10])[0]
    for i in range(n):
        off = 10 + 12 * i
        tag = struct.unpack("<H", b[off : off + 2])[0]
        if tag == 259:
            b[off + 8 : off + 10] = struct.pack("<H", 32773)
        if tag == 279:
            b[off + 8 : off + 12] = struct.pack("<I", len(packed))
    _w, _h, mode, back = T.decode_tiff(bytes(b))
    assert mode == "L" and np.array_equal(back[:, :, 0], gray)


def test_whitezero_polarity():
    gray = np.full((2, 2), 10, np.uint8)
    b = bytearray(T.encode_tiff(gray))
    n = struct.unpack("<H", b[8:10])[0]
    for i in range(n):
        off = 10 + 12 * i
        if struct.unpack("<H", b[off : off + 2])[0] == 262:
            b[off + 8 : off + 10] = struct.pack("<H", 0)  # WhiteIsZero
    _w, _h, _m, back = T.decode_tiff(bytes(b))
    assert back[0, 0, 0] == 245  # inverted


def test_lzw_tiff_honestly_gated():
    b = bytearray(T.encode_tiff(_rgb()))
    n = struct.unpack("<H", b[8:10])[0]
    for i in range(n):
        off = 10 + 12 * i
        if struct.unpack("<H", b[off : off + 2])[0] == 259:
            b[off + 8 : off + 10] = struct.pack("<H", 5)  # LZW
    with pytest.raises(ValueError, match="codec library"):
        T.decode_tiff(bytes(b))


# ------------------------------------------------------------------- ladder


def test_image_ladder_decodes_pnm_and_tiff(spark):
    rgb = _rgb(seed=9, hw=(16, 16))
    rows = spark.createDataFrame(
        [
            ("/m/a.ppm", N.encode_pnm(rgb, 6)),
            ("/m/a.tif", T.encode_tiff(rgb)),
        ],
        "path string, content binary",
    )
    got = {r["path"]: r for r in M.image_features(rows).collect()}
    assert got["/m/a.ppm"]["decoder"] == "pnm-pure"
    assert got["/m/a.tif"]["decoder"] == "tiff-pure"
    # same pixels through either container -> identical perceptual hashes
    for col in ("dhash64", "phash64", "ahash64"):
        assert got["/m/a.ppm"][col] == got["/m/a.tif"][col]


def test_truncated_tiff_raises_valueerror_not_struct_error():
    # The decode ladder's contract is ValueError-only: image_features
    # catches ValueError and falls back to the stub, so a corrupt TIFF
    # must never leak struct.error and kill the whole Spark task.
    full = T.encode_tiff(np.arange(64, dtype=np.uint8).reshape(8, 8))
    for cut in (5, 6, 9, 12, 20, len(full) - 5):
        hurt = full[:cut]
        if not T.is_tiff(hurt):
            continue
        with pytest.raises(ValueError):
            T.decode_tiff(hurt)
    # out-of-range IFD offset with valid magic
    bogus = full[:4] + (2**31 - 1).to_bytes(4, "little") + full[8:]
    with pytest.raises(ValueError):
        T.decode_tiff(bogus)

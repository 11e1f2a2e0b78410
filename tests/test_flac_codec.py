"""FLAC codec (functions/flac.py): lossless round trips, spec-level
bitstream cases built independently of the encoder, CRC conformance,
and the audio ladder."""

from __future__ import annotations

import numpy as np
import pytest

from filesystemagent_spark.functions import audio as AU
from filesystemagent_spark.functions import flac as FL
from filesystemagent_spark.operators import multimodal as M


def _tone(n=8000, rate=8000):
    t = np.arange(n) / rate
    return 0.5 * np.sin(2 * np.pi * 440 * t) + 0.2 * np.sin(2 * np.pi * 1000 * t)


def _quant(x, bps=16):
    full = 1 << (bps - 1)
    return np.clip(np.rint(np.asarray(x) * full), -full, full - 1) / full


def test_roundtrip_is_lossless():
    sig = _tone()
    rate, nch, x, label = FL.decode_flac(FL.encode_flac(sig, 8000))
    assert (rate, nch, label) == (8000, 1, "flac-pure")
    assert np.array_equal(x, _quant(sig))  # bit-exact, not approximate


def test_roundtrip_tail_and_tiny_blocks():
    sig = _tone()
    for n in (1, 2, 3, 100, 4097, 5000):
        _r, _c, x, _l = FL.decode_flac(FL.encode_flac(sig[:n], 8000))
        assert len(x) == n
        assert np.array_equal(x, _quant(sig[:n]))


def test_flac_smaller_than_pcm():
    sig = _tone()
    assert len(FL.encode_flac(sig, 8000)) < 2 * len(sig)  # < raw 16-bit PCM


def test_encoder_crcs_are_spec_conformant():
    """Recompute header CRC-8 and frame CRC-16 independently from the
    emitted bytes — catches encoder/decoder complementary bugs in the
    frame framing (the CRCs are defined by the public spec, not by
    this codec pair)."""
    b = FL.encode_flac(_tone(300), 8000, block_size=256)
    # STREAMINFO: 4 magic + 4 header + 34 body
    frame = b[4 + 4 + 34 :]
    assert frame[0] == 0xFF and (frame[1] >> 2) == 0b111110
    # header runs to the CRC-8 byte: fixed 4 bytes + utf8(0)=1 byte
    hdr_len = 4 + 1
    assert FL._crc8(frame[:hdr_len]) == frame[hdr_len]
    # whole frame minus trailing CRC-16 must hash to that CRC-16
    # (single 256-block frame then a 44-sample tail frame follows; locate the
    # second sync by scanning)
    nxt = b.find(b"\xff\xf8", 4 + 4 + 34 + 2)
    whole = frame[: nxt - (4 + 4 + 34)] if nxt > 0 else frame
    crc = int.from_bytes(whole[-2:], "big")
    assert FL._crc16(whole[:-2]) == crc


def test_handbuilt_rice_residual_decodes():
    """Spec-level check independent of the encoder: a hand-packed
    rice partition (param=2) decodes to the intended residuals."""
    w = FL._BitWriter()
    w.write(0, 2)   # rice method 0 (4-bit params)
    w.write(0, 4)   # partition order 0
    w.write(2, 4)   # rice parameter 2
    # residuals e: 0, -1, 3, -4 -> zigzag u: 0, 1, 6, 7
    for u in (0, 1, 6, 7):
        w.write_unary(u >> 2)
        w.write(u & 3, 2)
    w.align()
    r = FL._BitReader(bytes(w.out))
    got = FL._read_residual(r, block_size=4, order=0)
    assert got == [0, -1, 3, -4]


def test_handbuilt_utf8_frame_numbers():
    for v in (0, 0x7F, 0x80, 0x7FF, 0x800, 0xFFFF, 0x10FFFF):
        w = FL._BitWriter()
        enc = FL._utf8_number(v)
        for byte in enc:
            w.write(byte, 8)
        r = FL._BitReader(bytes(w.out))
        assert FL._read_utf8_number(r) == v, v


def test_handbuilt_constant_and_verbatim_subframes():
    w = FL._BitWriter()
    # constant subframe, value -5, bps 8
    w.write(0, 1); w.write(0, 6); w.write(0, 1)
    w.write(-5 & 0xFF, 8)
    w.align()
    r = FL._BitReader(bytes(w.out))
    got = FL._read_subframe(r, block_size=3, bps=8)
    assert got.tolist() == [-5, -5, -5]

    w = _w = FL._BitWriter()
    w.write(0, 1); w.write(1, 6); w.write(0, 1)  # verbatim
    for v in (1, -2, 127, -128):
        w.write(v & 0xFF, 8)
    w.align()
    r = FL._BitReader(bytes(w.out))
    got = FL._read_subframe(r, block_size=4, bps=8)
    assert got.tolist() == [1, -2, 127, -128]


def test_wasted_bits_shift():
    """A subframe flagged with 2 wasted bits decodes samples shifted
    left by 2 (spec section on wasted-bits-per-sample)."""
    w = FL._BitWriter()
    w.write(0, 1); w.write(0, 6)      # constant
    w.write(1, 1); w.write_unary(1)   # wasted flag + unary(k-1): k=2
    w.write(3, 6)                     # value 3 in bps-2 bits
    w.align()
    r = FL._BitReader(bytes(w.out))
    got = FL._read_subframe(r, block_size=2, bps=8)
    assert got.tolist() == [12, 12]  # 3 << 2


def test_audio_ladder_decodes_flac(spark):
    sig = _tone()
    rows = spark.createDataFrame(
        [("/m/tone.flac", FL.encode_flac(sig, 8000)),
         ("/m/tone.wav", AU.encode_wav(sig, 8000, AU.WAVE_PCM))],
        "path string, content binary",
    )
    got = {r["path"]: r for r in M.audio_features(rows).collect()}
    fl = got["/m/tone.flac"]
    assert fl["decoder"] == "flac-pure"
    assert fl["sample_rate"] == 8000
    assert fl["duration_s"] == pytest.approx(1.0, abs=0.01)
    # FLAC and WAV of the same signal agree on features (lossless)
    assert fl["rms"] == pytest.approx(got["/m/tone.wav"]["rms"], rel=1e-3)
    # fingerprints of the same audio through both containers collide
    fps = M.audio_fingerprints(rows, window_s=1.0).collect()
    vals = {r["path"]: r["fp64"] for r in fps}
    assert vals["/m/tone.flac"] == vals["/m/tone.wav"]

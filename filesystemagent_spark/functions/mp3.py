"""MPEG-1 Layer III ENVELOPE slice — the affordable bite of the mp3
gate (round 8, verdict item 8).

This is NOT a PCM decoder. Full Layer III decode needs the spec's
Huffman code tables plus the hybrid IMDCT/aliasing chain, and no
conformance vectors can exist in this container to validate them —
that honest gate stays in functions/mpa.py (decode_mpa raises for
layer III). What DOES have a closed, testable form is everything the
bitstream carries BEFORE the Huffman spectrum:

- frame headers (bitrate/rate/mode walk, CBR and VBR streams),
- the side information block (ISO 11172-3 2.4.1.7: main_data_begin,
  scfsi, and per-granule part2_3_length / big_values / global_gain /
  scalefac_compress / block_type / subblock_gain / scalefac_scale),
- the BIT RESERVOIR (main_data_begin back-references into previous
  frames' main_data — reconstructed here the way a real decoder does,
  by concatenating main_data regions),
- the scale factors themselves (slen1/slen2 coding, scfsi reuse in
  granule 1, long/short/mixed block layouts).

global_gain and the scale factors ARE the per-granule spectral
envelope in log domain (gain applies 2^(g/4) globally; each band's
scalefactor subtracts 2^(scalefac_scale+1)·sf/2 of it) — enough to
fingerprint mp3 audio for dedup without pretending to produce PCM:
`mp3_envelope_fp64` emits the same sign-of-adjacent-band-difference
64-bit scheme as the PCM ladder's `_spectral_fp64`, computed from the
envelope instead of an FFT. Identical mp3 bytes give identical
fingerprints; re-encoded audio does NOT (the envelope is codec
state) — the honest scope is exact/near-exact stream dedup, stated in
the ladder's decoder label 'mp3-envelope-pure'.

Round-trip validation follows the WAV/FLAC pattern: `encode_mp3_
silence` emits standard-conformant CBR frames whose spectrum is empty
(big_values=0, no count1 data — digital silence) but whose
global_gain and scale factors are caller-chosen, and the parser must
read every value back exactly, including through a hand-built bit
reservoir (tests/test_mp3_envelope.py).
"""

from __future__ import annotations

import struct

__all__ = [
    "is_mp3",
    "parse_mp3_envelope",
    "parse_mp3_spectra",
    "mp3_envelope_fp64_windows",
    "encode_mp3_silence",
    "encode_mp3_pulses",
]

_RATES = [44100, 48000, 32000]
_BITRATES_L3 = [0, 32, 40, 48, 56, 64, 80, 96, 112, 128,
                160, 192, 224, 256, 320]
_SLEN1 = [0, 0, 0, 0, 3, 1, 1, 1, 2, 2, 2, 3, 3, 3, 4, 4]
_SLEN2 = [0, 1, 2, 3, 0, 1, 2, 3, 1, 2, 3, 1, 2, 3, 2, 3]
# scfsi band groups over the 21 long scale-factor bands
_SCFSI_BANDS = [(0, 6), (6, 11), (11, 16), (16, 21)]


def is_mp3(b: bytes) -> bool:
    """MPEG-1 Layer III frame sync at offset 0 (layer bits 01)."""
    if len(b) < 4:
        return False
    h = struct.unpack(">I", b[:4])[0]
    return (
        (h >> 21) & 0x7FF == 0x7FF
        and (h >> 19) & 0x3 == 0x3     # MPEG-1
        and (h >> 17) & 0x3 == 0x1     # Layer III
    )


class _Bits:
    def __init__(self, data: bytes, pos_bits: int = 0):
        self.data = data
        self.pos = pos_bits

    def read(self, n: int) -> int:
        v = 0
        for _ in range(n):
            byte = self.data[self.pos >> 3]
            v = (v << 1) | ((byte >> (7 - (self.pos & 7))) & 1)
            self.pos += 1
        return v


def _parse_side_info(b: bytes, off: int, nch: int) -> dict:
    """The side-information block after header(+CRC): layout per ISO
    11172-3 2.4.1.7 (MPEG-1: 17 bytes mono, 32 stereo)."""
    r = _Bits(b, off * 8)
    si = {"main_data_begin": r.read(9)}
    r.read(5 if nch == 1 else 3)  # private_bits
    si["scfsi"] = [[r.read(1) for _ in range(4)] for _ in range(nch)]
    si["granules"] = []
    for _g in range(2):
        chans = []
        for _c in range(nch):
            ch = {
                "part2_3_length": r.read(12),
                "big_values": r.read(9),
                "global_gain": r.read(8),
                "scalefac_compress": r.read(4),
            }
            if r.read(1):  # window_switching_flag
                ch["block_type"] = r.read(2)
                ch["mixed_block_flag"] = r.read(1)
                ch["table_select"] = [r.read(5) for _ in range(2)]
                ch["subblock_gain"] = [r.read(3) for _ in range(3)]
                if ch["block_type"] == 0:
                    raise ValueError(
                        "forbidden block_type 0 with window switching"
                    )
            else:
                ch["block_type"] = 0
                ch["mixed_block_flag"] = 0
                ch["table_select"] = [r.read(5) for _ in range(3)]
                ch["region0_count"] = r.read(4)
                ch["region1_count"] = r.read(3)
                ch["subblock_gain"] = [0, 0, 0]
            ch["preflag"] = r.read(1)
            ch["scalefac_scale"] = r.read(1)
            ch["count1table_select"] = r.read(1)
            chans.append(ch)
        si["granules"].append(chans)
    return si


def _read_scalefacs(r: _Bits, ch: dict, gr: int, scfsi: list[int],
                    prev: list[int] | None) -> list[int]:
    """Scale factors for one granule/channel from the main-data bits.
    Long blocks: 21 bands (slen1 for 0-10, slen2 for 11-20), with
    granule-1 scfsi reuse. Short (block_type 2, not mixed): 12 bands
    x 3 windows, flattened window-major like the bitstream. Mixed:
    8 long then bands 3-11 x 3 windows."""
    s1, s2 = _SLEN1[ch["scalefac_compress"]], _SLEN2[ch["scalefac_compress"]]
    short = ch["block_type"] == 2 and not ch["mixed_block_flag"]
    mixed = ch["block_type"] == 2 and ch["mixed_block_flag"]
    out: list[int] = []
    if short:
        for band in range(12):
            sl = s1 if band < 6 else s2
            for _w in range(3):
                out.append(r.read(sl))
        return out
    if mixed:
        for band in range(8):
            out.append(r.read(s1))
        for band in range(3, 12):
            sl = s1 if band < 6 else s2
            for _w in range(3):
                out.append(r.read(sl))
        return out
    for band in range(21):
        sl = s1 if band < 11 else s2
        group = next(
            i for i, (a, e) in enumerate(_SCFSI_BANDS) if a <= band < e
        )
        if gr == 1 and scfsi[group]:
            out.append(prev[band] if prev else 0)  # reused, bits absent
        else:
            out.append(r.read(sl))
    return out


def _walk_frames(
    b: bytes, max_frames: int | None
) -> tuple[int, int, int, int, bytes, list[tuple[dict, int]]]:
    """The frame/reservoir walk shared by the envelope and spectra
    parsers: returns (rate, nch, bitrate0, n_frames, reservoir,
    pending) where `reservoir` is the concatenated main_data stream
    and `pending` pairs each decodable frame's side info with its
    part2 start offset (bytes) in the reservoir. Frames whose part2
    bits would land before the reservoir's start (a cut stream's first
    frames with main_data_begin != 0) are skipped the way real
    decoders skip them."""
    if not is_mp3(b):
        raise ValueError("not an MPEG-1 Layer III stream")
    pos = 0
    rate = nch = None
    bitrate0 = None
    reservoir = b""        # concatenated main_data regions
    pending: list[tuple[dict, int]] = []
    n_frames = 0
    while pos + 4 <= len(b):
        h = struct.unpack(">I", b[pos : pos + 4])[0]
        if (h >> 21) & 0x7FF != 0x7FF:
            break
        if (h >> 19) & 0x3 != 0x3 or (h >> 17) & 0x3 != 0x1:
            raise ValueError("not MPEG-1 Layer III mid-stream")
        protection = (h >> 16) & 1
        bidx, ridx = (h >> 12) & 0xF, (h >> 10) & 0x3
        if bidx in (0, 15) or ridx == 3:
            raise ValueError(
                f"reserved/free-format header (bitrate_index={bidx}, "
                f"sample_rate_index={ridx})"
            )
        padding = (h >> 9) & 1
        mode = (h >> 6) & 0x3
        f_nch = 1 if mode == 0x3 else 2
        f_rate = _RATES[ridx]
        if rate is None:
            rate, nch, bitrate0 = f_rate, f_nch, _BITRATES_L3[bidx]
        frame_len = 144 * _BITRATES_L3[bidx] * 1000 // f_rate + padding
        if pos + frame_len > len(b):
            break  # truncated final frame
        si_off = pos + 4 + (0 if protection else 2)
        si_len = 17 if f_nch == 1 else 32
        si = _parse_side_info(b, si_off, f_nch)
        main = b[si_off + si_len : pos + frame_len]
        # this frame's part2 starts main_data_begin bytes BEFORE
        # its own main_data in the reservoir stream
        start = len(reservoir) - si["main_data_begin"]
        reservoir += main
        if start >= 0:
            pending.append((si, start))
        n_frames += 1
        pos += frame_len
        if max_frames is not None and n_frames >= max_frames:
            break
    return rate, nch, bitrate0, n_frames, reservoir, pending


def parse_mp3_envelope(b: bytes, max_frames: int | None = None) -> dict:
    """Walk an MPEG-1 Layer III stream and return its envelope:

    {rate, nch, bitrate_kbps (first frame), n_frames, granules:
     [{frame, granule, channel, global_gain, scalefac_scale,
       block_type, subblock_gain, scalefacs}, ...]}

    Reads side info per frame and scale factors from the reconstructed
    bit-reservoir stream. Raises ValueError on malformed input."""
    granules: list[dict] = []
    try:
        rate, nch, bitrate0, n_frames, reservoir, pending = _walk_frames(
            b, max_frames
        )
        for fi, (si, start) in enumerate(pending):
            r = _Bits(reservoir, start * 8)
            prev_by_ch: dict[int, list[int]] = {}  # granule 0's, for scfsi
            for gr in range(2):
                for c in range(len(si["granules"][gr])):
                    ch = si["granules"][gr][c]
                    bit0 = r.pos
                    sf = _read_scalefacs(
                        r, ch, gr, si["scfsi"][c], prev_by_ch.get(c)
                    )
                    if gr == 0:
                        prev_by_ch[c] = sf
                    # skip the Huffman spectrum: part2_3_length covers
                    # scalefac bits + Huffman bits together
                    r.pos = bit0 + ch["part2_3_length"]
                    granules.append(
                        {
                            "frame": fi,
                            "granule": gr,
                            "channel": c,
                            "global_gain": ch["global_gain"],
                            "scalefac_scale": ch["scalefac_scale"],
                            "block_type": ch["block_type"],
                            "subblock_gain": ch["subblock_gain"],
                            "scalefacs": sf,
                        }
                    )
    except (IndexError, struct.error) as e:
        raise ValueError(f"malformed mp3 stream: {e}") from e
    if not granules:
        raise ValueError("mp3 stream yielded no parsable granules")
    return {
        "rate": rate,
        "nch": nch,
        "bitrate_kbps": bitrate0,
        "n_frames": n_frames,
        "granules": granules,
    }


# -- Huffman → requantize slice (round 9) ----------------------------
#
# The spectral decode chain, scoped to what this container can VALIDATE
# (self-encoded round-trips, the WAV/FLAC/envelope discipline — no
# external conformance vectors can exist here):
#
#   real:  big-values Huffman decode (prefix walk + sign bits), the
#          part2_3_length bit accounting, and the ISO 2.4.3.4
#          requantizer  xr = sign·|ix|^(4/3) · 2^((global_gain−210)/4)
#          · 2^(−(scalefac_scale+1)/2 · scalefac[band])  — formula
#          implemented in full, exercised with caller-supplied band
#          widths;
#   data:  code TABLES are per-table spec constants; this slice ships
#          table 0 (the all-zero table) and table 1 (x,y ∈ {0,1}:
#          00→'1', 10→'01', 01→'001', 11→'000'), the one table whose
#          codes are structurally forced (a complete prefix code on 4
#          symbols with lengths 1/2/3/3). Streams selecting tables
#          2–31, count1 spectral data, window-switched granules, or
#          per-region table changes raise NotImplementedError — a DATA
#          entry gap (ISO 11172-3 Table B.7/B.8 constants), stated as
#          such and test-pinned; the decode MACHINERY is complete.
#
# Consequence for a user: mp3 dedup runs on the envelope rung
# (exact/near-exact streams); spectral-level fingerprints for
# differently-encoded identical audio additionally need tables 2–31 +
# IMDCT/synthesis (the remaining honest gate in functions/mpa.py).

_HUFF_BIG: dict[int, dict[tuple[int, int], tuple[int, int]] | None] = {
    0: None,  # table 0: no bits, (0, 0) pairs
    1: {(1, 0b1): (0, 0), (2, 0b01): (1, 0), (3, 0b001): (0, 1),
        (3, 0b000): (1, 1)},
}
# encoder view: (x, y) -> (hlen, hcod)
_HUFF_BIG_ENC = {
    t: {xy: code for code, xy in tab.items()}
    for t, tab in _HUFF_BIG.items()
    if tab
}


def _huff_decode_pair(r: "_Bits", table: dict) -> tuple[int, int]:
    code, length = 0, 0
    while True:
        code = (code << 1) | r.read(1)
        length += 1
        if (length, code) in table:
            return table[(length, code)]
        if length > 19:
            raise ValueError("invalid Huffman code in big-values region")


def encode_mp3_pulses(
    spectra: list[list[int]],
    gains: list[int],
    rate: int = 48000,
    bitrate_kbps: int = 128,
    scalefacs: list[list[int]] | None = None,
    scalefac_compress: int = 15,
    scalefac_scale: int = 0,
) -> bytes:
    """Standard-conformant CBR mono Layer III frames whose big-values
    region carries CALLER-CHOSEN quantized spectra coded with Huffman
    table 1 (values ∈ {−1, 0, 1}; sign bit 1 = negative, emitted after
    each nonzero code) — `encode_mp3_silence`'s sibling for the
    spectral round-trip. `spectra[i]` is granule i's leading spectral
    lines (even length ≤ 576; the tail is the all-zero region);
    `gains[i]` its global_gain. part2_3_length is computed exactly
    (scalefac bits + Huffman bits + sign bits), so the decoder's bit
    accounting is genuinely exercised; all three region table_selects
    are 1 (uniform, so region boundaries — a B.8 data gap — never
    bind). The spectra parser must read every value back exactly."""
    if len(spectra) != len(gains):
        raise ValueError("one spectrum per granule gain")
    if not gains:
        raise ValueError("need at least one granule")
    # _BITRATES_L3[0] is 0 (the free-format escape, which we don't
    # emit): accepting it would yield frame_len=0 and a misleading
    # "payload exceeds frame size" much later
    if rate not in _RATES or bitrate_kbps not in _BITRATES_L3[1:]:
        raise ValueError("bad rate/bitrate")
    if len(gains) % 2:
        gains = gains + [gains[-1]]
        spectra = spectra + [[]]
        if scalefacs is not None:
            scalefacs = list(scalefacs) + [[0] * 21]  # pad like the rest
    s1 = _SLEN1[scalefac_compress]
    s2 = _SLEN2[scalefac_compress]
    part2 = 11 * s1 + 10 * s2  # 21 long-block scalefacs, no scfsi
    enc = _HUFF_BIG_ENC[1]
    frame_len = 144 * bitrate_kbps * 1000 // rate
    out = b""
    for f in range(len(gains) // 2):
        grs = []
        for g in range(2):
            ix = spectra[f * 2 + g]
            if len(ix) % 2 or len(ix) > 576:
                raise ValueError("spectrum must be even-length <= 576")
            if any(abs(v) > 1 for v in ix):
                raise ValueError("table-1 slice carries values in {-1,0,1}")
            hb = _BitW()
            for i in range(0, len(ix), 2):
                x, y = abs(ix[i]), abs(ix[i + 1])
                hlen, hcod = enc[(x, y)]
                hb.write(hcod, hlen)
                if x:
                    hb.write(1 if ix[i] < 0 else 0, 1)
                if y:
                    hb.write(1 if ix[i + 1] < 0 else 0, 1)
            grs.append((len(ix) // 2, hb))
        si = _BitW()
        si.write(0, 9)   # main_data_begin
        si.write(0, 5)   # private
        for _ in range(4):
            si.write(0, 1)  # scfsi off: both granules carry scalefacs
        for g in range(2):
            big_values, hb = grs[g]
            si.write(part2 + len(hb.bits), 12)
            si.write(big_values, 9)
            si.write(gains[f * 2 + g], 8)
            si.write(scalefac_compress, 4)
            si.write(0, 1)   # no window switching
            for _ in range(3):
                si.write(1, 5)   # table_select: table 1 everywhere
            si.write(0, 4)   # region0_count
            si.write(0, 3)   # region1_count
            si.write(0, 1)   # preflag
            si.write(scalefac_scale, 1)
            si.write(0, 1)   # count1table_select
        md = _BitW()
        for g in range(2):
            sf = (
                scalefacs[f * 2 + g] if scalefacs is not None else [0] * 21
            )
            if len(sf) != 21:
                raise ValueError("long-block granules carry 21 scalefacs")
            for band in range(21):
                sl = s1 if band < 11 else s2
                if not 0 <= sf[band] < (1 << sl):
                    raise ValueError("scalefac exceeds its field")
                md.write(sf[band], sl)
            md.bits.extend(grs[g][1].bits)
        header = (
            (0x7FF << 21) | (0x3 << 19) | (0x1 << 17) | (1 << 16)
            | (_BITRATES_L3.index(bitrate_kbps) << 12)
            | (_RATES.index(rate) << 10) | (0x3 << 6)
        )
        body = si.tobytes(17) + md.tobytes(frame_len - 4 - 17)
        out += struct.pack(">I", header) + body
    return out


def parse_mp3_spectra(
    b: bytes,
    max_frames: int | None = None,
    band_widths: list[int] | None = None,
) -> dict:
    """Decode an MPEG-1 Layer III stream through the big-values Huffman
    region and the ISO 2.4.3.4 requantizer — the round-9 slice past the
    envelope. Returns the envelope dict with each granule extended by
    `ix` (quantized spectral values, sign applied) and `xr` (requantized
    spectral lines).

    `band_widths` maps spectral position → scale-factor band for the
    attenuation term (sum = coverage of the scalefac'd region); when
    None, streams with any nonzero scalefac or preflag raise — the B.8
    per-rate band tables are spec data this slice doesn't ship, and
    silently ignoring attenuation would be a wrong answer. Streams
    selecting Huffman tables outside {0, 1}, carrying count1 spectral
    data, mixing table_selects across regions, or using window
    switching raise NotImplementedError (the remaining DATA gap; see
    the slice note above)."""
    granules: list[dict] = []
    try:
        rate, nch, bitrate0, n_frames, reservoir, pending = _walk_frames(
            b, max_frames
        )
        for fi, (si, start) in enumerate(pending):
            r = _Bits(reservoir, start * 8)
            prev_by_ch: dict[int, list[int]] = {}
            for gr in range(2):
                for c in range(len(si["granules"][gr])):
                    ch = si["granules"][gr][c]
                    if ch["block_type"] != 0:
                        raise NotImplementedError(
                            "spectra slice covers long-block granules only"
                        )
                    bit0 = r.pos
                    sf = _read_scalefacs(
                        r, ch, gr, si["scfsi"][c], prev_by_ch.get(c)
                    )
                    if gr == 0:
                        prev_by_ch[c] = sf
                    sels = set(ch["table_select"])
                    if len(sels) > 1:
                        raise NotImplementedError(
                            "per-region table changes need the B.8 region "
                            "boundaries — outside the validated slice"
                        )
                    sel = ch["table_select"][0]
                    if sel not in _HUFF_BIG:
                        raise NotImplementedError(
                            f"Huffman table {sel} not shipped (tables 2-31 "
                            "are ISO B.7 data; the decode machinery is "
                            "table-driven)"
                        )
                    tab = _HUFF_BIG[sel]
                    ix: list[int] = []
                    for _ in range(ch["big_values"]):
                        x, y = (0, 0) if tab is None else _huff_decode_pair(
                            r, tab
                        )
                        if x and r.read(1):
                            x = -x
                        if y and r.read(1):
                            y = -y
                        ix.extend((x, y))
                    if r.pos < bit0 + ch["part2_3_length"]:
                        raise NotImplementedError(
                            "count1 spectral data present — count1 Huffman "
                            "tables are outside the validated slice"
                        )
                    if r.pos > bit0 + ch["part2_3_length"]:
                        raise ValueError(
                            "Huffman decode overran part2_3_length"
                        )
                    if band_widths is None:
                        if ch["preflag"] or any(sf):
                            raise NotImplementedError(
                                "nonzero scalefacs need band_widths (ISO "
                                "B.8 per-rate tables — spec data this "
                                "slice doesn't ship); pass them explicitly"
                            )
                        atten = [0.0] * len(ix)
                    else:
                        if ch["preflag"]:
                            # ISO 2.4.3.4's term is scalefac + preflag·
                            # pretab — pretab is another table of spec
                            # constants this slice doesn't ship, and
                            # silently dropping it would be a wrong
                            # answer (the None branch's own rule)
                            raise NotImplementedError(
                                "preflag pretab attenuation is outside "
                                "the validated slice"
                            )
                        mult = 0.5 * (ch["scalefac_scale"] + 1)
                        atten = []
                        for band, width in enumerate(band_widths):
                            a = mult * (sf[band] if band < len(sf) else 0)
                            atten.extend([a] * width)
                        atten.extend([0.0] * max(0, len(ix) - len(atten)))
                    gain = 0.25 * (ch["global_gain"] - 210)
                    xr = [
                        0.0 if v == 0 else
                        (1 if v > 0 else -1) * abs(v) ** (4.0 / 3.0)
                        * 2.0 ** (gain - atten[i])
                        for i, v in enumerate(ix)
                    ]
                    granules.append(
                        {
                            "frame": fi,
                            "granule": gr,
                            "channel": c,
                            "global_gain": ch["global_gain"],
                            "scalefac_scale": ch["scalefac_scale"],
                            "block_type": ch["block_type"],
                            "subblock_gain": ch["subblock_gain"],
                            "scalefacs": sf,
                            "ix": ix,
                            "xr": xr,
                        }
                    )
    except (IndexError, struct.error) as e:
        raise ValueError(f"malformed mp3 stream: {e}") from e
    if not granules:
        raise ValueError("mp3 stream yielded no parsable granules")
    return {
        "rate": rate,
        "nch": nch,
        "bitrate_kbps": bitrate0,
        "n_frames": n_frames,
        "granules": granules,
    }


def _granule_bands(g: dict, n_bands: int = 9) -> list[float]:
    """Per-band log-domain loudness proxy of one granule: global_gain
    minus the scaled scalefactor attenuation, folded into `n_bands`
    groups (short-block windows average into their band)."""
    sf = g["scalefacs"] or [0]
    scale = 2 * (g["scalefac_scale"] + 1)
    # fold the scalefactor list into n_bands groups by position
    per = max(1, len(sf) // n_bands)
    bands = []
    for i in range(n_bands):
        chunk = sf[i * per : (i + 1) * per] or [sf[-1]]
        bands.append(g["global_gain"] - scale * sum(chunk) / len(chunk))
    return bands


def mp3_envelope_fp64_windows(
    env: dict, granules_per_window: int = 8
) -> list[int]:
    """64-bit fingerprints over consecutive blocks of channel-0
    granules: each window is 8 granule-frames x 9 envelope bands, and
    each bit is the sign of the adjacent-band loudness difference —
    the SAME Haitsma-Kalker bit scheme as the PCM ladder's
    _spectral_fp64, computed from the coded envelope instead of an
    FFT. Windows shorter than half a block are dropped (the PCM
    ladder's rule)."""
    gs = [g for g in env["granules"] if g["channel"] == 0]
    out = []
    for off in range(0, len(gs), granules_per_window):
        win = gs[off : off + granules_per_window]
        if len(win) < max(2, granules_per_window // 2):
            break
        # resample the window onto exactly 8 rows like _spectral_fp64
        rows = [
            _granule_bands(win[min(len(win) - 1, round(i * (len(win) - 1) / 7))])
            for i in range(8)
        ]
        bits = 0
        i = 0
        for row in rows:
            for a, bnd in zip(row[:-1], row[1:]):
                if a - bnd > 0:
                    bits |= 1 << i
                i += 1
        out.append(bits - (1 << 64) if bits >= (1 << 63) else bits)
    return out


# -- writer (silence frames, caller-chosen envelope) -----------------


class _BitW:
    def __init__(self):
        self.bits: list[int] = []

    def write(self, v: int, n: int):
        for i in range(n - 1, -1, -1):
            self.bits.append((v >> i) & 1)

    def tobytes(self, pad_to: int | None = None) -> bytes:
        bits = self.bits[:]
        while len(bits) % 8:
            bits.append(0)
        raw = bytearray()
        for i in range(0, len(bits), 8):
            byte = 0
            for bit in bits[i : i + 8]:
                byte = (byte << 1) | bit
            raw.append(byte)
        if pad_to is not None:
            if len(raw) > pad_to:
                raise ValueError("payload exceeds frame size")
            raw += b"\x00" * (pad_to - len(raw))
        return bytes(raw)


def encode_mp3_silence(
    gains: list[int],
    rate: int = 48000,
    bitrate_kbps: int = 128,
    scalefac_compress: int = 15,
    scalefacs: list[list[int]] | None = None,
    scalefac_scale: int = 0,
    scfsi: list[int] | None = None,
) -> bytes:
    """Standard-conformant CBR mono Layer III frames carrying DIGITAL
    SILENCE (big_values=0, no count1 data — an empty spectrum is
    valid) with caller-chosen per-granule global_gain and scale
    factors: `gains` has one entry per granule (2 per frame, padded
    with the last value), `scalefacs[i]` optionally gives granule i's
    21 long-block scale factors. ``scfsi`` (4 band-group flags) makes
    granule 1 REUSE granule 0's scale factors for the flagged groups —
    those bands' bits are then ABSENT from granule 1's part2, exactly
    as the spec transmits them (the reuse branch real encoders emit
    constantly). The envelope parser must read every value back
    exactly — the WAV/FLAC-style self-round-trip."""
    if not gains:
        raise ValueError("need at least one granule gain")
    if rate not in _RATES:
        raise ValueError(f"rate must be one of {_RATES}")
    if bitrate_kbps not in _BITRATES_L3[1:]:  # [0]=0 is free-format
        raise ValueError("not a Layer III bitrate")
    if len(gains) % 2:
        gains = gains + [gains[-1]]
        if scalefacs is not None:
            scalefacs = list(scalefacs) + [[0] * 21]  # pad like gains
    s1 = _SLEN1[scalefac_compress]
    s2 = _SLEN2[scalefac_compress]
    flags = scfsi or [0, 0, 0, 0]
    if len(flags) != 4:
        raise ValueError("scfsi takes 4 band-group flags")

    def _part2_bits(g: int) -> int:
        # granule 1 omits every scfsi-flagged group's bits
        bits = 0
        for band in range(21):
            group = next(
                i for i, (a, e) in enumerate(_SCFSI_BANDS) if a <= band < e
            )
            if g == 1 and flags[group]:
                continue
            bits += s1 if band < 11 else s2
        return bits

    frame_len = 144 * bitrate_kbps * 1000 // rate
    out = b""
    for f in range(len(gains) // 2):
        header = (
            (0x7FF << 21) | (0x3 << 19) | (0x1 << 17) | (1 << 16)  # no CRC
            | (_BITRATES_L3.index(bitrate_kbps) << 12)
            | (_RATES.index(rate) << 10)
            | (0 << 9)            # padding
            | (0x3 << 6)          # mono
        )
        si = _BitW()
        si.write(0, 9)            # main_data_begin: no reservoir
        si.write(0, 5)            # private
        for flag in flags:
            si.write(flag, 1)
        for g in range(2):
            si.write(_part2_bits(g), 12)  # part2_3_length: scalefacs only
            si.write(0, 9)        # big_values
            si.write(gains[f * 2 + g], 8)
            si.write(scalefac_compress, 4)
            si.write(0, 1)        # no window switching
            for _ in range(3):
                si.write(0, 5)    # table_select
            si.write(0, 4)        # region0_count
            si.write(0, 3)        # region1_count
            si.write(0, 1)        # preflag
            si.write(scalefac_scale, 1)
            si.write(0, 1)        # count1table_select
        md = _BitW()
        for g in range(2):
            sf = (
                scalefacs[f * 2 + g]
                if scalefacs is not None
                else [0] * 21
            )
            if len(sf) != 21:
                raise ValueError("long-block granules carry 21 scalefacs")
            for band in range(21):
                group = next(
                    i for i, (a, e) in enumerate(_SCFSI_BANDS) if a <= band < e
                )
                if g == 1 and flags[group]:
                    continue  # reused from granule 0: bits absent
                sl = s1 if band < 11 else s2
                if not 0 <= sf[band] < (1 << sl):
                    raise ValueError(
                        f"scalefac {sf[band]} exceeds band {band}'s "
                        f"{sl}-bit field (scalefac_compress="
                        f"{scalefac_compress})"
                    )
                md.write(sf[band], sl)
        body = si.tobytes(17) + md.tobytes(frame_len - 4 - 17)
        out += struct.pack(">I", header) + body
    return out

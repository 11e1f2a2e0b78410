"""Pure-numpy MPEG-1 Audio Layer I + Layer II codec (.mp1/.mp2).

Reference parity: /root/reference/src/media_fingerprinting.py treats
audio via external codec libraries; this container has none, so the
repo decodes the formats that are tractable from the public spec
(ISO/IEC 11172-3) with stdlib+numpy only. Layer I is fully specified
by closed forms — 4-bit allocation per subband, the scalefactor table
SF[i] = 2*2^(-i/3), (2^nb - 1)-level midtread requantization — except
for the 512-tap analysis/synthesis window tables (B.3), which are
numeric tables with no closed form. Those are substituted with a
COMPUTED near-perfect-reconstruction pseudo-QMF prototype (Kaiser-
windowed sinc, cutoff tuned for power complementarity; measured
round-trip SNR ~55 dB through the full spec filterbank structure).
Consequence: our encoder<->decoder round-trips are near-transparent,
and third-party Layer I/II streams decode with a perceptually-
equivalent but not bit-identical window — fine for the feature/
fingerprint pipeline, stated here so nobody mistakes it for a
conformance decoder.

Layer II (round 4, completed round 5): the allocation-class structure
— per-subband nbal widths, the quantizer-class lists including the
GROUPED classes (3/5/9 levels packed 3-samples-per-code in 5/7/10
bits), scfsi scalefactor sharing, and the 36-sample granule layout —
is implemented for ALL FOUR allocation tables B.2a/b/c/d (Annex B
public data), selected from (sample rate, kbps per channel) per
§2.4.2.6. That covers every MPEG-1 Layer II regime: 48 kHz (B.2a),
44.1/32 kHz high-rate (B.2b, sblimit 30), and the low-bitrate tables
(B.2c/d, sblimit 8/12, grouped 9-level class). Layer III still raises
(Huffman tables).
Dequantization uses the same midtread family as Layer I
(s = (2q + 1 - n)/n), omitting the B.4 C/D slope corrections
(sub-0.3 dB effect, irrelevant to fingerprinting).

Bitstream layout implemented (Layer I, mono + stereo):
  header(32) [crc(16) skipped] alloc(4 x 32 x nch)
  scf(6 per allocated (sb,ch)) then 12 granules of one nb-bit sample
  per allocated (sb,ch), MSB-first, zero-padded to the frame slot
  boundary (slot = 4 bytes in Layer I).
Layer II (slot = 1 byte, 1152 samples/frame):
  header(32) [crc(16) skipped] alloc(nbal[sb] x sblimit x nch)
  scfsi(2 per allocated (sb,ch)) scf(6 x {1,2,3} per scfsi)
  12 granules x allocated (sb,ch) of one grouped code or 3 codes.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["is_mpa", "decode_mpa", "encode_mpa", "encode_mp2"]

_RATES = {0: 44100, 1: 48000, 2: 32000}
_RATE_IDX = {v: k for k, v in _RATES.items()}
# Layer I bitrate table (kbps), index 1..14
_BITRATES_L1 = [0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448]

# Scalefactor table B.1: SF[i] = 2 * 2^(-i/3), i = 0..62
_SCALEFACTORS = 2.0 * np.power(2.0, -np.arange(63) / 3.0)

_NBANDS, _PROTO_LEN = 32, 512

# ---- Layer II tables -------------------------------------------------
# Bitrate table (kbps), index 1..14.
_BITRATES_L2 = [0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384]

# Quantizer classes: nlevels -> (grouped, code_bits). Grouped classes
# pack one granule's 3 samples into a single base-nlevels code.
_L2_CLASS = {
    3: (True, 5), 5: (True, 7), 9: (True, 10),
    7: (False, 3), 15: (False, 4), 31: (False, 5), 63: (False, 6),
    127: (False, 7), 255: (False, 8), 511: (False, 9), 1023: (False, 10),
    2047: (False, 11), 4095: (False, 12), 8191: (False, 13),
    16383: (False, 14), 32767: (False, 15), 65535: (False, 16),
}

# Allocation tables B.2a-d (ISO/IEC 11172-3 Annex B): per-subband
# allocation-field width and allocation-index -> nlevels list (index 0
# = no allocation). B.2b extends B.2a's top class from sblimit 27 to
# 30; B.2c/d are the low-bitrate tables (sblimit 8 / 12) with their own
# step list that keeps the GROUPED 9-level class and drops 7.
_B2A_SB_HI = [0, 3, 7, 15, 31, 63, 127, 255, 511, 1023, 2047, 4095,
              8191, 16383, 32767, 65535]                      # sb 0-2, nbal 4
_B2A_SB_MID = [0, 3, 5, 7, 9, 15, 31, 63, 127, 255, 511, 1023, 2047,
               4095, 8191, 65535]                             # sb 3-10, nbal 4
_B2A_SB_LOW = [0, 3, 5, 7, 9, 15, 31, 65535]                  # sb 11-22, nbal 3
_B2A_SB_TOP = [0, 3, 5, 65535]                                # sb 23+, nbal 2
_B2CD_HI = [0, 3, 5, 9, 15, 31, 63, 127, 255, 511, 1023, 2047,
            4095, 8191, 16383, 32767]                         # sb 0-1, nbal 4
_B2CD_LO = [0, 3, 5, 9, 15, 31, 63, 127]                      # sb 2+, nbal 3
_B2A_SBLIMIT = 27

# layout: per-subband (nbal, allocation row), length = sblimit
_L2_LAYOUTS = {
    "a": [(4, _B2A_SB_HI)] * 3 + [(4, _B2A_SB_MID)] * 8
         + [(3, _B2A_SB_LOW)] * 12 + [(2, _B2A_SB_TOP)] * 4,
    "b": [(4, _B2A_SB_HI)] * 3 + [(4, _B2A_SB_MID)] * 8
         + [(3, _B2A_SB_LOW)] * 12 + [(2, _B2A_SB_TOP)] * 7,
    "c": [(4, _B2CD_HI)] * 2 + [(3, _B2CD_LO)] * 6,
    "d": [(4, _B2CD_HI)] * 2 + [(3, _B2CD_LO)] * 10,
}


# Vectorized-decode views of _L2_LAYOUTS: per-subband nbal widths and a
# dense (sblimit, 16) allocation-code -> nlevels matrix (codes are
# < 2^nbal <= 16; unused cells stay 0 = no allocation).
_L2_LAYOUT_ARRAYS: dict[str, tuple[np.ndarray, np.ndarray]] = {}


def _l2_layout_arrays(table_id: str) -> tuple[np.ndarray, np.ndarray]:
    got = _L2_LAYOUT_ARRAYS.get(table_id)
    if got is None:
        layout = _L2_LAYOUTS[table_id]
        nbal = np.array([n for n, _ in layout], dtype=np.int64)
        row = np.zeros((len(layout), 16), dtype=np.int64)
        for sb, (_, r) in enumerate(layout):
            row[sb, : len(r)] = r
        got = _L2_LAYOUT_ARRAYS[table_id] = (nbal, row)
    return got


def _l2_table_id(rate: int, bitrate_kbps: int, nch: int) -> str:
    """Table selection per ISO/IEC 11172-3 §2.4.2.6 (the 'Table B.2x'
    choice is a pure function of sample rate and kbps PER CHANNEL —
    the same predicate every public Layer II codec carries)."""
    bpc = bitrate_kbps // nch
    if (rate == 48000 and bpc >= 56) or (56 <= bpc <= 80):
        return "a"
    if rate != 48000 and bpc >= 96:
        return "b"
    if rate != 32000 and bpc <= 48:
        return "c"
    return "d"


def _prototype() -> np.ndarray:
    """Near-PR pseudo-QMF prototype for the spec filterbank structure.

    Centered at n=256 (the phase condition (2k+1)*(center-16)/64 must
    alternate +-1/4 mod 1 across subbands for alias cancellation,
    which holds at 256, not 255.5 — same reason the spec's own table
    is odd-symmetric about its midpoint). Cutoff 1.14x pi/64 and
    Kaiser beta=10 grid-searched for round-trip SNR (~55 dB)."""
    n = np.arange(_PROTO_LEN)
    alpha = 1.14
    h = np.sinc((n - 256.0) * alpha / 64.0) * alpha / 64.0
    w = np.kaiser(513, 10.0)[:_PROTO_LEN]
    return h * w


_SIGN = np.where((np.arange(_PROTO_LEN) // 64) % 2 == 1, -1.0, 1.0)
_C = _prototype() * _SIGN          # analysis window
# Synthesis gain calibrated so analysis->synthesis is unity (the 3.9965
# measured optimum is the structural 4x; folded in exactly below).
_D = 32.0 * 3.9965 * _prototype() * _SIGN
# Modulation matrices (spec 2.4.3.3 / A.2): analysis 32x64, synthesis 64x32.
_M_ANA = np.cos(
    (2 * np.arange(32)[:, None] + 1) * (np.arange(64)[None, :] - 16) * np.pi / 64
)
_N_SYN = np.cos(
    (16 + np.arange(64)[:, None]) * (2 * np.arange(32)[None, :] + 1) * np.pi / 64
)


def is_mpa(b: bytes) -> bool:
    """True for an MPEG-1 Layer I/II/III frame sync at offset 0 (we don't
    scan for embedded sync; the pipeline writes headerless streams)."""
    if len(b) < 4:
        return False
    h = struct.unpack(">I", b[:4])[0]
    return (
        (h >> 21) & 0x7FF == 0x7FF       # sync
        and (h >> 19) & 0x3 == 0x3       # MPEG-1
        and (h >> 17) & 0x3 != 0x0       # layer field valid
        and (h >> 12) & 0xF not in (0, 15)
        and (h >> 10) & 0x3 != 0x3
    )


# ---------------------------------------------------------------- filterbank


def _analyze(x: np.ndarray) -> np.ndarray:
    """x (float mono) -> subband samples S[m, 32], one row per 32 input
    samples. Fully vectorized: the spec's X-fifo 'newest sample at
    X[0]' makes window m read x reversed — row m of the window matrix
    is x[32m+31], x[32m+30], ..., x[32m-480]."""
    nblk = len(x) // 32
    xp = np.concatenate([np.zeros(_PROTO_LEN - 32), x[: nblk * 32]])
    rev = xp[::-1]
    # reversed signal: window for block m starts at len(xp)-32(m+1)
    wins = np.lib.stride_tricks.sliding_window_view(rev, _PROTO_LEN)
    # block m's newest sample is xp[511 + 32m]; X[n] = xp[511 + 32m - n]
    # = rev[(len - 512 - 32m) + n]
    starts = len(xp) - _PROTO_LEN - 32 * np.arange(nblk)
    Z = wins[starts] * _C
    Y = Z.reshape(nblk, 8, 64).sum(axis=1)
    return Y @ _M_ANA.T


def _synthesize(S: np.ndarray) -> np.ndarray:
    """Subband samples S[m, 32] -> PCM, vectorized over blocks via a
    sliding window on the V sequence (the spec's 1024-value fifo holds
    the last 16 V vectors; U interleaves half of each)."""
    nblk = len(S)
    V = S @ _N_SYN.T                                   # (m, 64)
    Vp = np.concatenate([np.zeros((15, 64)), V])       # fifo pre-roll
    hist = np.lib.stride_tricks.sliding_window_view(Vp, (16, 64))[:, 0]
    # hist[m, j, :]: j=15 is block m (newest). U[64j:64j+32] = fifo[128j:+32],
    # U[64j+32:64j+64] = fifo[128j+96:+128]; fifo slot j maps to hist 15-j//2.
    U = np.empty((nblk, _PROTO_LEN))
    # fifo index f in 0..15 (f=0 newest): fifo[64f:64f+64] = hist[:, 15-f]
    for j in range(8):
        U[:, 64 * j : 64 * j + 32] = hist[:, 15 - 2 * j][:, 0:32]
        U[:, 64 * j + 32 : 64 * j + 64] = hist[:, 15 - (2 * j + 1)][:, 32:64]
    W = U * _D
    return W.reshape(nblk, 16, 32).sum(axis=1).reshape(-1)


# ------------------------------------------------------------------- decode


class _BitReader:
    def __init__(self, data: bytes, pos_bits: int = 0):
        self.bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8))
        self.pos = pos_bits

    def read(self, n: int) -> int:
        v = 0
        for b in self.bits[self.pos : self.pos + n]:
            v = (v << 1) | int(b)
        self.pos += n
        return v


def _read_eq(bits: np.ndarray, starts: np.ndarray, width: int) -> np.ndarray:
    """Gather len(starts) MSB-first fields of `width` bits each from an
    unpacked bit array — one fancy-indexed read + one matvec, replacing
    a per-bit Python loop per field (the round-5 sweep's decode hot
    spot: ~2850 `_BitReader.read` calls per Layer II frame).

    Truncated input raises ValueError, not a bare IndexError out of the
    fancy index: the decode-ladder contract (multimodal catches
    ValueError to fall back gracefully) — the pre-vectorization
    per-field reads degraded to short slices, which the explicit
    sample-gather guards then caught; batched gathers must check."""
    if width == 0 or len(starts) == 0:
        return np.zeros(len(starts), dtype=np.int64)
    starts = np.asarray(starts)
    if int(starts.max()) + width > len(bits):
        raise ValueError("truncated MPEG-1 audio frame")
    bp = starts[:, None] + np.arange(width)[None, :]
    return bits[bp].astype(np.int64) @ (1 << np.arange(width - 1, -1, -1))


def _read_var(bits: np.ndarray, pos: int, widths: np.ndarray) -> tuple[np.ndarray, int]:
    """Sequential variable-width fields: batched per distinct width."""
    widths = np.asarray(widths, dtype=np.int64)
    if len(widths) == 0:
        return np.zeros(0, dtype=np.int64), pos
    ends = pos + np.cumsum(widths)
    starts = ends - widths
    vals = np.zeros(len(widths), dtype=np.int64)
    for w in np.unique(widths):
        if w:
            m = widths == w
            vals[m] = _read_eq(bits, starts[m], int(w))
    return vals, int(ends[-1])


def _dequant(raw: np.ndarray, nb: int) -> np.ndarray:
    """(2^nb - 1)-level midtread requantization (spec 2.4.3.3):
    s'' = (2^nb / (2^nb - 1)) * ((raw + 1) * 2^(1-nb) - 1)."""
    two_nb = 1 << nb
    return (two_nb / (two_nb - 1.0)) * ((raw + 1.0) * (2.0 / two_nb) - 1.0)


def _decode_frame_l2(
    frame: bytes, nch: int, protection: int, table_id: str = "a"
) -> np.ndarray:
    """One Layer II frame -> subband samples (36, 32, nch), allocation
    table B.2{a,b,c,d} selected by the caller from (rate, bitrate).
    Sample extraction is vectorized the same way as Layer I's: all 12
    granules share one bit layout, so each slot gathers its 12 codes
    in one indexed read."""
    bits = np.unpackbits(np.frombuffer(frame, dtype=np.uint8))
    pos = 32 + (16 if protection == 0 else 0)
    nbal_arr, row_mat = _l2_layout_arrays(table_id)
    sbl = len(nbal_arr)
    # allocation: field widths are fixed by the layout (sb-major,
    # ch-minor), so every alloc code gathers in one batched read
    codes, pos = _read_var(bits, pos, np.repeat(nbal_arr, nch))
    sb_of = np.repeat(np.arange(sbl), nch)
    ch_of = np.tile(np.arange(nch), sbl)
    alloc_flat = row_mat[sb_of, codes]  # nlevels, 0 = none
    am = alloc_flat > 0
    n_alloc = int(am.sum())
    # scfsi: 2 bits per allocated slot, positions now known
    scfsi_a = _read_eq(bits, pos + 2 * np.arange(n_alloc), 2)
    pos += 2 * n_alloc
    # scalefactors: scfsi selects how many 6-bit reads each slot makes
    # (0 -> 3 reads a,b,c; 1 -> 2 reads a=b,c; 2 -> 1 read a=b=c;
    # 3 -> 2 reads a,b=c); read the whole 6-bit run once, then map
    # each part to its read by per-pattern offset
    nreads = np.array([3, 2, 1, 2])[scfsi_a]
    b_off = np.array([1, 0, 0, 1])[scfsi_a]
    c_off = np.array([2, 1, 0, 1])[scfsi_a]
    total_reads = int(nreads.sum())
    reads = _read_eq(bits, pos + 6 * np.arange(total_reads), 6)
    pos += 6 * total_reads
    first = np.concatenate([[0], np.cumsum(nreads)[:-1]]).astype(np.int64)
    scf = np.ones((3, sbl, nch))
    if n_alloc:
        idx3 = np.stack([first, first + b_off, first + c_off])  # (3, n_alloc)
        scf[:, am.reshape(sbl, nch)] = _SCALEFACTORS[np.minimum(reads[idx3], 62)]
    # One granule = 3 samples per allocated (sb, ch); fixed record.
    # Slots batch by quantizer class — (grouped, code_bits) determines
    # nlevels uniquely in B.2 — so each class is one gather + one matvec
    # over (slots_in_class, 12 granules, [3,] bits).
    sb_a, ch_a = sb_of[am], ch_of[am]
    n_a = alloc_flat[am]
    grouped_a = np.isin(n_a, (3, 5, 9))
    bits_a = np.array([_L2_CLASS[int(n)][1] for n in n_a], dtype=np.int64)
    w_a = np.where(grouped_a, bits_a, 3 * bits_a)
    off_a = np.concatenate([[0], np.cumsum(w_a)[:-1]]).astype(np.int64)
    granule_bits = int(w_a.sum())
    base = pos + granule_bits * np.arange(12)
    # Truncated final frame: the fancy-indexed gather below would raise
    # a bare IndexError, escaping the decode ladder's ValueError-only
    # contract (multimodal catches ValueError to fall back gracefully).
    if n_alloc and int(base[-1]) + granule_bits > len(bits):
        raise ValueError("truncated Layer II frame")
    S = np.zeros((36, 32, nch))
    gr_part = np.arange(12) // 4  # scalefactor part per granule
    sf_a = scf[gr_part[:, None], sb_a[None, :], ch_a[None, :]]  # (12, n_alloc)
    for key in {(bool(g), int(w)) for g, w in zip(grouped_a, bits_a)}:
        g, w = key
        m = (grouped_a == g) & (bits_a == w)
        n = int(n_a[np.argmax(m)])
        if g:
            bp = base[None, :, None] + off_a[m][:, None, None] + np.arange(w)
            code = bits[bp].astype(np.int64) @ (1 << np.arange(w - 1, -1, -1))
            vals = np.stack(
                [code % n, (code // n) % n, (code // (n * n)) % n], axis=2
            )  # (k, 12, 3)
        else:
            bp = (
                base[None, :, None, None]
                + off_a[m][:, None, None, None]
                + (np.arange(3) * w)[None, None, :, None]
                + np.arange(w)
            )
            vals = bits[bp].astype(np.int64) @ (1 << np.arange(w - 1, -1, -1))
        deq = (2.0 * vals + 1.0 - n) / n                      # (k, 12, 3)
        S[:, sb_a[m], ch_a[m]] = (
            (sf_a[:, m].T[:, :, None] * deq).reshape(m.sum(), 36).T
        )
    return S


def decode_mpa(b: bytes) -> tuple[int, int, np.ndarray, str]:
    """Decode a Layer I or Layer II stream. Returns (rate, nch,
    channel-mean mono float in [-1,1], label) — the same contract as
    audio.decode_wav and flac.decode_flac so the multimodal ladder
    treats all three uniformly."""
    if not is_mpa(b):
        raise ValueError("not an MPEG-1 audio stream")
    pos = 0
    subbands: list[np.ndarray] = []  # per frame: (12 or 36, 32, nch)
    rate = nch = None
    label = "mp1-pure"
    while pos + 4 <= len(b):
        h = struct.unpack(">I", b[pos : pos + 4])[0]
        if (h >> 21) & 0x7FF != 0x7FF:
            break
        layer = (h >> 17) & 0x3
        if layer == 0x1:
            raise NotImplementedError(
                "MPEG-1 Layer III decode needs the Huffman tables (no "
                "closed form) — install a codec library for .mp3"
            )
        protection = (h >> 16) & 1
        bidx, ridx = (h >> 12) & 0xF, (h >> 10) & 0x3
        # reserved header codes: the decode-ladder contract is
        # ValueError for bad input, never a raw IndexError/KeyError
        # escaping into the Spark task
        if bidx in (0, 15) or ridx == 3:
            raise ValueError(
                f"reserved MPEG-1 header field (bitrate_index={bidx}, "
                f"sample_rate_index={ridx})"
            )
        if layer == 0x2:  # Layer II
            bitrate = _BITRATES_L2[bidx] * 1000
            rate = _RATES[ridx]
            padding = (h >> 9) & 1
            mode = (h >> 6) & 0x3
            nch = 1 if mode == 0x3 else 2
            tid = _l2_table_id(rate, _BITRATES_L2[bidx], nch)
            frame_len = 144 * bitrate // rate + padding
            subbands.append(
                _decode_frame_l2(b[pos : pos + frame_len], nch, protection, tid)
            )
            label = "mp2-pure"
            pos += frame_len
            continue
        bitrate = _BITRATES_L1[bidx] * 1000
        rate = _RATES[ridx]
        padding = (h >> 9) & 1
        mode = (h >> 6) & 0x3
        nch = 1 if mode == 0x3 else 2
        frame_len = (12 * bitrate // rate + padding) * 4
        frame = b[pos : pos + frame_len]
        bits = np.unpackbits(np.frombuffer(frame, dtype=np.uint8))
        bpos = 32 + (16 if protection == 0 else 0)
        # allocation: 32*nch fixed 4-bit fields -> one batched gather
        # (sb-major, ch-minor); intensity-stereo bound unused here
        alloc_flat = _read_eq(bits, bpos + 4 * np.arange(32 * nch), 4)
        bpos += 4 * 32 * nch
        am = alloc_flat > 0
        n_alloc = int(am.sum())
        sb_a = np.repeat(np.arange(32), nch)[am]
        ch_a = np.tile(np.arange(nch), 32)[am]
        scf_idx = np.zeros(32 * nch, dtype=np.int64)
        scf_idx[am] = _read_eq(bits, bpos + 6 * np.arange(n_alloc), 6)
        bpos += 6 * n_alloc
        scf = _SCALEFACTORS[np.minimum(scf_idx, 62)].reshape(32, nch)
        S = np.zeros((12, 32, nch))
        # Vectorized sample extraction: each granule is a fixed record
        # of the allocated (sb, ch) slots in order; slots batch by
        # sample width, each width one gather across all 12 granules.
        w_a = alloc_flat[am] + 1
        off_a = np.concatenate([[0], np.cumsum(w_a)[:-1]]).astype(np.int64)
        granule_bits = int(w_a.sum())
        base = bpos + granule_bits * np.arange(12)
        # same truncation guard as Layer II: ValueError, never a bare
        # IndexError out of the fancy-indexed gather
        if n_alloc and int(base[-1]) + granule_bits > len(bits):
            raise ValueError("truncated Layer I frame")
        for w in np.unique(w_a):
            m = w_a == w
            bp = base[None, :, None] + off_a[m][:, None, None] + np.arange(w)
            raw = bits[bp].astype(np.int64) @ (1 << np.arange(w - 1, -1, -1))
            S[:, sb_a[m], ch_a[m]] = _dequant(raw.astype(np.float64), int(w)).T
        subbands.append(S * scf[None, :, :])
        pos += frame_len
    if not subbands or rate is None:
        raise ValueError("no decodable MPEG-1 audio frames")
    allS = np.concatenate(subbands)  # (blocks, 32, nch)
    # Channel-mean downmix commutes with the (linear) synthesis
    # filterbank — average subbands first, synthesize once.
    out = _synthesize(allS.mean(axis=2))
    return rate, nch, out, label


# ------------------------------------------------------------------- encode


def _quant(s: np.ndarray, nb: int) -> np.ndarray:
    two_nb = 1 << nb
    q = np.rint((s * (two_nb - 1.0) / two_nb + 1.0) * (two_nb / 2.0) - 1.0)
    return np.clip(q, 0, two_nb - 2).astype(np.int64)


class _BitWriter:
    def __init__(self):
        self.out: list[int] = []

    def write(self, v: int, n: int):
        for i in range(n - 1, -1, -1):
            self.out.append((v >> i) & 1)

    def tobytes(self, pad_to: int) -> bytes:
        bits = np.array(self.out, dtype=np.uint8)
        bits = np.concatenate([bits, np.zeros(pad_to * 8 - len(bits), dtype=np.uint8)])
        return np.packbits(bits).tobytes()


def encode_mpa(samples: np.ndarray, rate: int) -> bytes:
    """Encode float PCM ((n,) or (n, ch), |x| <= ~1) as MPEG-1 Layer I
    at the smallest standard bitrate that fits a uniform allocation of
    at least 6 bits across all 32 subbands (no psychoacoustics — this
    encoder exists to round-trip the decoder and to synthesize
    deterministic compressed-audio fixtures)."""
    if rate not in _RATE_IDX:
        raise ValueError(f"Layer I sample rate must be one of {sorted(_RATE_IDX)}")
    x = np.asarray(samples, dtype=np.float64)
    if x.ndim == 1:
        x = x[:, None]
    nch = x.shape[1]
    if nch not in (1, 2):
        raise ValueError("mono or stereo only")
    n = (len(x) // 384) * 384
    if n == 0:
        raise ValueError("need at least 384 samples per channel")
    x = x[:n]
    S = np.stack([_analyze(x[:, ch]) for ch in range(nch)], axis=2)  # (blk,32,nch)
    nframes = len(S) // 12

    # fixed header bits per frame + alloc; find (bitrate, nb) with nb >= 6
    fixed = 32 + 32 * 4 * nch
    chosen = None
    for bi in range(1, 15):
        frame_bytes = (12 * _BITRATES_L1[bi] * 1000 // rate) * 4
        avail = frame_bytes * 8 - fixed - 6 * 32 * nch
        nb = min(avail // (12 * 32 * nch), 15)
        if nb >= 6:
            chosen = (bi, int(nb))
            if nb >= 10:
                break
    if chosen is None:
        raise ValueError("no Layer I bitrate fits at this sample rate")
    bi, nb = chosen
    frame_bytes = (12 * _BITRATES_L1[bi] * 1000 // rate) * 4
    mode = 0x3 if nch == 1 else 0x0
    header = (
        (0x7FF << 21) | (0x3 << 19) | (0x3 << 17) | (1 << 16)  # no CRC
        | (bi << 12) | (_RATE_IDX[rate] << 10) | (mode << 6)
    )
    # Static head layout (header + constant alloc + per-frame scf
    # indices): precompute the bit -> (field, shift) map once so each
    # frame's head packs with one gather (same trick as encode_mp2 —
    # the per-field _BitWriter loop was ~5 ms/stream of pure Python).
    head_widths = [32] + [4] * (32 * nch) + [6] * (32 * nch)
    hw = np.array(head_widths, dtype=np.int64)
    h_fob = np.repeat(np.arange(len(hw)), hw)
    h_sob = np.concatenate([np.arange(w - 1, -1, -1) for w in head_widths])
    head_static = np.array([header] + [nb - 1] * (32 * nch), dtype=np.int64)
    frames = []
    for f in range(nframes):
        Sf = S[f * 12 : (f + 1) * 12]  # (12, 32, nch)
        maxabs = np.abs(Sf).max(axis=0)  # (32, nch)
        # smallest scalefactor >= maxabs: largest index i with SF[i] >= maxabs
        idx = np.searchsorted(-_SCALEFACTORS, -np.minimum(maxabs, 2.0), side="right") - 1
        idx = np.clip(idx, 0, 62)
        scf = _SCALEFACTORS[idx]
        q = _quant(Sf / scf[None, :, :], nb)  # (12, 32, nch)
        V = np.concatenate([head_static, idx.reshape(-1)])
        head_bits = ((V[h_fob] >> h_sob) & 1).astype(np.uint8)
        # Vectorized sample packing: flat (g, sb, ch) order, nb bits each
        flat = q.reshape(-1)
        sample_bits = (
            ((flat[:, None] >> np.arange(nb - 1, -1, -1)[None, :]) & 1)
            .astype(np.uint8)
            .reshape(-1)
        )
        bits = np.concatenate([head_bits, sample_bits])
        bits = np.concatenate(
            [bits, np.zeros(frame_bytes * 8 - len(bits), dtype=np.uint8)]
        )
        frames.append(np.packbits(bits).tobytes())
    return b"".join(frames)


# Static encode allocation per table: the widest ungrouped class the
# default bitrates fit (a/b), and the GROUPED 9/3-level classes for the
# low-bitrate tables (c/d) where the budget is tight. Every class here
# exists in its table's allocation rows.
_L2_ENC_PLAN = {
    "a": [15] * 23 + [5] * 4,
    "b": [15] * 23 + [5] * 7,
    "c": [9] * 8,
    "d": [9] * 8 + [3] * 4,
}


def encode_mp2(
    samples: np.ndarray, rate: int = 48000, bitrate_kbps: int | None = None
) -> bytes:
    """Encode float PCM as MPEG-1 Layer II at 32/44.1/48 kHz. The
    allocation table (B.2a-d) follows the spec's (rate, kbps/channel)
    selection; the per-table static plan uses the 15-level (4-bit)
    class plus the GROUPED 5-level class on the top subbands (a/b), or
    the grouped 9/3-level classes for the low-bitrate tables (c/d).
    scfsi=0 (3 per-part scalefactors), no psychoacoustics — this
    encoder exists to round-trip the decoder and synthesize
    deterministic compressed-audio fixtures. Default bitrate is
    192 kbps mono / 384 stereo; pass e.g. bitrate_kbps=48 to produce a
    B.2c/d low-rate stream. 44.1 kHz frames use padding=0 (each frame
    self-describes its length; the stream is marginally under nominal
    CBR, which every decoder accepts)."""
    if rate not in _RATE_IDX:
        raise ValueError(f"Layer II sample rate must be one of {sorted(_RATE_IDX)}")
    x = np.asarray(samples, dtype=np.float64)
    if x.ndim == 1:
        x = x[:, None]
    nch = x.shape[1]
    if nch not in (1, 2):
        raise ValueError("mono or stereo only")
    n = (len(x) // 1152) * 1152
    if n == 0:
        raise ValueError("need at least 1152 samples per channel")
    x = x[:n]
    S = np.stack([_analyze(x[:, ch]) for ch in range(nch)], axis=2)  # (blk,32,nch)
    nframes = len(S) // 36

    if bitrate_kbps is None:
        bitrate_kbps = 192 if nch == 1 else 384
    if bitrate_kbps not in _BITRATES_L2[1:]:
        raise ValueError(f"not a Layer II bitrate: {bitrate_kbps} kbps")
    tid = _l2_table_id(rate, bitrate_kbps, nch)
    layout = _L2_LAYOUTS[tid]
    plan = list(_L2_ENC_PLAN[tid])
    sbl = len(layout)

    def _plan_bits(p: list[int]) -> int:
        fixed = 32 + sum(layout[sb][0] for sb in range(sbl)) * nch
        fixed += (2 + 18) * sbl * nch  # scfsi + 3 scalefactors
        gr = sum(
            _L2_CLASS[nl][1] * (1 if _L2_CLASS[nl][0] else 3) for nl in p
        )
        return fixed + 12 * gr * nch

    frame_bits = (144 * bitrate_kbps * 1000 // rate) * 8  # floor; padding=0
    # Tight budgets (low bitrate, stereo): downgrade top subbands to the
    # grouped 3-level class (present in every allocation row) until the
    # static layout fits.
    for sb in range(sbl - 1, -1, -1):
        if _plan_bits(plan) <= frame_bits:
            break
        if plan[sb] > 3:
            plan[sb] = 3
    alloc_idx = [layout[sb][1].index(plan[sb]) for sb in range(sbl)]
    # slot descriptors in bitstream order: (sb, nlevels, grouped, bits)
    slots = [(sb, plan[sb], *_L2_CLASS[plan[sb]]) for sb in range(sbl)]

    bi = _BITRATES_L2.index(bitrate_kbps)
    frame_bytes = 144 * bitrate_kbps * 1000 // rate  # floor; padding=0
    mode = 0x3 if nch == 1 else 0x0
    header = (
        (0x7FF << 21) | (0x3 << 19) | (0x2 << 17) | (1 << 16)  # layer II, no CRC
        | (bi << 12) | (_RATE_IDX[rate] << 10) | (mode << 6)
    )
    # The frame layout is STATIC (fixed allocation, scfsi=0), so the
    # (field -> width) sequence — and therefore the map from every
    # output bit to (its field, its shift) — is computed once; each
    # frame then packs with three vectorized array ops instead of a
    # per-field Python loop (the loop made encoding ~25x slower than
    # the filterbank it feeds).
    widths: list[int] = [32]                                   # header
    widths += [layout[sb][0] for sb in range(sbl) for _ in range(nch)]
    widths += [2] * (sbl * nch)                                # scfsi
    widths += [6] * (3 * sbl * nch)                            # scalefactors
    per_gr: list[int] = []                                     # granule codes
    for sb, _, grouped, bits in slots:
        per_gr += [bits] * (nch if grouped else 3 * nch)
    widths += per_gr * 12
    W = np.array(widths, dtype=np.int64)
    total_bits = frame_bytes * 8
    if int(W.sum()) > total_bits:
        raise ValueError(
            f"static B.2{tid} allocation needs {int(W.sum())} bits but the "
            f"{bitrate_kbps} kbps frame holds {total_bits} — pick a higher "
            f"bitrate or fewer channels"
        )
    field_of_bit = np.repeat(np.arange(len(W)), W)
    shift_of_bit = np.concatenate([np.arange(w - 1, -1, -1) for w in widths])
    static_head = np.array(
        [header]
        + [alloc_idx[sb] for sb in range(sbl) for _ in range(nch)]
        + [0] * (sbl * nch),
        dtype=np.int64,
    )
    pad = np.zeros(total_bits - int(W.sum()), dtype=np.uint8)

    # Frames quantize and pack in vectorized CHUNKS (the static
    # allocation makes every frame's field layout identical): per-slot
    # ops batch over the frame axis, then one bit gather + one
    # axis-aware packbits emits each chunk. Chunking bounds peak
    # memory — the one-pass form held (F, total_bits) int64
    # temporaries, ~64x the encoded output size, an OOM risk inside a
    # Spark task on long streams; the speedup comes from batching
    # fields, not from holding every frame at once. ~512 frames/chunk
    # keeps the working set at a few MB with the same throughput.
    gr_part = np.arange(12) // 4
    chunk = max(1, (1 << 23) // total_bits)
    out: list[bytes] = []
    for f0 in range(0, nframes, chunk):
        f1 = min(f0 + chunk, nframes)
        nf = f1 - f0
        Sc = S[f0 * 36 : f1 * 36]
        parts = Sc.reshape(nf, 3, 12, 32, nch)
        maxabs = np.abs(parts).max(axis=2)  # (nf, 3, 32, nch)
        idx = np.searchsorted(
            -_SCALEFACTORS, -np.minimum(maxabs, 2.0), side="right"
        ) - 1
        idx = np.clip(idx, 0, 62)
        scf = _SCALEFACTORS[idx]  # (nf, 3, 32, nch)
        # quantize every (frame, granule, sample, subband, channel) at
        # once, then lay the per-granule fields out in sb -> ch order
        # (the bitstream order; grouped slots pack 3 samples per code)
        tri_all = Sc.reshape(nf, 12, 3, 32, nch)
        sc_all = scf[:, gr_part]  # (nf, 12, 32, nch)
        blocks = []  # per sb: (nf, 12, nch or nch*3)
        for sb, nlev, grouped, _bits in slots:
            s = tri_all[:, :, :, sb, :] / sc_all[:, :, None, sb, :]
            q = np.clip(
                np.rint((s * nlev + nlev - 1.0) / 2.0), 0, nlev - 1
            ).astype(np.int64)
            if grouped:
                blocks.append(
                    q[:, :, 0] + nlev * q[:, :, 1] + nlev * nlev * q[:, :, 2]
                )
            else:
                blocks.append(q.transpose(0, 1, 3, 2).reshape(nf, 12, -1))
        gran_vals = np.concatenate(blocks, axis=2).reshape(nf, -1)
        scf_vals = (
            idx[:, :, :sbl, :].transpose(0, 2, 3, 1).reshape(nf, -1)
        )  # sb -> ch -> part
        V = np.concatenate(
            [np.broadcast_to(static_head, (nf, len(static_head))),
             scf_vals, gran_vals],
            axis=1,
        )
        bits = np.concatenate(
            [((V[:, field_of_bit] >> shift_of_bit) & 1).astype(np.uint8),
             np.broadcast_to(pad, (nf, len(pad)))],
            axis=1,
        )
        out.append(np.packbits(bits, axis=1).tobytes())
    return b"".join(out)

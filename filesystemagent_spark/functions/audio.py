"""Pure-stdlib+numpy WAV decoder beyond PCM.

The stdlib `wave` module reads PCM only; real-world RIFF/WAVE audio
also ships as G.711 mu-law (format tag 7), G.711 A-law (6), and IMA
ADPCM (0x11) — telephony and embedded recorders. This module parses
the RIFF fmt/data chunks directly and decodes all four, so the
multimodal ladder's `audio_features` (operators/multimodal.py) stays
REAL for every self-describing WAV variant; only genuinely
codec-bound formats (mp3/flac/ogg) remain gated.

Decoders return the channel-mean signal normalized to [-1, 1] as
float64. Encoders exist for every decoder (fixture writers): PCM16,
G.711 expanders are closed-form; the IMA ADPCM coder is the standard
step-table state machine (block header carries predictor + step
index, then 4-bit nibbles).
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["is_wav", "decode_wav", "encode_wav"]

WAVE_PCM = 0x0001
WAVE_ADPCM_IMA = 0x0011
WAVE_ALAW = 0x0006
WAVE_MULAW = 0x0007

_FMT_LABEL = {
    WAVE_PCM: "wav-pure",
    WAVE_MULAW: "wav-ulaw-pure",
    WAVE_ALAW: "wav-alaw-pure",
    WAVE_ADPCM_IMA: "wav-adpcm-pure",
}

_IMA_STEPS = np.array(
    [
        7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
        41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
        190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
        724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
        2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
        6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
        16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
    ],
    dtype=np.int64,
)
_IMA_INDEX_ADJ = np.array([-1, -1, -1, -1, 2, 4, 6, 8], dtype=np.int64)


def is_wav(b: bytes) -> bool:
    return b[:4] == b"RIFF" and b[8:12] == b"WAVE"


# ---------------------------------------------------------------------------
# G.711


def _mulaw_decode(u8: np.ndarray) -> np.ndarray:
    u = ~u8 & 0xFF
    sign = np.where(u & 0x80, -1.0, 1.0)
    exp = (u >> 4) & 0x07
    mant = u & 0x0F
    mag = ((mant.astype(np.int64) << 3) + 0x84) << exp
    return sign * (mag - 0x84) / 32124.0


def _mulaw_encode(x: np.ndarray) -> np.ndarray:
    pcm = np.clip(np.rint(x * 32124.0), -32124, 32124).astype(np.int64)
    sign = np.where(pcm < 0, 0x80, 0)
    mag = np.abs(pcm) + 0x84
    exp = np.floor(np.log2(mag)).astype(np.int64) - 7
    mant = (mag >> (exp + 3)) & 0x0F
    return (~(sign | (exp << 4) | mant) & 0xFF).astype(np.uint8)


def _alaw_decode(u8: np.ndarray) -> np.ndarray:
    a = (u8 ^ 0x55).astype(np.int64)
    sign = np.where(a & 0x80, 1.0, -1.0)  # A-law sign bit 1 = positive
    exp = (a >> 4) & 0x07
    mant = a & 0x0F
    mag = np.where(
        exp == 0, (mant << 4) + 8, ((mant << 4) + 0x108) << (exp - 1)
    )
    return sign * mag / 32768.0


def _alaw_encode(x: np.ndarray) -> np.ndarray:
    pcm = np.clip(np.rint(x * 32768.0), -32768, 32767).astype(np.int64)
    sign = np.where(pcm >= 0, 0x80, 0)
    mag = np.minimum(np.abs(pcm), 32767)
    exp = np.maximum(np.floor(np.log2(np.maximum(mag, 1))).astype(np.int64) - 7, 0)
    mant = np.where(exp == 0, mag >> 4, (mag >> (exp + 3)) & 0x0F)
    return ((sign | (exp << 4) | mant) ^ 0x55).astype(np.uint8)


# ---------------------------------------------------------------------------
# IMA ADPCM (mono blocks)


def _adpcm_decode_block(data: bytes, n_samples: int) -> np.ndarray:
    pred, index = struct.unpack("<hB", data[:3])
    index = int(np.clip(index, 0, 88))
    out = np.empty(n_samples, np.int64)
    out[0] = pred
    nib = []
    for byte in data[4:]:
        nib.append(byte & 0x0F)
        nib.append(byte >> 4)
    for i in range(1, n_samples):
        n = nib[i - 1]
        step = int(_IMA_STEPS[index])
        diff = step >> 3
        if n & 1:
            diff += step >> 2
        if n & 2:
            diff += step >> 1
        if n & 4:
            diff += step
        pred = pred - diff if n & 8 else pred + diff
        pred = max(-32768, min(32767, pred))
        out[i] = pred
        index = max(0, min(88, index + int(_IMA_INDEX_ADJ[n & 7])))
    return out


def _adpcm_encode_block(samples: np.ndarray, index: int) -> tuple[bytes, int]:
    pred = int(samples[0])
    out = bytearray(struct.pack("<hBB", pred, index, 0))
    nibbles = []
    for s in samples[1:]:
        step = int(_IMA_STEPS[index])
        delta = int(s) - pred
        n = 8 if delta < 0 else 0
        delta = abs(delta)
        diff = step >> 3
        if delta >= step:
            n |= 4
            delta -= step
            diff += step
        if delta >= step >> 1:
            n |= 2
            delta -= step >> 1
            diff += step >> 1
        if delta >= step >> 2:
            n |= 1
            diff += step >> 2
        pred = pred - diff if n & 8 else pred + diff
        pred = max(-32768, min(32767, pred))
        nibbles.append(n)
        index = max(0, min(88, index + int(_IMA_INDEX_ADJ[n & 7])))
    if len(nibbles) % 2:
        nibbles.append(0)
    for lo, hi in zip(nibbles[::2], nibbles[1::2]):
        out.append(lo | (hi << 4))
    return bytes(out), index


# ---------------------------------------------------------------------------
# container


def decode_wav(b: bytes) -> tuple[int, int, np.ndarray, str]:
    """WAV bytes -> (sample_rate, n_channels, mono float64 in [-1,1],
    decoder_label). Channel-mean downmix for multichannel PCM/G.711;
    IMA ADPCM is decoded mono (the fixture writer's layout). Raises
    ValueError on non-WAV or unsupported format tags."""
    if not is_wav(b):
        raise ValueError("not a WAV")
    try:
        return _decode_wav(b)
    except (struct.error, IndexError) as e:
        raise ValueError(f"malformed WAV: {e}") from e


def _decode_wav(b: bytes) -> tuple[int, int, np.ndarray, str]:
    fmt_tag = nch = rate = bits = block_align = None
    data = None
    pos = 12
    while pos + 8 <= len(b):
        cid = b[pos : pos + 4]
        size = struct.unpack("<I", b[pos + 4 : pos + 8])[0]
        payload = b[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt_tag, nch, rate, _bps, block_align, bits = struct.unpack(
                "<HHIIHH", payload[:16]
            )
        elif cid == b"data":
            data = payload
        pos += 8 + size + (size & 1)
    if fmt_tag is None or data is None:
        raise ValueError("WAV missing fmt or data chunk")
    label = _FMT_LABEL.get(fmt_tag)
    if label is None:
        raise ValueError(f"unsupported WAV format tag 0x{fmt_tag:04x}")
    if fmt_tag == WAVE_PCM:
        if bits == 16:
            x = np.frombuffer(data, dtype="<i2").astype(np.float64) / 32768.0
        elif bits == 8:
            x = (np.frombuffer(data, np.uint8).astype(np.float64) - 128.0) / 128.0
        else:
            raise ValueError(f"{bits}-bit PCM unsupported")
        x = x[: (len(x) // nch) * nch].reshape(-1, nch).mean(axis=1)
    elif fmt_tag in (WAVE_MULAW, WAVE_ALAW):
        u = np.frombuffer(data, np.uint8)
        x = (_mulaw_decode if fmt_tag == WAVE_MULAW else _alaw_decode)(u)
        x = x[: (len(x) // nch) * nch].reshape(-1, nch).mean(axis=1)
    else:  # IMA ADPCM, mono
        if nch != 1:
            raise ValueError("multichannel IMA ADPCM unsupported")
        samples_per_block = (block_align - 4) * 2 + 1
        chunks = []
        for off in range(0, len(data), block_align):
            block = data[off : off + block_align]
            if len(block) < 4:
                break
            n = min(samples_per_block, (len(block) - 4) * 2 + 1)
            chunks.append(_adpcm_decode_block(block, n))
        x = np.concatenate(chunks).astype(np.float64) / 32768.0
    return rate, nch, x, label


def encode_wav(
    x: np.ndarray, rate: int, fmt: int = WAVE_PCM, block_align_adpcm: int = 256
) -> bytes:
    """mono float64 [-1,1] -> WAV bytes in the requested format."""
    if fmt == WAVE_PCM:
        payload = (
            np.clip(np.rint(x * 32768.0), -32768, 32767).astype("<i2").tobytes()
        )
        block_align, bits = 2, 16
    elif fmt == WAVE_MULAW:
        payload = _mulaw_encode(x).tobytes()
        block_align, bits = 1, 8
    elif fmt == WAVE_ALAW:
        payload = _alaw_encode(x).tobytes()
        block_align, bits = 1, 8
    elif fmt == WAVE_ADPCM_IMA:
        pcm = np.clip(np.rint(x * 32768.0), -32768, 32767).astype(np.int64)
        spb = (block_align_adpcm - 4) * 2 + 1
        blocks = []
        # seed the step size from the signal's mean per-sample delta —
        # avoids the multi-sample ramp-up transient an index-0 start
        # has on hot signals (the header carries the index, so any
        # start is spec-legal)
        mean_delta = float(np.abs(np.diff(pcm[:spb])).mean()) if len(pcm) > 1 else 7.0
        index = int(np.searchsorted(_IMA_STEPS, max(mean_delta, 7.0)))
        index = max(0, min(88, index))
        for off in range(0, len(pcm), spb):
            block, index = _adpcm_encode_block(pcm[off : off + spb], index)
            blocks.append(block)
        payload = b"".join(blocks)
        block_align, bits = block_align_adpcm, 4
    else:
        raise ValueError(f"unsupported fmt 0x{fmt:04x}")
    fmt_chunk = struct.pack(
        "<HHIIHH", fmt, 1, rate, rate * block_align, block_align, bits
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt_chunk)) + fmt_chunk
        + b"data" + struct.pack("<I", len(payload)) + payload
        + (b"\x00" if len(payload) & 1 else b"")
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body

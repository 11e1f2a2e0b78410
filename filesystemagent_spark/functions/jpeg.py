"""Pure-stdlib+numpy baseline JPEG codec.

Completes the multimodal decode ladder (png.py / gif.py / bmp.py):
JPEG is the reference's primary photo format
(/root/reference/src/media_fingerprinting.py:137-164 hashes .jpg via
PIL), and this container has no codec libraries — so the ladder
implements baseline JFIF itself from the public ITU T.81 spec:

- decoder: baseline sequential DCT (SOF0), 8-bit, Huffman entropy
  coding, 1-component grayscale or 3-component YCbCr with 4:4:4 /
  4:2:2 / 4:2:0 sampling, restart intervals, byte-stuffing;
- encoder (test fixture writer): 4:4:4 YCbCr, Annex-K quantization
  tables scaled by a quality knob, Annex-K Huffman tables.

JPEG is lossy: round-trip tests assert bounded per-pixel error and
perceptual-hash stability, not bit equality. Determinism is exact,
though — the same input always yields the same bytes — which is what
the dedup oracles rely on.

All DCT math is vectorized numpy (one 8x8 basis matrix, batched
matmul over every block at once); only the Huffman bit stream is
walked in Python, which at Arrow-batch fixture sizes is irrelevant
and at production sizes is exactly the part a codec library would
replace behind the same ladder rung.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["is_jpeg", "decode_jpeg", "encode_jpeg"]


def is_jpeg(b: bytes) -> bool:
    return b[:2] == b"\xff\xd8"


# ---------------------------------------------------------------------------
# shared: DCT basis, zigzag, Annex-K tables

_C = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _C[_k, _n] = np.cos((2 * _n + 1) * _k * np.pi / 16) * (
            np.sqrt(1 / 8) if _k == 0 else np.sqrt(2 / 8)
        )

_ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ]
)

# ITU T.81 Annex K.1 quantization tables (luminance, chrominance)
_QL = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ]
)
_QC = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ]
)

# Annex K.3 Huffman specs: (bits[1..16], values)
_HUFF_SPECS = {
    ("dc", 0): (
        [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
        list(range(12)),
    ),
    ("dc", 1): (
        [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
        list(range(12)),
    ),
    ("ac", 0): (
        [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
        [
            0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
            0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
            0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
            0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
            0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
            0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
            0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
            0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
            0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
            0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
            0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
            0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
            0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
            0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
            0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
        ],
    ),
    ("ac", 1): (
        [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
        [
            0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
            0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
            0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
            0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
            0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
            0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
            0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
            0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
            0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
            0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
            0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
            0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
            0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
            0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
            0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
        ],
    ),
}


def _build_codes(bits: list[int], values: list[int]) -> dict[int, tuple[int, int]]:
    """Canonical Huffman: value -> (code, length)."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _build_decode_table(bits: list[int], values: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> value, for the bit-walking decoder."""
    out: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[(length, code)] = values[k]
            code += 1
            k += 1
        code <<= 1
    return out


# ---------------------------------------------------------------------------
# decoder


class _BitStream:
    """MSB-first reader over the entropy-coded segment, handling the
    0xFF00 byte stuffing and stopping at markers."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self):
        b = self.data
        if self.pos >= len(b):
            raise ValueError("entropy stream truncated")
        byte = b[self.pos]
        if byte == 0xFF:
            nxt = b[self.pos + 1] if self.pos + 1 < len(b) else 0xD9
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:  # restart marker reached mid-read
                raise ValueError("hit restart marker while reading bits")
            else:
                raise ValueError("hit marker while reading bits")
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | byte
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_to_restart(self):
        """Drop partial bits and consume an RSTn marker."""
        self.acc = 0
        self.nbits = 0
        b = self.data
        while self.pos + 1 < len(b):
            if b[self.pos] == 0xFF and 0xD0 <= b[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1
        raise ValueError("expected restart marker")


def _extend(v: int, n: int) -> int:
    """T.81 F.2.2.1 sign extension."""
    if n == 0:
        return 0
    return v if v >= (1 << (n - 1)) else v - (1 << n) + 1


def _decode_block(
    bs: _BitStream,
    dc_tab: dict[tuple[int, int], int],
    ac_tab: dict[tuple[int, int], int],
    pred: int,
) -> tuple[np.ndarray, int]:
    def read_code(tab) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | bs.read_bit()
            if (length, code) in tab:
                return tab[(length, code)]
        raise ValueError("invalid Huffman code")

    coeffs = np.zeros(64, np.int32)
    t = read_code(dc_tab)
    diff = _extend(bs.receive(t), t)
    pred += diff
    coeffs[0] = pred
    k = 1
    while k < 64:
        rs = read_code(ac_tab)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:  # ZRL: sixteen zeros
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("AC run past end of block")
        coeffs[k] = _extend(bs.receive(s), s)
        k += 1
    return coeffs, pred


def decode_jpeg(b: bytes) -> tuple[int, int, str, np.ndarray]:
    """JPEG bytes -> (width, height, mode, pixels[h,w,3] uint8 RGB).
    mode is 'L' (grayscale source, replicated to RGB) or 'YCbCr'.
    Raises ValueError for non-baseline or malformed input."""
    try:
        return _decode_jpeg(b)
    except (struct.error, IndexError, KeyError) as e:
        raise ValueError(f"malformed JPEG: {e}") from e


def _decode_jpeg(b: bytes) -> tuple[int, int, str, np.ndarray]:
    if not is_jpeg(b):
        raise ValueError("not a JPEG")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    huff: dict[tuple[str, int], dict[tuple[int, int], int]] = {}
    comps: list[dict] = []
    w = h = 0
    restart_interval = 0
    while pos < len(b):
        if b[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        marker = b[pos + 1]
        pos += 2
        if marker == 0xD8:  # SOI (tolerate repeats)
            continue
        if marker == 0xD9:  # EOI
            break
        seg_len = struct.unpack(">H", b[pos : pos + 2])[0]
        seg = b[pos + 2 : pos + seg_len]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0x0F
                i += 1
                if pq == 0:
                    tab = np.frombuffer(seg, np.uint8, 64, i).astype(np.int32)
                    i += 64
                else:
                    tab = np.frombuffer(seg, ">u2", 64, i).astype(np.int32)
                    i += 128
                qtables[tq] = tab
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0x0F
                bits = list(seg[i + 1 : i + 17])
                n = sum(bits)
                values = list(seg[i + 17 : i + 17 + n])
                huff[("dc" if tc == 0 else "ac", th)] = _build_decode_table(
                    bits, values
                )
                i += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            _prec, h, w, nc = struct.unpack(">BHHB", seg[:6])
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq}
                )
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(f"non-baseline SOF 0x{marker:02x} unsupported")
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            scan = []
            for c in range(ns):
                cs, tt = seg[1 + 2 * c], seg[2 + 2 * c]
                comp = next(x for x in comps if x["id"] == cs)
                scan.append(
                    {**comp, "dc": huff[("dc", tt >> 4)], "ac": huff[("ac", tt & 0x0F)]}
                )
            data_start = pos + seg_len
            return _decode_scan(
                b, data_start, w, h, scan, qtables, restart_interval
            )
        # APPn/COM/etc: skip
        pos += seg_len
    raise ValueError("no SOS marker")


def _decode_scan(b, pos, w, h, scan, qtables, restart_interval):
    hmax = max(c["h"] for c in scan)
    vmax = max(c["v"] for c in scan)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    # per-component coefficient planes (in 8x8 blocks)
    planes = []
    for c in scan:
        bw, bh = mcux * c["h"], mcuy * c["v"]
        planes.append(np.zeros((bh * bw, 64), np.int32))
    bs = _BitStream(b, pos)
    preds = [0] * len(scan)
    n_mcu = mcux * mcuy
    for m in range(n_mcu):
        if restart_interval and m and m % restart_interval == 0:
            bs.align_to_restart()
            preds = [0] * len(scan)
        my, mx = divmod(m, mcux)
        for ci, c in enumerate(scan):
            for by in range(c["v"]):
                for bx in range(c["h"]):
                    coeffs, preds[ci] = _decode_block(
                        bs, c["dc"], c["ac"], preds[ci]
                    )
                    row = my * c["v"] + by
                    col = mx * c["h"] + bx
                    planes[ci][row * mcux * c["h"] + col] = coeffs
    # dequantize + IDCT, all blocks at once per component
    out_planes = []
    for ci, c in enumerate(scan):
        q = qtables[c["tq"]]
        deq = planes[ci] * q[np.newaxis, :]
        blocks = np.zeros((len(deq), 8, 8))
        blocks.reshape(len(deq), 64)[:, _ZIGZAG] = deq
        pix = np.einsum("ij,njk,lk->nil", _C.T, blocks, _C.T) + 128.0
        bw = mcux * c["h"]
        bh = mcuy * c["v"]
        plane = (
            pix.reshape(bh, bw, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(bh * 8, bw * 8)
        )
        # upsample to full resolution (nearest neighbour, spec-legal)
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            plane = plane.repeat(ry, axis=0).repeat(rx, axis=1)
        out_planes.append(plane[:h, :w])
    arr = np.stack(out_planes, axis=-1)
    if arr.shape[-1] == 1:
        y = np.clip(np.rint(arr[:, :, 0]), 0, 255).astype(np.uint8)
        return w, h, "L", np.stack([y, y, y], axis=-1)
    y, cb, cr = arr[:, :, 0], arr[:, :, 1] - 128.0, arr[:, :, 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    bl = y + 1.772 * cb
    rgb = np.clip(np.rint(np.stack([r, g, bl], axis=-1)), 0, 255).astype(np.uint8)
    return w, h, "YCbCr", rgb


# ---------------------------------------------------------------------------
# encoder (test fixture writer: 4:4:4, Annex-K tables)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int):
        self.acc = (self.acc << length) | code
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-fill per spec


def _quality_scale(tab: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling of an Annex-K table."""
    quality = min(100, max(1, quality))
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    out = (tab * s + 50) // 100
    return np.clip(out, 1, 255).astype(np.int32)


def _magnitude(v: int) -> tuple[int, int]:
    """value -> (size, raw bits) per T.81 F.1.2.1."""
    if v == 0:
        return 0, 0
    a = abs(v)
    size = a.bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


def encode_jpeg(
    rgb: np.ndarray,
    quality: int = 90,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """(h, w, 3) uint8 RGB -> baseline JFIF bytes (Annex-K Huffman
    tables, IJG-style quality scaling). `subsampling` is '444' (each
    MCU = Y+Cb+Cr blocks) or '420' (each MCU = 2x2 Y blocks + one
    2x2-averaged Cb + Cr — what cameras emit, and the path that
    exercises the decoder's upsampling). Deterministic."""
    if subsampling not in ("444", "420"):
        raise ValueError("subsampling must be '444' or '420'")
    if rgb.ndim == 2:  # grayscale: single-component scan
        return _encode_gray(rgb, quality, restart_interval)
    if restart_interval:
        raise ValueError("restart_interval only supported for grayscale input")
    h, w, _ = rgb.shape
    ql = _quality_scale(_QL, quality)
    qc = _quality_scale(_QC, quality)
    # RGB -> YCbCr (BT.601 full range, the JFIF convention)
    f = rgb.astype(np.float64)
    r, g, bl = f[:, :, 0], f[:, :, 1], f[:, :, 2]
    y = 0.299 * r + 0.587 * g + 0.114 * bl
    cb = -0.168736 * r - 0.331264 * g + 0.5 * bl + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * bl + 128.0

    dc_codes = [_build_codes(*_HUFF_SPECS[("dc", 0)]), _build_codes(*_HUFF_SPECS[("dc", 1)])]
    ac_codes = [_build_codes(*_HUFF_SPECS[("ac", 0)]), _build_codes(*_HUFF_SPECS[("ac", 1)])]

    sub = subsampling == "420"
    mcu_px = 16 if sub else 8
    mcux = (w + mcu_px - 1) // mcu_px
    mcuy = (h + mcu_px - 1) // mcu_px

    def pad_to(plane: np.ndarray, ph: int, pw: int) -> np.ndarray:
        sh, sw = plane.shape
        padded = np.empty((ph, pw))
        padded[:sh, :sw] = plane
        padded[sh:, :sw] = plane[-1:, :]
        padded[:, sw:] = padded[:, sw - 1 : sw]
        return padded

    def quantized_blocks(plane: np.ndarray, q: np.ndarray, bh: int, bw_: int) -> np.ndarray:
        padded = pad_to(plane, bh * 8, bw_ * 8)
        blocks = (
            padded.reshape(bh, 8, bw_, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
            - 128.0
        )
        dct = np.einsum("ij,njk,lk->nil", _C, blocks, _C)
        zz = dct.reshape(-1, 64)[:, _ZIGZAG]
        return np.rint(zz / q[np.newaxis, :]).astype(np.int32)

    if sub:
        # chroma: 2x2 box average at half resolution
        cbp = pad_to(cb, mcuy * 16, mcux * 16)
        crp = pad_to(cr, mcuy * 16, mcux * 16)
        cb_half = cbp.reshape(mcuy * 8, 2, mcux * 8, 2).mean(axis=(1, 3))
        cr_half = crp.reshape(mcuy * 8, 2, mcux * 8, 2).mean(axis=(1, 3))
        yb = quantized_blocks(y, ql, mcuy * 2, mcux * 2)
        cbb = quantized_blocks(cb_half, qc, mcuy, mcux)
        crb = quantized_blocks(cr_half, qc, mcuy, mcux)
        comp_hv = ((1, 0x22, 0), (2, 0x11, 1), (3, 0x11, 1))
    else:
        yb = quantized_blocks(y, ql, mcuy, mcux)
        cbb = quantized_blocks(cb, qc, mcuy, mcux)
        crb = quantized_blocks(cr, qc, mcuy, mcux)
        comp_hv = ((1, 0x11, 0), (2, 0x11, 1), (3, 0x11, 1))

    bw = _BitWriter()
    preds = [0, 0, 0]

    def emit_block(coeffs: np.ndarray, ci: int, tsel: int):
        diff = int(coeffs[0]) - preds[ci]
        preds[ci] = int(coeffs[0])
        size, bits = _magnitude(diff)
        code, length = dc_codes[tsel][size]
        bw.write(code, length)
        if size:
            bw.write(bits, size)
        run = 0
        last_nz = int(np.max(np.nonzero(coeffs)[0])) if np.any(coeffs[1:]) else 0
        for k in range(1, 64):
            v = int(coeffs[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, length = ac_codes[tsel][0xF0]  # ZRL
                bw.write(code, length)
                run -= 16
            size, bits = _magnitude(v)
            code, length = ac_codes[tsel][(run << 4) | size]
            bw.write(code, length)
            bw.write(bits, size)
            run = 0
            if k == last_nz:
                break
        if last_nz < 63:
            code, length = ac_codes[tsel][0x00]  # EOB
            bw.write(code, length)

    for m in range(mcux * mcuy):
        my, mx = divmod(m, mcux)
        if sub:
            for by in range(2):
                for bx in range(2):
                    row, col = my * 2 + by, mx * 2 + bx
                    emit_block(yb[row * mcux * 2 + col], 0, 0)
            emit_block(cbb[m], 1, 1)
            emit_block(crb[m], 2, 1)
        else:
            emit_block(yb[m], 0, 0)
            emit_block(cbb[m], 1, 1)
            emit_block(crb[m], 2, 1)
    bw.flush()

    out = bytearray()
    out += b"\xff\xd8"  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for tq, tab in ((0, ql), (1, qc)):
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq]) + bytes(
            int(x) for x in tab
        )
    out += b"\xff\xc0" + struct.pack(">HBHHB", 17, 8, h, w, 3)
    for cid, hv, tq in comp_hv:
        out += bytes([cid, hv, tq])
    for (kind, tid), (bits, values) in _HUFF_SPECS.items():
        tc = 0 if kind == "dc" else 1
        out += b"\xff\xc4" + struct.pack(">H", 19 + len(values))
        out += bytes([(tc << 4) | tid]) + bytes(bits) + bytes(values)
    out += b"\xff\xda" + struct.pack(">HB", 12, 3)
    for cid, tsel in ((1, 0), (2, 1), (3, 1)):
        out += bytes([cid, (tsel << 4) | tsel])
    out += b"\x00\x3f\x00"  # Ss/Se/AhAl for baseline
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def _encode_gray(gray: np.ndarray, quality: int, restart_interval: int = 0) -> bytes:
    """(h, w) uint8 -> single-component baseline JFIF (tests the
    decoder's grayscale branch; `restart_interval` > 0 writes a DRI
    segment and RSTn markers every N MCUs, testing the decoder's
    restart resynchronization)."""
    h, w = gray.shape
    ql = _quality_scale(_QL, quality)
    dc = _build_codes(*_HUFF_SPECS[("dc", 0)])
    ac = _build_codes(*_HUFF_SPECS[("ac", 0)])
    mcux, mcuy = (w + 7) // 8, (h + 7) // 8
    padded = np.empty((mcuy * 8, mcux * 8))
    padded[:h, :w] = gray
    padded[h:, :w] = gray[-1:, :]
    padded[:, w:] = padded[:, w - 1 : w]
    blocks = (
        padded.reshape(mcuy, 8, mcux, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
        - 128.0
    )
    dct = np.einsum("ij,njk,lk->nil", _C, blocks, _C)
    zz = np.rint(dct.reshape(-1, 64)[:, _ZIGZAG] / ql[np.newaxis, :]).astype(np.int32)

    bw = _BitWriter()
    pred = 0
    rst_n = 0
    for m, coeffs in enumerate(zz):
        if restart_interval and m and m % restart_interval == 0:
            bw.flush()
            bw.out += bytes([0xFF, 0xD0 + rst_n])
            rst_n = (rst_n + 1) % 8
            pred = 0
        diff = int(coeffs[0]) - pred
        pred = int(coeffs[0])
        size, bits = _magnitude(diff)
        code, length = dc[size]
        bw.write(code, length)
        if size:
            bw.write(bits, size)
        run = 0
        last_nz = int(np.max(np.nonzero(coeffs)[0])) if np.any(coeffs[1:]) else 0
        for k in range(1, 64):
            v = int(coeffs[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, length = ac[0xF0]
                bw.write(code, length)
                run -= 16
            size, bits = _magnitude(v)
            code, length = ac[(run << 4) | size]
            bw.write(code, length)
            bw.write(bits, size)
            run = 0
            if k == last_nz:
                break
        if last_nz < 63:
            code, length = ac[0x00]
            bw.write(code, length)
    bw.flush()

    out = bytearray()
    out += b"\xff\xd8"
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes(int(x) for x in ql)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    out += b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, h, w, 1) + bytes([1, 0x11, 0])
    for kind in ("dc", "ac"):
        bits, values = _HUFF_SPECS[(kind, 0)]
        tc = 0 if kind == "dc" else 1
        out += b"\xff\xc4" + struct.pack(">H", 19 + len(values))
        out += bytes([tc << 4]) + bytes(bits) + bytes(values)
    out += b"\xff\xda" + struct.pack(">HB", 8, 1) + bytes([1, 0x00]) + b"\x00\x3f\x00"
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)

"""Pure-stdlib+numpy FLAC codec (decode-focused).

Completes the audio rung of the multimodal ladder the way
png/gif/bmp/jpeg completed images: FLAC is the standard lossless
audio format (the reference would read it via soundfile, absent in
this container), and the format is fully public (RFC 9639 / the
xiph.org spec) — so the ladder implements it directly:

- decoder: STREAMINFO + frame stream; constant / verbatim / fixed
  (orders 0-4) / LPC subframes; rice and rice2 residual partitions
  with escape codes; independent, left-side, right-side and mid-side
  channel decorrelation; wasted bits; UTF-8 frame numbers. CRCs are
  parsed but not verified (decode is the goal; integrity checking is
  the catalog's content-hash job).
- encoder (fixture writer): fixed-order-2 prediction with one rice
  partition per subframe, independent channels, correct header CRC-8
  and frame CRC-16 — real spec-conformant files, not a private
  dialect.

Everything is deterministic; the bit walking is plain Python (fine at
Arrow-batch fixture sizes; a codec library would slot into the same
ladder rung for production volumes).
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["is_flac", "decode_flac", "encode_flac"]


def is_flac(b: bytes) -> bool:
    return b[:4] == b"fLaC"


_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


class _BitReader:
    """MSB-first bit reader."""

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.byte = pos
        self.bit = 0

    def read(self, n: int) -> int:
        out = 0
        while n:
            if self.byte >= len(self.data):
                raise ValueError("FLAC bitstream truncated")
            avail = 8 - self.bit
            take = min(n, avail)
            cur = self.data[self.byte]
            out = (out << take) | ((cur >> (avail - take)) & ((1 << take) - 1))
            self.bit += take
            if self.bit == 8:
                self.bit = 0
                self.byte += 1
            n -= take
        return out

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >= (1 << (n - 1)) else v

    def read_unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
        return q

    def align(self):
        if self.bit:
            self.bit = 0
            self.byte += 1


def _read_utf8_number(r: _BitReader) -> int:
    first = r.read(8)
    if first < 0x80:
        return first
    n = 0
    mask = 0x40
    while first & mask:
        n += 1
        mask >>= 1
    v = first & (mask - 1)
    for _ in range(n):
        cont = r.read(8)
        if cont >> 6 != 0b10:
            raise ValueError("bad UTF-8 frame number")
        v = (v << 6) | (cont & 0x3F)
    return v


def _read_residual(r: _BitReader, block_size: int, order: int) -> list[int]:
    method = r.read(2)
    if method > 1:
        raise ValueError("reserved residual coding method")
    plen = 4 + method  # rice parameter width
    escape = (1 << plen) - 1
    porder = r.read(4)
    nparts = 1 << porder
    if block_size % nparts:
        raise ValueError("partition order does not divide block size")
    out: list[int] = []
    for p in range(nparts):
        n = block_size // nparts - (order if p == 0 else 0)
        param = r.read(plen)
        if param == escape:
            bits = r.read(5)
            for _ in range(n):
                out.append(r.read_signed(bits) if bits else 0)
        else:
            for _ in range(n):
                q = r.read_unary()
                u = (q << param) | (r.read(param) if param else 0)
                out.append((u >> 1) ^ -(u & 1))  # zigzag
    return out


def _read_subframe(r: _BitReader, block_size: int, bps: int) -> np.ndarray:
    if r.read(1):
        raise ValueError("subframe padding bit set")
    stype = r.read(6)
    wasted = 0
    if r.read(1):
        wasted = 1 + r.read_unary()
    eff = bps - wasted
    if stype == 0:  # constant
        v = r.read_signed(eff)
        out = np.full(block_size, v, np.int64)
    elif stype == 1:  # verbatim
        out = np.array([r.read_signed(eff) for _ in range(block_size)], np.int64)
    elif 8 <= stype <= 12:  # fixed, order = stype - 8
        order = stype - 8
        warm = [r.read_signed(eff) for _ in range(order)]
        resid = _read_residual(r, block_size, order)
        out = np.empty(block_size, np.int64)
        out[:order] = warm
        coefs = _FIXED_COEFS[order]
        for i in range(order, block_size):
            pred = sum(c * out[i - 1 - j] for j, c in enumerate(coefs))
            out[i] = pred + resid[i - order]
    elif stype >= 32:  # LPC, order = stype - 31
        order = stype - 31
        warm = [r.read_signed(eff) for _ in range(order)]
        precision = r.read(4) + 1
        if precision == 16:
            raise ValueError("invalid qlp precision")
        shift = r.read_signed(5)
        coefs = [r.read_signed(precision) for _ in range(order)]
        resid = _read_residual(r, block_size, order)
        out = np.empty(block_size, np.int64)
        out[:order] = warm
        for i in range(order, block_size):
            acc = sum(c * int(out[i - 1 - j]) for j, c in enumerate(coefs))
            out[i] = (acc >> shift) + resid[i - order]
    else:
        raise ValueError(f"reserved subframe type {stype}")
    return out << wasted


_BLOCK_SIZES = {
    1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
    8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
    13: 8192, 14: 16384, 15: 32768,
}
_SAMPLE_RATES = {
    1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
    7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000,
}
_SAMPLE_SIZES = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}


def decode_flac(b: bytes) -> tuple[int, int, np.ndarray, str]:
    """FLAC bytes -> (sample_rate, n_channels, mono float64 [-1,1]
    channel-mean signal, 'flac-pure'). Raises ValueError on malformed
    or non-FLAC input."""
    if not is_flac(b):
        raise ValueError("not a FLAC")
    try:
        return _decode_flac(b)
    except (struct.error, IndexError) as e:
        raise ValueError(f"malformed FLAC: {e}") from e


def _decode_flac(b: bytes) -> tuple[int, int, np.ndarray, str]:
    pos = 4
    rate = nch = bps = None
    total = 0
    last = False
    while not last:
        hdr = b[pos]
        last = bool(hdr & 0x80)
        btype = hdr & 0x7F
        size = int.from_bytes(b[pos + 1 : pos + 4], "big")
        if btype == 0:  # STREAMINFO
            info = b[pos + 4 : pos + 4 + size]
            rate = int.from_bytes(info[10:13], "big") >> 4
            nch = ((info[12] >> 1) & 0x07) + 1
            bps = ((info[12] & 0x01) << 4 | info[13] >> 4) + 1
            total = (info[13] & 0x0F) << 32 | int.from_bytes(info[14:18], "big")
        pos += 4 + size
    if rate is None:
        raise ValueError("FLAC missing STREAMINFO")

    r = _BitReader(b, pos)
    chans: list[np.ndarray] = [np.empty(0, np.int64) for _ in range(nch)]
    got = 0
    while (total == 0 or got < total) and r.byte < len(b) - 2:
        sync = r.read(14)
        if sync != 0b11111111111110:
            raise ValueError(f"bad frame sync 0x{sync:04x}")
        r.read(1)  # reserved
        r.read(1)  # blocking strategy
        bs_code = r.read(4)
        sr_code = r.read(4)
        ch_code = r.read(4)
        ss_code = r.read(3)
        r.read(1)  # reserved
        _read_utf8_number(r)
        if bs_code == 6:
            block_size = r.read(8) + 1
        elif bs_code == 7:
            block_size = r.read(16) + 1
        else:
            block_size = _BLOCK_SIZES[bs_code]
        if sr_code == 12:
            r.read(8)
        elif sr_code in (13, 14):
            r.read(16)
        fbps = _SAMPLE_SIZES.get(ss_code, bps)
        r.read(8)  # header CRC-8 (not verified)
        if ch_code < 8:
            subs = [
                _read_subframe(r, block_size, fbps) for _ in range(ch_code + 1)
            ]
        elif ch_code == 8:  # left-side
            left = _read_subframe(r, block_size, fbps)
            side = _read_subframe(r, block_size, fbps + 1)
            subs = [left, left - side]
        elif ch_code == 9:  # right-side
            side = _read_subframe(r, block_size, fbps + 1)
            right = _read_subframe(r, block_size, fbps)
            subs = [right + side, right]
        elif ch_code == 10:  # mid-side
            mid = _read_subframe(r, block_size, fbps)
            side = _read_subframe(r, block_size, fbps + 1)
            m2 = (mid << 1) | (side & 1)
            subs = [(m2 + side) >> 1, (m2 - side) >> 1]
        else:
            raise ValueError(f"reserved channel assignment {ch_code}")
        r.align()
        r.read(16)  # frame CRC-16 (not verified)
        for c in range(nch):
            chans[c] = np.concatenate([chans[c], subs[c]])
        got += block_size
    if total:
        chans = [c[:total] for c in chans]
    x = np.stack(chans, axis=1).mean(axis=1) / float(1 << (bps - 1))
    return rate, nch, x, "flac-pure"


# ---------------------------------------------------------------------------
# encoder (fixture writer)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, v: int, n: int):
        self.acc = (self.acc << n) | (v & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.out.append((self.acc >> (self.nbits - 8)) & 0xFF)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def write_unary(self, q: int):
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def align(self):
        if self.nbits:
            self.write(0, 8 - self.nbits)


def _crc8(data: bytes) -> int:
    crc = 0
    for byte in data:
        crc ^= byte
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for byte in data:
        crc ^= byte << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
    return crc


def _utf8_number(v: int) -> bytes:
    if v < 0x80:
        return bytes([v])
    out = []
    nbytes = 2
    while v >= (1 << (6 * (nbytes - 1) + (7 - nbytes))):
        nbytes += 1
    lead = (0xFF << (8 - nbytes)) & 0xFF | (v >> (6 * (nbytes - 1)))
    out.append(lead)
    for i in range(nbytes - 2, -1, -1):
        out.append(0x80 | ((v >> (6 * i)) & 0x3F))
    return bytes(out)


def _encode_subframe(bw: _BitWriter, samples: np.ndarray, bps: int):
    """Fixed order-2 (order-0/1 for short blocks), one rice partition."""
    n = len(samples)
    order = min(2, n - 1) if n > 1 else 0
    coefs = _FIXED_COEFS[order]
    bw.write(0, 1)  # padding
    bw.write(8 + order, 6)  # fixed subframe type
    bw.write(0, 1)  # no wasted bits
    for i in range(order):
        bw.write(int(samples[i]), bps)
    resid = [
        int(samples[i]) - sum(c * int(samples[i - 1 - j]) for j, c in enumerate(coefs))
        for i in range(order, n)
    ]
    zz = [(e << 1) ^ (e >> 63) if e >= 0 else ((-e) << 1) - 1 for e in resid]
    # rice parameter from the mean zigzag magnitude
    mean = (sum(zz) // max(1, len(zz))) or 1
    param = min(14, max(0, mean.bit_length() - 1))
    bw.write(0, 2)  # rice method
    bw.write(0, 4)  # partition order 0
    bw.write(param, 4)
    for u in zz:
        bw.write_unary(u >> param)
        if param:
            bw.write(u & ((1 << param) - 1), param)


def encode_flac(
    x: np.ndarray, rate: int = 8000, bps: int = 16, block_size: int = 4096
) -> bytes:
    """mono float64 [-1,1] -> FLAC bytes (fixed-order-2 subframes,
    independent channels, correct CRCs). Lossless: decode returns the
    quantized samples exactly."""
    pcm = np.clip(
        np.rint(np.asarray(x, np.float64) * (1 << (bps - 1))),
        -(1 << (bps - 1)),
        (1 << (bps - 1)) - 1,
    ).astype(np.int64)
    total = len(pcm)

    streaminfo = bytearray()
    streaminfo += struct.pack(">HH", block_size, block_size)
    streaminfo += b"\x00\x00\x00" * 2  # min/max frame size unknown
    si_tail = (rate << 44) | (0 << 41) | ((bps - 1) << 36) | total
    streaminfo += si_tail.to_bytes(8, "big")
    streaminfo += b"\x00" * 16  # md5 unset

    out = bytearray(b"fLaC")
    out += bytes([0x80]) + len(streaminfo).to_bytes(3, "big") + streaminfo

    for fi, off in enumerate(range(0, total, block_size)):
        chunk = pcm[off : off + block_size]
        n = len(chunk)
        hdr = _BitWriter()
        hdr.write(0b11111111111110, 14)
        hdr.write(0, 1)  # reserved
        hdr.write(0, 1)  # fixed blocksize strategy
        if n == block_size and block_size in {v: k for k, v in _BLOCK_SIZES.items()}:
            bs_code = {v: k for k, v in _BLOCK_SIZES.items()}[block_size]
            hdr.write(bs_code, 4)
            bs_follow = None
        else:
            hdr.write(7, 4)
            bs_follow = n - 1
        sr_code = {v: k for k, v in _SAMPLE_RATES.items()}.get(rate, 0)
        hdr.write(sr_code, 4)
        hdr.write(0, 4)  # 1 channel, independent
        hdr.write({8: 1, 12: 2, 16: 4, 20: 5, 24: 6, 32: 7}[bps], 3)
        hdr.write(0, 1)
        hdr.align()
        hdr_bytes = bytearray(hdr.out)
        hdr_bytes += _utf8_number(fi)
        if bs_follow is not None:
            hdr_bytes += struct.pack(">H", bs_follow)
        hdr_bytes.append(_crc8(bytes(hdr_bytes)))

        body = _BitWriter()
        _encode_subframe(body, chunk, bps)
        body.align()
        frame = bytes(hdr_bytes) + bytes(body.out)
        frame += struct.pack(">H", _crc16(frame))
        out += frame
    return bytes(out)

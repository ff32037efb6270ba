"""Minimal from-scratch FLAC *encoder* (fixture generator).

The image has no flac/ffmpeg binary and no codec library, so the decoder
(`runtime/core/frontend/flac.cc`, ctypes-bound via
wenet_celoss_tpu/data/flac.py) needs self-made streams to be tested
against, and `run.sh --dryrun` needs a fake .flac LibriSpeech tree. This
encoder emits spec-conformant 16-bit streams exercising every subframe
type the decoder supports: CONSTANT, VERBATIM, FIXED (order 2) and LPC
(order 2) with rice-coded residuals (escape partitions included when
residuals overflow), mono / independent-stereo / mid-side stereo, and
correct CRC-8 / CRC-16 (the decoder skips CRCs, but files must be valid
for any other consumer).

Usage (CLI): python tools/flac_encode.py in.wav out.flac [--mode lpc]
Library:     encode_flac(samples_int16 [n] or [n,ch], sr, mode=...)
"""

from __future__ import annotations

import argparse

import numpy as np

BLOCK = 4096


class BitWriter:
    def __init__(self):
        self.bytes = bytearray()
        self.acc = 0
        self.nbits = 0

    def bits(self, value: int, n: int):
        value &= (1 << n) - 1 if n < 64 else (1 << 64) - 1
        self.acc = (self.acc << n) | value
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            self.bytes.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def signed(self, value: int, n: int):
        self.bits(value & ((1 << n) - 1), n)

    def unary(self, q: int):
        for _ in range(q):
            self.bits(0, 1)
        self.bits(1, 1)

    def align(self):
        if self.nbits:
            self.bits(0, 8 - self.nbits)

    def data(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.bytes)


def crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 \
                else (crc << 1) & 0xFFFF
    return crc


def _utf8_number(n: int) -> bytes:
    """FLAC's UTF-8-style extended number (up to 36 bits / 7 bytes)."""
    if n < 0x80:
        return bytes([n])
    for total in range(2, 8):
        headbits = 7 - total
        if n.bit_length() <= headbits + 6 * (total - 1):
            lead = (0xFF << (8 - total)) & 0xFF
            cont = [(n >> (6 * i)) & 0x3F for i in range(total - 1)][::-1]
            return bytes([lead | (n >> (6 * (total - 1)))]
                         + [0x80 | c for c in cont])
    raise ValueError(n)


def _zigzag(v: np.ndarray) -> np.ndarray:
    return (np.abs(v.astype(np.int64)) * 2 - (v < 0)).astype(np.int64)


def _rice_write(bw: BitWriter, res: np.ndarray):
    """One partition (order 0), parameter chosen from the mean; escapes
    to raw 17-bit if the quotients would blow up."""
    z = _zigzag(res)
    mean = max(float(z.mean()), 0.25) if len(z) else 0.25
    param = max(0, min(14, int(np.ceil(np.log2(mean)))))
    # quotient guard: escape when pathological
    if len(z) and int((z >> param).max()) > 1 << 16:
        bw.bits(0xF, 4)          # escape
        bw.bits(17, 5)
        for v in res:
            bw.signed(int(v), 17)
        return
    bw.bits(param, 4)
    for v in z:
        q = int(v) >> param
        bw.unary(q)
        if param:
            bw.bits(int(v) & ((1 << param) - 1), param)


def _subframe(bw: BitWriter, x: np.ndarray, bps: int, mode: str):
    n = len(x)
    if mode == "constant" or (n and np.all(x == x[0]) and mode != "verbatim"):
        bw.bits(0, 1)
        bw.bits(0x00, 6)
        bw.bits(0, 1)
        bw.signed(int(x[0]) if n else 0, bps)
        return
    if mode == "verbatim":
        bw.bits(0, 1)
        bw.bits(0x01, 6)
        bw.bits(0, 1)
        for v in x:
            bw.signed(int(v), bps)
        return
    if mode == "fixed":
        order = min(2, n)
        bw.bits(0, 1)
        bw.bits(0x08 | order, 6)
        bw.bits(0, 1)
        for i in range(order):
            bw.signed(int(x[i]), bps)
        if order == 2:
            res = x[2:].astype(np.int64) - (2 * x[1:-1].astype(np.int64)
                                            - x[:-2].astype(np.int64))
        elif order == 1:
            res = np.diff(x.astype(np.int64))
        else:
            res = x.astype(np.int64)
        bw.bits(0, 2)            # rice method 0
        bw.bits(0, 4)            # partition order 0
        _rice_write(bw, res)
        return
    if mode == "lpc":
        order, precision, shift = 2, 12, 10
        coefs = [1843, -819]     # ~1.8 z^-1 - 0.8 z^-2 at shift 10
        bw.bits(0, 1)
        bw.bits(0x20 | (order - 1), 6)
        bw.bits(0, 1)
        for i in range(order):
            bw.signed(int(x[i]), bps)
        bw.bits(precision - 1, 4)
        bw.signed(shift, 5)
        for c in coefs:
            bw.signed(c, precision)
        xi = x.astype(np.int64)
        pred = (coefs[0] * xi[1:-1] + coefs[1] * xi[:-2]) >> shift
        res = xi[2:] - pred
        bw.bits(0, 2)
        bw.bits(0, 4)
        _rice_write(bw, res)
        return
    raise ValueError(mode)


def encode_flac(samples: np.ndarray, sample_rate: int, mode: str = "lpc",
                mid_side: bool = False) -> bytes:
    """samples: int16-range ints, [n] or [n, channels]; returns bytes."""
    x = np.asarray(samples)
    if x.ndim == 1:
        x = x[:, None]
    x = x.astype(np.int32)
    n, channels = x.shape
    assert 1 <= channels <= 2
    bps = 16

    out = bytearray(b"fLaC")
    # STREAMINFO (last-metadata flag set).
    si = BitWriter()
    si.bits(BLOCK, 16)
    si.bits(BLOCK, 16)
    si.bits(0, 24)
    si.bits(0, 24)
    si.bits(sample_rate, 20)
    si.bits(channels - 1, 3)
    si.bits(bps - 1, 5)
    si.bits(n, 36)
    for _ in range(16):
        si.bits(0, 8)            # md5 unknown
    body = si.data()
    out += bytes([0x80]) + len(body).to_bytes(3, "big") + body

    for fi, start in enumerate(range(0, n, BLOCK)):
        blk = x[start:start + BLOCK]
        bs = len(blk)
        hw = BitWriter()
        hw.bits(0x3FFE, 14)
        hw.bits(0, 1)
        hw.bits(0, 1)            # fixed blocksize strategy
        if bs == BLOCK:
            bs_code, bs_tail = 12, None   # 4096 = 256 << 4 → code 0b1100
        else:
            bs_code, bs_tail = 7, bs - 1  # 16-bit at end of header
        hw.bits(bs_code, 4)
        hw.bits(13, 4)           # sample rate: 16-bit Hz at end of header
        use_ms = mid_side and channels == 2
        hw.bits(10 if use_ms else channels - 1, 4)
        hw.bits(4, 3)            # 16-bit
        hw.bits(0, 1)
        hdr = bytearray(hw.data())
        hdr += _utf8_number(fi)
        if bs_tail is not None:
            hdr += int(bs_tail).to_bytes(2, "big")
        hdr += int(sample_rate).to_bytes(2, "big")
        hdr.append(crc8(bytes(hdr)))

        fw = BitWriter()
        if use_ms:
            left = blk[:, 0].astype(np.int64)
            right = blk[:, 1].astype(np.int64)
            mid = (left + right) >> 1
            side = left - right
            _subframe(fw, mid.astype(np.int64), bps, mode)
            _subframe(fw, side.astype(np.int64), bps + 1, mode)
        else:
            for c in range(channels):
                _subframe(fw, blk[:, c].astype(np.int64), bps, mode)
        fw.align()
        frame = bytes(hdr) + fw.data()
        frame += crc16(frame).to_bytes(2, "big")
        out += frame
    return bytes(out)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("wav")
    ap.add_argument("out")
    ap.add_argument("--mode", default="lpc",
                    choices=["constant", "verbatim", "fixed", "lpc"])
    ap.add_argument("--mid_side", action="store_true")
    args = ap.parse_args()
    import os
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from wenet_celoss_tpu.data.wav import read_wav
    wav, sr = read_wav(args.wav)
    data = encode_flac(np.round(wav).astype(np.int32), sr, mode=args.mode,
                       mid_side=args.mid_side)
    with open(args.out, "wb") as f:
        f.write(data)


if __name__ == "__main__":
    main()

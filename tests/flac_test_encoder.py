"""Minimal FLAC *encoder* used only to generate test fixtures for the native
decoder. Supports: 16-bit PCM, fixed 4096 block size, CONSTANT / VERBATIM /
FIXED(0-2) / LPC subframes with single-partition rice residuals, independent
and mid-side stereo. CRC fields are zero-filled (the decoder parses but does
not enforce them)."""

from __future__ import annotations

import numpy as np


class BitWriter:
    def __init__(self):
        self.bytes = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int):
        value &= (1 << n) - 1
        self.acc = (self.acc << n) | value
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            self.bytes.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def write_signed(self, value: int, n: int):
        self.write(value & ((1 << n) - 1), n)

    def align(self):
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def tobytes(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.bytes)


def _write_unary(bw: BitWriter, q: int):
    for _ in range(q):
        bw.write(0, 1)
    bw.write(1, 1)


def _write_rice_residual(bw: BitWriter, residuals: np.ndarray):
    # method 0 (4-bit rice), partition order 0, one partition
    bw.write(0, 2)
    bw.write(0, 4)
    u = (residuals.astype(np.int64) << 1) ^ (residuals.astype(np.int64) >> 63)
    mean = max(1.0, float(np.mean(u)))
    param = min(14, max(0, int(np.ceil(np.log2(mean + 1)))))
    bw.write(param, 4)
    for val in u:
        q = int(val) >> param
        _write_unary(bw, q)
        if param:
            bw.write(int(val) & ((1 << param) - 1), param)


FIXED_COEFFS = {0: [], 1: [1], 2: [2, -1]}


def _write_subframe(bw: BitWriter, samples: np.ndarray, bps: int, mode):
    bw.write(0, 1)  # padding
    s = samples.astype(np.int64)
    if mode == "constant":
        bw.write(0, 6)
        bw.write(0, 1)
        bw.write_signed(int(s[0]), bps)
    elif mode == "verbatim":
        bw.write(1, 6)
        bw.write(0, 1)
        for v in s:
            bw.write_signed(int(v), bps)
    elif mode.startswith("fixed"):
        order = int(mode[-1])
        bw.write(8 + order, 6)
        bw.write(0, 1)
        for v in s[:order]:
            bw.write_signed(int(v), bps)
        coeffs = FIXED_COEFFS[order]
        resid = s[order:].copy()
        for j, c in enumerate(coeffs):
            resid -= c * s[order - 1 - j:len(s) - 1 - j]
        _write_rice_residual(bw, resid)
    elif mode == "lpc":
        order, precision, shift = 2, 12, 5
        coeffs = [int(1.8 * (1 << shift)), int(-0.85 * (1 << shift))]
        bw.write(32 | (order - 1), 6)
        bw.write(0, 1)
        for v in s[:order]:
            bw.write_signed(int(v), bps)
        bw.write(precision - 1, 4)
        bw.write_signed(shift, 5)
        for c in coeffs:
            bw.write_signed(c, precision)
        pred = np.zeros(len(s) - order, np.int64)
        for j, c in enumerate(coeffs):
            pred += c * s[order - 1 - j:len(s) - 1 - j]
        resid = s[order:] - (pred >> shift)
        _write_rice_residual(bw, resid)
    else:
        raise ValueError(mode)


def encode_flac(signal: np.ndarray, sample_rate: int, block_size: int = 4096,
                mode: str = "verbatim", stereo: str = "independent") -> bytes:
    signal = np.atleast_2d(signal.T).T  # [n] -> [n, 1]
    if signal.ndim == 1:
        signal = signal[:, None]
    n, channels = signal.shape
    bps = 16

    out = bytearray(b"fLaC")
    # STREAMINFO (last metadata block)
    bw = BitWriter()
    bw.write(1, 1)
    bw.write(0, 7)
    bw.write(34, 24)
    bw.write(block_size, 16)
    bw.write(block_size, 16)
    bw.write(0, 24)
    bw.write(0, 24)
    bw.write(sample_rate, 20)
    bw.write(channels - 1, 3)
    bw.write(bps - 1, 5)
    bw.write(n, 36)
    for _ in range(16):
        bw.write(0, 8)
    out += bw.tobytes()

    frame_idx = 0
    for start in range(0, n, block_size):
        block = signal[start:start + block_size]
        bs = block.shape[0]
        bw = BitWriter()
        bw.write(0x3FFE, 14)
        bw.write(0, 1)   # reserved
        bw.write(0, 1)   # fixed blocksize stream
        bw.write(7, 4)   # block size: 16 bit at end of header
        bw.write(0, 4)   # sample rate: from streaminfo
        if stereo == "mid_side" and channels == 2:
            bw.write(10, 4)
        else:
            bw.write(channels - 1, 4)
        bw.write(4, 3)   # 16 bps
        bw.write(0, 1)
        assert frame_idx < 128
        bw.write(frame_idx, 8)   # utf8 frame number (single byte)
        bw.write(bs - 1, 16)
        bw.write(0, 8)   # crc8 (unchecked)

        if stereo == "mid_side" and channels == 2:
            left = block[:, 0].astype(np.int64)
            right = block[:, 1].astype(np.int64)
            mid = (left + right) >> 1
            side = left - right
            _write_subframe(bw, mid, bps, mode)
            _write_subframe(bw, side, bps + 1, mode)
        else:
            for c in range(channels):
                _write_subframe(bw, block[:, c], bps, mode)
        bw.align()
        bw.write(0, 16)  # crc16 (unchecked)
        out += bw.tobytes()
        frame_idx += 1

    return bytes(out)

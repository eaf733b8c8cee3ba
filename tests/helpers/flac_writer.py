"""Minimal spec-compliant FLAC *encoder* used only as a test fixture for the
native decoder (csrc/flac_decoder.cpp). Emits CONSTANT, VERBATIM and
FIXED(0-2)+Rice subframes with correct CRC-8/CRC-16, fixed 16-bit samples.
Independent channels only (plus an optional left/side mode for stereo
decorrelation coverage)."""

from __future__ import annotations

import numpy as np


class BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def bits(self, value: int, n: int) -> None:
        value &= (1 << n) - 1
        self.acc = (self.acc << n) | value
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def signed(self, value: int, n: int) -> None:
        self.bits(value & ((1 << n) - 1), n)

    def unary(self, q: int) -> None:
        for _ in range(q):
            self.bits(0, 1)
        self.bits(1, 1)

    def align(self) -> None:
        if self.nbits:
            self.bits(0, 8 - self.nbits)

    def bytes(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.buf)


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
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
    return crc


def _rice_encode(w: BitWriter, residual: np.ndarray, param: int) -> None:
    for e in residual:
        # zigzag: n>=0 → 2n; n<0 → -2n-1
        u = (2 * int(e)) if e >= 0 else (-2 * int(e) - 1)
        w.unary(u >> param)
        if param:
            w.bits(u & ((1 << param) - 1), param)


def _write_subframe(w: BitWriter, samples: np.ndarray, bps: int, mode: str) -> None:
    w.bits(0, 1)  # padding
    if mode == "constant":
        assert np.all(samples == samples[0])
        w.bits(0, 6)
        w.bits(0, 1)  # no wasted bits
        w.signed(int(samples[0]), bps)
    elif mode == "verbatim":
        w.bits(1, 6)
        w.bits(0, 1)
        for s in samples:
            w.signed(int(s), bps)
    elif mode.startswith("fixed"):
        order = int(mode[-1])
        w.bits(8 + order, 6)
        w.bits(0, 1)
        for s in samples[:order]:
            w.signed(int(s), bps)
        x = samples.astype(np.int64)
        res = x.copy()
        if order == 1:
            res[1:] = x[1:] - x[:-1]
        elif order == 2:
            res[2:] = x[2:] - 2 * x[1:-1] + x[:-2]
        res = res[order:]
        # residual: method 0, partition order 0, one rice param
        mean = max(1.0, np.mean(np.abs(res)))
        param = min(14, max(0, int(np.ceil(np.log2(mean + 1)))))
        w.bits(0, 2)  # method 0
        w.bits(0, 4)  # partition order 0
        w.bits(param, 4)
        _rice_encode(w, res, param)
    else:
        raise ValueError(mode)


def encode_flac(
    samples: np.ndarray,  # (frames,) or (frames, channels) ints in bps range
    sample_rate: int = 16000,
    block_size: int = 4096,
    subframe_mode: str = "verbatim",
    left_side: bool = False,
    bps: int = 16,
) -> bytes:
    x = np.asarray(samples)
    if x.ndim == 1:
        x = x[:, None]
    frames, channels = x.shape
    x = x.astype(np.int64)

    out = bytearray(b"fLaC")
    # STREAMINFO (last metadata block)
    si = BitWriter()
    si.bits(block_size, 16)
    si.bits(block_size, 16)
    si.bits(0, 24)
    si.bits(0, 24)
    si.bits(sample_rate, 20)
    si.bits(channels - 1, 3)
    si.bits(bps - 1, 5)
    si.bits(frames, 36)
    for _ in range(16):
        si.bits(0, 8)
    body = si.bytes()
    out += bytes([0x80]) + len(body).to_bytes(3, "big") + body

    frame_idx = 0
    pos = 0
    while pos < frames:
        n = min(block_size, frames - pos)
        w = BitWriter()
        w.bits(0x3FFE, 14)
        w.bits(0, 1)  # reserved
        w.bits(0, 1)  # fixed blocking
        w.bits(7, 4)  # block size: 16-bit at end of header
        w.bits(0, 4)  # sample rate: from STREAMINFO
        if left_side and channels == 2:
            w.bits(8, 4)  # left/side
        else:
            w.bits(channels - 1, 4)
        ss_code = {8: 1, 12: 2, 16: 4, 20: 5, 24: 6, 32: 7}[bps]
        w.bits(ss_code, 3)
        w.bits(0, 1)
        assert frame_idx < 0x80  # single-byte UTF-8 frame number
        w.bits(frame_idx, 8)
        w.bits(n - 1, 16)
        header = bytes(w.buf)  # bit-aligned here (14+1+1+4+4+4+3+1+8+16 = 56 bits)
        w.bits(crc8(header), 8)

        block = x[pos : pos + n]
        if left_side and channels == 2:
            left = block[:, 0]
            side = block[:, 0] - block[:, 1]
            _write_subframe(w, left, bps, subframe_mode)
            _write_subframe(w, side, bps + 1, subframe_mode)
        else:
            for c in range(channels):
                _write_subframe(w, block[:, c], bps, subframe_mode)
        w.align()
        frame_bytes = bytes(w.buf)
        w.bits(crc16(frame_bytes), 16)
        out += w.bytes()
        pos += n
        frame_idx += 1

    return bytes(out)


__all__ = ["encode_flac"]

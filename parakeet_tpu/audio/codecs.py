"""MP3 decoding via the system libmpg123 (ctypes; ABI-stable C API).

Covers the reference's dr_mp3 capability (audio_io.cpp:7-13) without
vendoring a decoder. The feed API is used so decoding works from memory
buffers as well as files. Output is interleaved float32.

OGG remains gated behind optional python backends for now (the reference
uses stb_vorbis; libvorbisfile's struct ABI is too fragile to bind blind).
"""

from __future__ import annotations

import ctypes
import threading

import numpy as np

_MPG123_OK = 0
_MPG123_NEED_MORE = -10
_MPG123_NEW_FORMAT = -11
_MPG123_DONE = -12
_ENC_SIGNED_16 = 0xD0
_ENC_FLOAT_32 = 0x200

_lock = threading.Lock()
_mpg123: ctypes.CDLL | None = None
_tried = False


def _load_mpg123() -> ctypes.CDLL | None:
    global _mpg123, _tried
    with _lock:
        if _tried:
            return _mpg123
        _tried = True
        for name in ("libmpg123.so.0", "libmpg123.so"):
            try:
                lib = ctypes.CDLL(name)
                break
            except OSError:
                lib = None
        if lib is None:
            return None
        lib.mpg123_init.restype = ctypes.c_int
        lib.mpg123_new.restype = ctypes.c_void_p
        lib.mpg123_new.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_int)]
        lib.mpg123_open_feed.restype = ctypes.c_int
        lib.mpg123_open_feed.argtypes = [ctypes.c_void_p]
        lib.mpg123_feed.restype = ctypes.c_int
        lib.mpg123_feed.argtypes = [ctypes.c_void_p, ctypes.c_char_p, ctypes.c_size_t]
        lib.mpg123_read.restype = ctypes.c_int
        lib.mpg123_read.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_size_t,
                                    ctypes.POINTER(ctypes.c_size_t)]
        lib.mpg123_getformat.restype = ctypes.c_int
        lib.mpg123_getformat.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_long),
                                         ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
        lib.mpg123_format_none.restype = ctypes.c_int
        lib.mpg123_format_none.argtypes = [ctypes.c_void_p]
        lib.mpg123_format.restype = ctypes.c_int
        lib.mpg123_format.argtypes = [ctypes.c_void_p, ctypes.c_long, ctypes.c_int, ctypes.c_int]
        lib.mpg123_close.argtypes = [ctypes.c_void_p]
        lib.mpg123_delete.argtypes = [ctypes.c_void_p]
        lib.mpg123_init()
        _mpg123 = lib
        return _mpg123


def mp3_available() -> bool:
    return _load_mpg123() is not None


def mp3_decode(data: bytes):
    """MP3 bytes → (interleaved float32, sample_rate, channels)."""
    lib = _load_mpg123()
    if lib is None:
        raise RuntimeError("libmpg123 not available for MP3 decoding")
    err = ctypes.c_int()
    h = lib.mpg123_new(None, ctypes.byref(err))
    if not h:
        raise RuntimeError(f"mpg123_new failed ({err.value})")
    try:
        if lib.mpg123_open_feed(h) != _MPG123_OK:
            raise RuntimeError("mpg123_open_feed failed")
        if lib.mpg123_feed(h, data, len(data)) != _MPG123_OK:
            raise ValueError("mpg123_feed rejected data (not MP3?)")

        rate = ctypes.c_long()
        channels = ctypes.c_int()
        enc = ctypes.c_int()
        chunks: list[bytes] = []
        buf = (ctypes.c_char * 65536)()
        done = ctypes.c_size_t()
        sample_rate = 0
        n_ch = 0
        use_float = False

        while True:
            rc = lib.mpg123_read(h, buf, len(buf), ctypes.byref(done))
            if done.value:
                chunks.append(bytes(buf[: done.value]))
            if rc == _MPG123_NEW_FORMAT:
                lib.mpg123_getformat(h, ctypes.byref(rate), ctypes.byref(channels), ctypes.byref(enc))
                sample_rate, n_ch = int(rate.value), int(channels.value)
                use_float = bool(enc.value & _ENC_FLOAT_32)
            elif rc in (_MPG123_OK,):
                continue
            elif rc in (_MPG123_NEED_MORE, _MPG123_DONE):
                break  # fed everything already → stream exhausted
            else:
                raise ValueError(f"mpg123_read error {rc}")

        if not chunks or sample_rate == 0:
            raise ValueError("no audio decoded from MP3 data")
        raw = b"".join(chunks)
        if use_float:
            samples = np.frombuffer(raw, "<f4").astype(np.float32)
        else:
            samples = np.frombuffer(raw, "<i2").astype(np.float32) / 32768.0
        return samples, sample_rate, n_ch
    finally:
        lib.mpg123_close(h)
        lib.mpg123_delete(h)


__all__ = ["mp3_available", "mp3_decode"]

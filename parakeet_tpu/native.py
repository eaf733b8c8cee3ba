"""ctypes loader for the native C++ runtime library (csrc/).

The reference keeps its host-side audio hot paths in native code
(audio_io.cpp); so do we. The library self-builds on first use with g++
(cmake also works: csrc/CMakeLists.txt); every entry point has a numpy
fallback so the framework stays functional without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path

import numpy as np

_CSRC = Path(__file__).resolve().parent.parent / "csrc"
_CACHE = Path(__file__).resolve().parent / "_native"
_LIB_NAME = "libparakeet_native.so"

_lock = threading.Lock()
_lib: ctypes.CDLL | None = None
_tried = False


def _build() -> Path | None:
    srcs = [_CSRC / "parakeet_native.cpp", _CSRC / "flac_decoder.cpp"]
    srcs = [s for s in srcs if s.is_file()]
    if not srcs:
        return None
    _CACHE.mkdir(exist_ok=True)
    out = _CACHE / _LIB_NAME
    if out.is_file() and all(out.stat().st_mtime >= s.stat().st_mtime for s in srcs):
        return out
    cmd = ["g++", "-O3", "-march=native", "-std=c++20", "-shared", "-fPIC",
           *[str(s) for s in srcs], "-o", str(out)]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
    except (OSError, subprocess.SubprocessError):
        return None
    return out


def _load() -> ctypes.CDLL | None:
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        if os.environ.get("PARAKEET_NO_NATIVE"):
            return None
        path = _build()
        if path is None:
            return None
        try:
            lib = ctypes.CDLL(str(path))
        except OSError:
            return None
        c_float_p = ctypes.POINTER(ctypes.c_float)
        c_int16_p = ctypes.POINTER(ctypes.c_int16)
        lib.pk_resample_out_len.restype = ctypes.c_int64
        lib.pk_resample_out_len.argtypes = [ctypes.c_int64, ctypes.c_int, ctypes.c_int]
        lib.pk_sinc_resample.restype = None
        lib.pk_sinc_resample.argtypes = [c_float_p, ctypes.c_int64, ctypes.c_int,
                                         ctypes.c_int, c_float_p]
        lib.pk_downmix_to_mono.restype = None
        lib.pk_downmix_to_mono.argtypes = [c_float_p, ctypes.c_int64, ctypes.c_int, c_float_p]
        lib.pk_int16_to_float.restype = None
        lib.pk_int16_to_float.argtypes = [c_int16_p, ctypes.c_int64, c_float_p]
        lib.pk_preemphasis.restype = ctypes.c_float
        lib.pk_preemphasis.argtypes = [c_float_p, ctypes.c_int64, ctypes.c_float,
                                       ctypes.c_float, c_float_p]
        lib.pk_flac_decode.restype = ctypes.c_int
        lib.pk_flac_decode.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_size_t,
            ctypes.POINTER(c_float_p), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
        lib.pk_free.restype = None
        lib.pk_free.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def build_capi() -> Path | None:
    """Self-build the flat C API library (csrc/parakeet_capi.cpp →
    _native/libparakeet_c.so), mirroring the audio runtime's g++-on-first-
    use pattern (cmake builds it too: csrc/CMakeLists.txt parakeet_c).
    Returns the library path, or None when the toolchain or the Python
    embed config is missing."""
    import sys
    import sysconfig

    src = _CSRC / "parakeet_capi.cpp"
    hdr = _CSRC / "parakeet.h"
    if not src.is_file() or sysconfig.get_config_var("Py_ENABLE_SHARED") != 1:
        return None
    _CACHE.mkdir(exist_ok=True)
    out = _CACHE / "libparakeet_c.so"
    deps = [src] + ([hdr] if hdr.is_file() else [])
    if out.is_file() and all(out.stat().st_mtime >= s.stat().st_mtime for s in deps):
        return out
    libdir = sysconfig.get_config_var("LIBDIR")
    pylib = f"python{sysconfig.get_config_var('VERSION')}{sys.abiflags}"
    cmd = ["g++", "-O2", "-std=c++20", "-shared", "-fPIC", str(src),
           f"-I{sysconfig.get_paths()['include']}", f"-I{_CSRC}",
           f"-L{libdir}", f"-l{pylib}", f"-Wl,-rpath,{libdir}",
           "-o", str(out)]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
    except (OSError, subprocess.SubprocessError):
        return None
    return out


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def sinc_resample(x: np.ndarray, src_rate: int, dst_rate: int) -> np.ndarray | None:
    lib = _load()
    if lib is None:
        return None
    x = np.ascontiguousarray(x, np.float32)
    n_out = lib.pk_resample_out_len(len(x), src_rate, dst_rate)
    out = np.empty(n_out, np.float32)
    lib.pk_sinc_resample(_fptr(x), len(x), src_rate, dst_rate, _fptr(out))
    return out


def downmix_to_mono(interleaved: np.ndarray, channels: int) -> np.ndarray | None:
    lib = _load()
    if lib is None:
        return None
    x = np.ascontiguousarray(interleaved, np.float32)
    frames = len(x) // channels
    out = np.empty(frames, np.float32)
    lib.pk_downmix_to_mono(_fptr(x), frames, channels, _fptr(out))
    return out


def int16_to_float(pcm: np.ndarray) -> np.ndarray | None:
    lib = _load()
    if lib is None:
        return None
    x = np.ascontiguousarray(pcm, np.int16)
    out = np.empty(len(x), np.float32)
    lib.pk_int16_to_float(x.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)), len(x), _fptr(out))
    return out


def preemphasis(x: np.ndarray, coeff: float = 0.97, prev: float = 0.0):
    lib = _load()
    if lib is None:
        return None
    x = np.ascontiguousarray(x, np.float32)
    out = np.empty_like(x)
    new_prev = lib.pk_preemphasis(_fptr(x), len(x), coeff, prev, _fptr(out))
    return out, float(new_prev)


def flac_decode(data: bytes):
    """FLAC bytes → (interleaved float32, sample_rate, channels) or None."""
    lib = _load()
    if lib is None:
        return None
    buf = (ctypes.c_uint8 * len(data)).from_buffer_copy(data)
    out_p = ctypes.POINTER(ctypes.c_float)()
    frames = ctypes.c_int64()
    channels = ctypes.c_int()
    rate = ctypes.c_int()
    rc = lib.pk_flac_decode(buf, len(data), ctypes.byref(out_p),
                            ctypes.byref(frames), ctypes.byref(channels), ctypes.byref(rate))
    if rc != 0:
        raise ValueError(f"FLAC decode failed (error {rc})")
    try:
        n = frames.value * channels.value
        arr = np.ctypeslib.as_array(out_p, shape=(n,)).copy()
    finally:
        lib.pk_free(out_p)
    return arr, rate.value, channels.value


__all__ = ["available", "sinc_resample", "downmix_to_mono", "int16_to_float",
           "preemphasis", "flac_decode"]

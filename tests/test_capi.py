"""Flat C API tests (reference Tier-3 roadmap item: "C API — Flat C
interface for FFI from Python, Swift, Go, Rust").

Two integration levels:
  * ctypes loads libparakeet_c.so INTO this Python process — exercises the
    attach-to-existing-interpreter path (Py_IsInitialized true);
  * a compiled C program links the library and runs as a subprocess —
    exercises the standalone-embed path (the library boots CPython itself),
    i.e. the actual Swift/Go/Rust FFI scenario.
"""

import ctypes
import json
import os
import subprocess
import sys
import sysconfig
from pathlib import Path

import numpy as np
import pytest

from parakeet_tpu.native import build_capi

pytestmark = pytest.mark.skipif(
    sysconfig.get_config_var("Py_ENABLE_SHARED") != 1,
    reason="no shared libpython (embed config unavailable)",
)


@pytest.fixture(scope="module")
def capi():
    path = build_capi()
    if path is None:
        pytest.skip("C API build failed (no toolchain)")
    lib = ctypes.CDLL(str(path))
    lib.parakeet_create.restype = ctypes.c_int64
    lib.parakeet_create.argtypes = [ctypes.c_char_p] * 4
    lib.parakeet_transcribe.restype = ctypes.c_void_p  # manual free
    lib.parakeet_transcribe.argtypes = [ctypes.c_int64, ctypes.c_char_p]
    lib.parakeet_transcribe_pcm.restype = ctypes.c_void_p
    lib.parakeet_transcribe_pcm.argtypes = [
        ctypes.c_int64, ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.c_int32,
    ]
    lib.parakeet_transcribe_pcm_s16.restype = ctypes.c_void_p
    lib.parakeet_transcribe_pcm_s16.argtypes = [
        ctypes.c_int64, ctypes.POINTER(ctypes.c_int16), ctypes.c_int64,
        ctypes.c_int32,
    ]
    lib.parakeet_destroy.argtypes = [ctypes.c_int64]
    lib.parakeet_last_error.restype = ctypes.c_char_p
    lib.parakeet_version.restype = ctypes.c_void_p
    lib.parakeet_free_string.argtypes = [ctypes.c_void_p]
    return lib


def _take_string(lib, ptr) -> str:
    assert ptr, f"C API error: {lib.parakeet_last_error().decode()}"
    try:
        return ctypes.string_at(ptr).decode()
    finally:
        lib.parakeet_free_string(ptr)


@pytest.fixture(scope="module")
def handle(capi):
    # no "device" option: this process's JAX is already CPU-forced by
    # conftest; create must attach, not reconfigure
    h = capi.parakeet_create(b"test-tiny", None, None,
                             b'{"decoder": "ctc", "timestamps": true}')
    assert h > 0, capi.parakeet_last_error().decode()
    yield h
    capi.parakeet_destroy(h)


def _sine(n=12000, hz=440.0):
    t = np.arange(n) / 16000.0
    return (0.4 * np.sin(2 * np.pi * hz * t)).astype(np.float32)


def test_create_rejects_unknown_model(capi):
    assert capi.parakeet_create(b"no-such-model", None, None, None) == 0
    assert b"no-such-model" in capi.parakeet_last_error()


def test_create_rejects_bad_options_json(capi):
    assert capi.parakeet_create(b"test-tiny", None, None, b"[1,2]") == 0
    assert b"JSON object" in capi.parakeet_last_error()


def test_transcribe_pcm_roundtrip(capi, handle):
    pcm = _sine()
    res = json.loads(_take_string(capi, capi.parakeet_transcribe_pcm(
        handle, pcm.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        len(pcm), 16000)))
    assert set(res) == {"text", "token_ids", "words"}
    assert isinstance(res["token_ids"], list)
    for w in res["words"]:
        assert set(w) == {"word", "start", "end", "confidence"}
        assert 0.0 <= w["confidence"] <= 1.0


def test_transcribe_pcm_s16_matches_f32(capi, handle):
    pcm = _sine()
    s16 = (pcm * 32768.0).clip(-32768, 32767).astype(np.int16)
    # feed the float values the s16 wire actually carries so both paths
    # see bit-identical samples
    f32_wire = s16.astype(np.float32) / 32768.0
    r_f = json.loads(_take_string(capi, capi.parakeet_transcribe_pcm(
        handle, f32_wire.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        len(pcm), 16000)))
    r_s = json.loads(_take_string(capi, capi.parakeet_transcribe_pcm_s16(
        handle, s16.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
        len(s16), 16000)))
    assert r_f["token_ids"] == r_s["token_ids"]


def test_transcribe_pcm_resamples(capi, handle):
    # 8 kHz input must be accepted (resampled to the model rate)
    t = np.arange(6000) / 8000.0
    pcm = (0.4 * np.sin(2 * np.pi * 440.0 * t)).astype(np.float32)
    res = json.loads(_take_string(capi, capi.parakeet_transcribe_pcm(
        handle, pcm.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        len(pcm), 8000)))
    assert isinstance(res["token_ids"], list)


def test_transcribe_file(capi, handle, tmp_path):
    import wave

    pcm = _sine()
    path = tmp_path / "clip.wav"
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes((pcm * 32767).astype("<i2").tobytes())
    res = json.loads(_take_string(capi, capi.parakeet_transcribe(
        handle, str(path).encode())))
    assert isinstance(res["token_ids"], list)


def test_transcribe_file_missing_errors(capi, handle):
    assert capi.parakeet_transcribe(handle, b"/nope/missing.wav") is None
    assert b"missing.wav" in capi.parakeet_last_error()


def test_invalid_handle_errors(capi):
    pcm = _sine(1600)
    ptr = pcm.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    assert capi.parakeet_transcribe_pcm(999999, ptr, len(pcm), 16000) is None
    assert b"999999" in capi.parakeet_last_error()


def test_version(capi):
    v = _take_string(capi, capi.parakeet_version())
    assert v and v[0].isdigit()


def test_align_over_c_api(capi, tmp_path):
    import wave

    capi.parakeet_align.restype = ctypes.c_void_p
    capi.parakeet_align.argtypes = [ctypes.c_int64, ctypes.c_char_p,
                                    ctypes.c_char_p]
    vocab = tmp_path / "vocab.txt"
    vocab.write_text("\n".join(["<unk>", "▁a", "▁b", "a", "b"]) + "\n")
    h = capi.parakeet_create(b"test-tiny", None, str(vocab).encode(), None)
    assert h > 0, capi.parakeet_last_error().decode()

    pcm = _sine(24000)
    path = tmp_path / "clip.wav"
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes((pcm * 32767).astype("<i2").tobytes())

    res = json.loads(_take_string(capi, capi.parakeet_align(
        h, str(path).encode(), "a b ab".encode())))
    assert len(res["words"]) == 3
    starts = [w["start"] for w in res["words"]]
    assert starts == sorted(starts)

    # too-short clip for the transcript → error, not crash
    assert capi.parakeet_align(h, str(path).encode(),
                               ("a b " * 200).encode()) is None
    assert b"frames" in capi.parakeet_last_error()
    capi.parakeet_destroy(h)


def test_diarize_over_c_api(capi, tmp_path):
    import wave

    capi.parakeet_diarize_create.restype = ctypes.c_int64
    capi.parakeet_diarize_create.argtypes = [ctypes.c_char_p] * 5
    capi.parakeet_diarize.restype = ctypes.c_void_p
    capi.parakeet_diarize.argtypes = [ctypes.c_int64, ctypes.c_char_p]

    vocab = tmp_path / "vocab.txt"
    vocab.write_text("\n".join(["<unk>", "▁a", "▁b", "a", "b"]) + "\n")
    h = capi.parakeet_diarize_create(b"test-tiny-diarized", None, None,
                                     str(vocab).encode(), None)
    assert h > 0, capi.parakeet_last_error().decode()

    pcm = _sine(12000)
    path = tmp_path / "clip.wav"
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes((pcm * 32767).astype("<i2").tobytes())

    res = json.loads(_take_string(capi, capi.parakeet_diarize(
        h, str(path).encode())))
    assert set(res) == {"text", "words", "segments"}
    for w in res["words"]:
        assert set(w) == {"word", "start", "end", "confidence", "speaker"}
        assert w["speaker"] >= -1
    for s in res["segments"]:
        assert set(s) == {"speaker", "start", "end"}

    # kind mismatch: offline transcribe on a diarized handle must error
    assert capi.parakeet_transcribe(h, str(path).encode()) is None
    assert b"diarized" in capi.parakeet_last_error()
    capi.parakeet_destroy(h)

    assert capi.parakeet_diarize_create(b"bogus", None, None, None, None) == 0
    assert b"bogus" in capi.parakeet_last_error()


def _stream_proto(capi):
    capi.parakeet_stream_create.restype = ctypes.c_int64
    capi.parakeet_stream_create.argtypes = [ctypes.c_char_p] * 4
    capi.parakeet_stream_feed.restype = ctypes.c_void_p
    capi.parakeet_stream_feed.argtypes = [
        ctypes.c_int64, ctypes.POINTER(ctypes.c_float), ctypes.c_int64]
    capi.parakeet_stream_text.restype = ctypes.c_void_p
    capi.parakeet_stream_text.argtypes = [ctypes.c_int64]
    capi.parakeet_stream_reset.argtypes = [ctypes.c_int64]


def test_streaming_matches_python_facade(capi):
    """C-API streaming must be token-identical to the Python facade fed
    the same chunks with the same seed."""
    _stream_proto(capi)
    h = capi.parakeet_stream_create(b"test-tiny-stream", None, None,
                                    b'{"seed": 31}')
    assert h > 0, capi.parakeet_last_error().decode()

    from parakeet_tpu.capi import _tiny_stream_config
    from parakeet_tpu.streaming import StreamingTranscriber

    ref = StreamingTranscriber(None, None, _tiny_stream_config(), seed=31)
    rng = np.random.RandomState(7)
    audio = (0.3 * rng.randn(16000)).astype(np.float32)
    deltas = []
    for off in range(0, len(audio), 3200):
        chunk = audio[off:off + 3200]
        ref.transcribe_chunk(chunk)
        out = json.loads(_take_string(capi, capi.parakeet_stream_feed(
            h, chunk.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            len(chunk))))
        deltas.append(out["delta"])
    got = json.loads(_take_string(capi, capi.parakeet_stream_text(h)))
    assert got["token_ids"] == list(ref.get_tokens())

    # reset + refeed is deterministic
    capi.parakeet_stream_reset(h)
    for off in range(0, len(audio), 3200):
        chunk = audio[off:off + 3200]
        _take_string(capi, capi.parakeet_stream_feed(
            h, chunk.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            len(chunk)))
    again = json.loads(_take_string(capi, capi.parakeet_stream_text(h)))
    assert again["token_ids"] == got["token_ids"]
    capi.parakeet_destroy(h)


def test_stream_handle_kind_mismatch(capi, handle):
    """Offline calls on a stream handle (and vice versa) must error, not
    misbehave."""
    _stream_proto(capi)
    pcm = _sine(3200)
    assert capi.parakeet_stream_feed(
        handle, pcm.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        len(pcm)) is None
    assert b"offline" in capi.parakeet_last_error()

    h = capi.parakeet_stream_create(b"test-tiny-stream", None, None, None)
    assert h > 0
    assert capi.parakeet_transcribe_pcm(
        h, pcm.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        len(pcm), 16000) is None
    assert b"stream" in capi.parakeet_last_error()
    capi.parakeet_destroy(h)


def test_stream_create_rejects_unknown_model(capi):
    _stream_proto(capi)
    assert capi.parakeet_stream_create(b"bogus-stream", None, None, None) == 0
    assert b"bogus-stream" in capi.parakeet_last_error()


def test_standalone_c_host(tmp_path):
    """Compile tests/helpers/capi_host.c against libparakeet_c.so and run
    it as its own process: the library must boot CPython itself (the
    Swift/Go/Rust embed scenario) and round-trip PCM → JSON."""
    lib = build_capi()
    if lib is None:
        pytest.skip("C API build failed (no toolchain)")
    src = Path(__file__).parent / "helpers" / "capi_host.c"
    csrc = Path(__file__).resolve().parent.parent / "csrc"
    exe = tmp_path / "capi_host"
    libdir = sysconfig.get_config_var("LIBDIR")
    pylib = f"python{sysconfig.get_config_var('VERSION')}{sys.abiflags}"
    try:
        subprocess.run(
            ["gcc", "-O1", str(src), f"-I{csrc}", str(lib),
             f"-L{libdir}", f"-l{pylib}",
             f"-Wl,-rpath,{lib.parent}", f"-Wl,-rpath,{libdir}",
             "-lm", "-o", str(exe)],
            check=True, capture_output=True, timeout=120,
        )
    except (OSError, subprocess.SubprocessError):
        pytest.skip("no C toolchain for the standalone host")
    # A real FFI host would have parakeet_tpu pip-installed; this checkout
    # may not be, so point the embedded interpreter at the repo root the
    # same way an uninstalled deployment would (PYTHONPATH).
    env = dict(os.environ)
    repo = str(Path(__file__).resolve().parent.parent)
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run([str(exe)], capture_output=True, text=True,
                          timeout=600, env=env)
    assert proc.returncode == 0, proc.stderr + proc.stdout
    lines = proc.stdout.splitlines()
    assert lines[-1] == "OK"
    payloads = [l for l in lines if l.startswith("RESULT ")]
    assert payloads, proc.stdout
    res = json.loads(payloads[0].removeprefix("RESULT "))
    assert set(res) == {"text", "token_ids", "words"}
    stream = [l for l in lines if l.startswith("STREAM ")]
    assert stream, proc.stdout
    sres = json.loads(stream[0].removeprefix("STREAM "))
    assert set(sres) == {"text", "token_ids"}

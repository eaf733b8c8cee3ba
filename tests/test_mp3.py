"""MP3 decode tests: encode a test signal with the system libmp3lame
(ctypes), decode with our libmpg123 binding, verify signal integrity."""

import ctypes

import numpy as np
import pytest

from parakeet_tpu.audio.codecs import mp3_available, mp3_decode
from parakeet_tpu.audio.io import read_audio

pytestmark = pytest.mark.skipif(not mp3_available(), reason="libmpg123 not present")


def _lame():
    for name in ("libmp3lame.so.0", "libmp3lame.so"):
        try:
            return ctypes.CDLL(name)
        except OSError:
            continue
    return None


def encode_mp3(samples: np.ndarray, sr: int = 16000) -> bytes:
    lame = _lame()
    if lame is None:
        pytest.skip("libmp3lame not present to create test fixture")
    lame.lame_init.restype = ctypes.c_void_p
    gfp = lame.lame_init()
    lame.lame_set_in_samplerate(ctypes.c_void_p(gfp), sr)
    lame.lame_set_num_channels(ctypes.c_void_p(gfp), 1)
    lame.lame_set_mode(ctypes.c_void_p(gfp), 3)  # MONO
    lame.lame_init_params(ctypes.c_void_p(gfp))
    pcm = np.clip(samples * 32767, -32768, 32767).astype(np.int16)
    out = (ctypes.c_char * (len(pcm) * 2 + 7200))()
    n = lame.lame_encode_buffer(
        ctypes.c_void_p(gfp),
        pcm.ctypes.data_as(ctypes.POINTER(ctypes.c_short)),
        None, len(pcm), out, len(out),
    )
    assert n >= 0
    data = bytes(out[:n])
    n2 = lame.lame_encode_flush(ctypes.c_void_p(gfp), out, len(out))
    data += bytes(out[:n2])
    lame.lame_close(ctypes.c_void_p(gfp))
    return data


def _sine(seconds=1.0, freq=440.0, sr=16000):
    t = np.arange(int(seconds * sr)) / sr
    return (0.5 * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def test_mp3_roundtrip_tone():
    x = _sine()
    data = encode_mp3(x)
    out, sr, ch = mp3_decode(data)
    assert sr == 16000 and ch == 1
    # MP3 is lossy + adds encoder delay; verify duration and dominant tone.
    assert abs(len(out) - len(x)) < 4000
    mid = out[2000:-2000]
    spec = np.abs(np.fft.rfft(mid * np.hanning(len(mid))))
    peak = np.argmax(spec) * sr / len(mid)
    assert abs(peak - 440.0) < 5.0
    assert 0.3 < np.percentile(np.abs(mid), 99) < 0.7


def test_read_audio_mp3_path(tmp_path):
    x = _sine(0.5)
    p = tmp_path / "clip.mp3"
    p.write_bytes(encode_mp3(x))
    audio = read_audio(p)
    assert audio.format == "mp3"
    assert audio.sample_rate == 16000
    assert abs(audio.duration - 0.5) < 0.25


def test_mp3_garbage_raises():
    with pytest.raises(Exception):
        mp3_decode(b"definitely not an mp3 stream" * 10)

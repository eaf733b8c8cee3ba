"""Property/fuzz tests for the audio parsers: arbitrary or corrupted bytes
must fail with a clean ValueError/RuntimeError (or decode successfully) —
never crash, hang, or return garbage shapes. The native FLAC decoder and
the RIFF/STREAMINFO/OggS header parsers all consume untrusted input."""

import struct

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from parakeet_tpu.audio.io import (
    _flac_streaminfo_duration,
    _ogg_granule_duration,
    _parse_wav,
    detect_format_by_magic,
    read_audio,
)

FUZZ = settings(
    max_examples=150, deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)


@given(st.binary(min_size=0, max_size=512))
@FUZZ
def test_magic_detection_total(data):
    """Format detection is total: any bytes → a string, never an exception."""
    assert isinstance(detect_format_by_magic(data), str)


@given(st.binary(min_size=0, max_size=2048))
@FUZZ
def test_wav_parser_never_crashes(data):
    try:
        x, sr, ch = _parse_wav(b"RIFF\x00\x00\x00\x00WAVE" + data)
    except (ValueError, struct.error):
        return
    assert isinstance(sr, int) and ch >= 0


@given(st.binary(min_size=0, max_size=1024))
@FUZZ
def test_flac_streaminfo_duration_total(data):
    d = _flac_streaminfo_duration(b"fLaC" + data)
    assert d is None or d >= 0


@given(st.binary(min_size=0, max_size=1024))
@FUZZ
def test_ogg_duration_total(data):
    d = _ogg_granule_duration(b"OggS" + data)
    assert d is None or d >= 0


@given(st.binary(min_size=0, max_size=4096))
@FUZZ
def test_read_audio_bytes_fails_cleanly(data):
    """read_audio on arbitrary bytes: decode or a clean error, never a hang
    or an uncontrolled exception type."""
    try:
        audio = read_audio(data)
    except (ValueError, RuntimeError, EOFError, struct.error):
        return
    assert audio.samples.dtype == np.float32


def test_truncated_real_wav_fails_cleanly(tmp_path):
    from parakeet_tpu.audio.io import write_wav

    p = tmp_path / "t.wav"
    write_wav(p, np.zeros(4000, np.float32), 16000)
    data = p.read_bytes()
    for cut in (4, 11, 12, 20, 36, 44, 100):
        try:
            read_audio(data[:cut])
        except (ValueError, RuntimeError, struct.error):
            pass


def test_corrupted_flac_bodies_fail_cleanly():
    from parakeet_tpu import native
    from tests.helpers.flac_writer import encode_flac

    if not native.available():
        pytest.skip("native decoder not built")
    pcm = (np.sin(np.arange(4000) * 0.1) * 20000).astype(np.int16)
    good = bytearray(encode_flac(pcm, 16000, subframe_mode="fixed1"))
    rng = np.random.RandomState(0)
    for _ in range(25):
        data = bytearray(good)
        for _ in range(rng.randint(1, 8)):
            data[rng.randint(len(data))] = rng.randint(256)
        try:
            out, sr, ch = native.flac_decode(bytes(data))
            assert len(out) < 10 * len(pcm)  # no absurd allocations
        except (ValueError, RuntimeError):
            pass

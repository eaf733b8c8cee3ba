"""Native FLAC decoder tests against the pure-python encoder fixture
(tests/helpers/flac_writer.py) — covers constant/verbatim/fixed+Rice
subframes, multi-frame streams, stereo (independent + left/side), and the
read_audio integration path."""

import numpy as np
import pytest

from parakeet_tpu import native
from parakeet_tpu.audio.io import read_audio
from tests.helpers.flac_writer import encode_flac

pytestmark = pytest.mark.skipif(not native.available(), reason="native lib not built")


def _pcm16(x: np.ndarray) -> np.ndarray:
    return np.clip(np.round(x * 32767), -32768, 32767).astype(np.int64)


def _sine(frames=6000, freq=440.0, sr=16000, amp=0.5):
    t = np.arange(frames) / sr
    return amp * np.sin(2 * np.pi * freq * t)


@pytest.mark.parametrize("mode", ["verbatim", "fixed0", "fixed1", "fixed2"])
def test_mono_roundtrip(mode):
    pcm = _pcm16(_sine())
    data = encode_flac(pcm, 16000, block_size=2048, subframe_mode=mode)
    out, sr, ch = native.flac_decode(data)
    assert (sr, ch) == (16000, 1)
    assert len(out) == len(pcm)
    np.testing.assert_allclose(out, pcm / 32768.0, atol=1e-6)


def test_constant_subframes():
    pcm = np.full(4096, 123, np.int64)
    data = encode_flac(pcm, 16000, block_size=1024, subframe_mode="constant")
    out, sr, ch = native.flac_decode(data)
    np.testing.assert_allclose(out, 123 / 32768.0, atol=1e-6)


def test_stereo_independent():
    left = _pcm16(_sine(5000, 440.0))
    right = _pcm16(_sine(5000, 660.0))
    pcm = np.stack([left, right], axis=1)
    data = encode_flac(pcm, 22050, block_size=4096, subframe_mode="fixed1")
    out, sr, ch = native.flac_decode(data)
    assert (sr, ch) == (22050, 2)
    inter = out.reshape(-1, 2)
    np.testing.assert_allclose(inter[:, 0], left / 32768.0, atol=1e-6)
    np.testing.assert_allclose(inter[:, 1], right / 32768.0, atol=1e-6)


def test_stereo_left_side_decorrelation():
    left = _pcm16(_sine(3000, 300.0))
    right = _pcm16(_sine(3000, 450.0, amp=0.3))
    pcm = np.stack([left, right], axis=1)
    data = encode_flac(pcm, 16000, block_size=1024, subframe_mode="verbatim", left_side=True)
    out, sr, ch = native.flac_decode(data)
    inter = out.reshape(-1, 2)
    np.testing.assert_allclose(inter[:, 0], left / 32768.0, atol=1e-6)
    np.testing.assert_allclose(inter[:, 1], right / 32768.0, atol=1e-6)


def test_odd_tail_block():
    pcm = _pcm16(_sine(5003))  # last frame shorter than block size
    data = encode_flac(pcm, 16000, block_size=2048, subframe_mode="fixed2")
    out, _, _ = native.flac_decode(data)
    assert len(out) == 5003
    np.testing.assert_allclose(out, pcm / 32768.0, atol=1e-6)


def test_read_audio_flac_path(tmp_path):
    pcm = _pcm16(_sine(8000))
    p = tmp_path / "clip.flac"
    p.write_bytes(encode_flac(pcm, 16000, subframe_mode="fixed1"))
    audio = read_audio(p)
    assert audio.format == "flac"
    assert audio.sample_rate == 16000
    np.testing.assert_allclose(audio.samples, pcm / 32768.0, atol=1e-6)


def test_corrupt_flac_raises():
    with pytest.raises(ValueError):
        native.flac_decode(b"fLaC" + b"\x00" * 16)
    with pytest.raises(ValueError):
        native.flac_decode(b"not a flac file at all")


def test_32bit_left_side_decorrelation():
    """32-bit stream with left/side stereo: the side channel is 33 bits wide
    (regression for the signed_bits width bug)."""
    rng = np.random.RandomState(0)
    left = (rng.randn(2000) * 2**30).astype(np.int64).clip(-2**31, 2**31 - 1)
    right = (rng.randn(2000) * 2**30).astype(np.int64).clip(-2**31, 2**31 - 1)
    pcm = np.stack([left, right], axis=1)
    data = encode_flac(pcm, 16000, block_size=1024, subframe_mode="verbatim",
                       left_side=True, bps=32)
    out, sr, ch = native.flac_decode(data)
    inter = out.reshape(-1, 2).astype(np.float64) * 2**31
    np.testing.assert_allclose(inter[:, 0], left, atol=300)  # f32 output quantization
    np.testing.assert_allclose(inter[:, 1], right, atol=300)


def test_flac_fuzz_no_crash():
    """Random garbage behind a valid fLaC magic must error, never crash or
    hang (bit-reader bounds + unary guard)."""
    rng = np.random.RandomState(0)
    for i in range(50):
        blob = b"fLaC" + rng.bytes(int(rng.randint(8, 400)))
        try:
            native.flac_decode(blob)
        except ValueError:
            pass  # expected


def test_flac_truncated_stream():
    """A valid stream cut mid-frame must not crash."""
    pcm = _pcm16(_sine(3000))
    data = encode_flac(pcm, 16000, block_size=1024, subframe_mode="fixed1")
    for cut in (len(data) // 3, len(data) // 2, len(data) - 7):
        try:
            out, _, _ = native.flac_decode(data[:cut])
            assert len(out) <= len(pcm)  # partial decode acceptable
        except ValueError:
            pass  # error acceptable; crash is not

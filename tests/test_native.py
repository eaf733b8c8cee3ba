"""Native C++ library tests: builds with g++, matches the numpy reference
numerics bit-for-bit (both implement audio_io.cpp:96-214)."""

import numpy as np
import pytest

from parakeet_tpu import native


pytestmark = pytest.mark.skipif(not native.available(), reason="native lib not built (no g++?)")


def _sine(seconds=0.3, freq=440.0, sr=16000):
    t = np.arange(int(seconds * sr)) / sr
    return (0.5 * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def _numpy_resample(x, src, dst):
    """Force the numpy fallback path."""
    import os

    os.environ["PARAKEET_NO_NATIVE"] = "1"
    try:
        import importlib
        import parakeet_tpu.native as nat

        # call the pure-numpy implementation in audio.io directly by
        # monkeypatching availability
        from parakeet_tpu.audio import io as aio

        real = nat.sinc_resample
        nat.sinc_resample = lambda *a, **k: None
        try:
            return aio.resample(x, src, dst)
        finally:
            nat.sinc_resample = real
    finally:
        del os.environ["PARAKEET_NO_NATIVE"]


@pytest.mark.parametrize("src,dst", [(16000, 8000), (8000, 16000), (44100, 16000), (22050, 16000)])
def test_resample_matches_numpy(src, dst):
    x = _sine(0.3, 440.0, src)
    a = native.sinc_resample(x, src, dst)
    b = _numpy_resample(x, src, dst)
    assert a is not None
    assert len(a) == len(b)
    np.testing.assert_allclose(a, b, atol=2e-6)


def test_downmix_matches_numpy():
    rng = np.random.RandomState(0)
    inter = rng.randn(4 * 100).astype(np.float32)
    a = native.downmix_to_mono(inter, 4)
    b = inter.reshape(100, 4).mean(axis=1).astype(np.float32)
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_int16_to_float():
    pcm = np.array([-32768, -1, 0, 1, 32767], np.int16)
    out = native.int16_to_float(pcm)
    np.testing.assert_allclose(out, pcm.astype(np.float32) / 32768.0, atol=1e-7)


def test_preemphasis_streaming_state():
    x = _sine(0.1)
    full, prev = native.preemphasis(x, 0.97, 0.0)
    # split into two chunks with carried state
    a, p1 = native.preemphasis(x[:800], 0.97, 0.0)
    b, p2 = native.preemphasis(x[800:], 0.97, p1)
    np.testing.assert_allclose(np.concatenate([a, b]), full, atol=1e-7)
    assert abs(p2 - prev) < 1e-7
    assert abs(prev - x[-1]) < 1e-7


def test_resample_identity_rate():
    x = _sine(0.05)
    out = native.sinc_resample(x, 16000, 16000)
    np.testing.assert_array_equal(out, x)

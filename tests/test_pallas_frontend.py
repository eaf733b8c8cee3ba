"""Fused Pallas mel kernel vs the jnp reference path (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from parakeet_tpu.audio.frontend import _preemphasis, _stft_power, mel_filterbank, LOG_GUARD
from parakeet_tpu.config import AudioConfig
from parakeet_tpu.ops.pallas_frontend import fused_log_mel


@pytest.mark.parametrize("n_samples", [16000, 40000])
def test_fused_log_mel_matches_jnp(n_samples):
    cfg = AudioConfig()
    rng = np.random.RandomState(0)
    wave = rng.randn(n_samples).astype(np.float32) * 0.2

    pre = _preemphasis(jnp.asarray(wave))
    padded = jnp.pad(pre, (cfg.n_fft // 2, cfg.n_fft // 2), mode="reflect")

    ours = np.asarray(
        fused_log_mel(padded, n_fft=cfg.n_fft, hop=cfg.hop_length,
                      win_length=cfg.win_length, n_mels=cfg.n_mels,
                      interpret=True)
    )

    n_frames = n_samples // cfg.hop_length + 1
    power = _stft_power(pre, cfg, center=True, n_frames=n_frames)
    fb = mel_filterbank(257, 80, 16000.0, 0.0, 8000.0)
    ref = np.asarray(jnp.log(jnp.matmul(power, jnp.asarray(fb)) + LOG_GUARD))

    assert ours.shape == ref.shape
    # DFT-as-matmul vs rfft: different summation order; log amplifies near
    # the guard floor. Agreement within ~1e-2 in log space.
    np.testing.assert_allclose(ours, ref, atol=2e-2)


def test_fused_log_mel_128_mels():
    wave = np.random.RandomState(1).randn(8000).astype(np.float32)
    out = np.asarray(fused_log_mel(jnp.asarray(wave), n_mels=128, interpret=True))
    assert out.shape == ((8000 - 512) // 160 + 1, 128)
    assert np.isfinite(out).all()

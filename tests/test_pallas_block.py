"""Fused conv+ffn2+final-norm block kernel vs the XLA path (interpret)."""

import numpy as np
import jax.numpy as jnp
import pytest

from parakeet_tpu import config as C
from parakeet_tpu import params as P
from parakeet_tpu.models import encoder as E
from parakeet_tpu.params import Params


def _interp(monkeypatch):
    import parakeet_tpu.ops.pallas_block as PB

    orig = PB.fused_conv_ffn_final

    def interp(*args, **kw):
        kw["interpret"] = True
        return orig(*args, **kw)

    monkeypatch.setattr(PB, "fused_conv_ffn_final", interp)


@pytest.fixture
def tiny():
    cfg = C.EncoderConfig(mel_bins=80, subsampling_channels=8, hidden_size=16,
                          num_layers=2, num_heads=2, ffn_intermediate=32,
                          conv_kernel_size=9)
    params = P.init_params(P.encoder_spec(cfg, "encoder_"), seed=31)
    return cfg, Params(params).sub("encoder_")


def test_full_encoder_fused_block2(tiny, monkeypatch):
    _interp(monkeypatch)
    cfg, root = tiny
    x = jnp.asarray(np.random.RandomState(11).randn(2, 520, 80).astype(np.float32))
    ref = np.asarray(E.fastconformer_encode(root, cfg, x))
    E.set_fused_block2(True)
    try:
        got = np.asarray(E.fastconformer_encode(root, cfg, x))
    finally:
        E.set_fused_block2(False)
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-5)


def test_fused_block2_masked_lengths(tiny, monkeypatch):
    _interp(monkeypatch)
    cfg, root = tiny
    mel = np.zeros((2, 560, 80), np.float32)
    mel[0, :520] = np.random.RandomState(13).randn(520, 80)
    mel[1, :560] = np.random.RandomState(14).randn(560, 80)
    lengths = jnp.asarray([520, 560])

    ref = np.asarray(E.fastconformer_encode(root, cfg, jnp.asarray(mel), lengths))
    E.set_fused_block2(True)
    try:
        got = np.asarray(E.fastconformer_encode(root, cfg, jnp.asarray(mel), lengths))
    finally:
        E.set_fused_block2(False)
    t_valid = E.subsample_length(520)
    np.testing.assert_allclose(got[0, :t_valid], ref[0, :t_valid], rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(got[1], ref[1], rtol=1e-3, atol=1e-5)

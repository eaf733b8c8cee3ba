"""Fused Pallas conv-module kernel vs the XLA paths (interpret mode)."""

import numpy as np
import jax.numpy as jnp
import pytest

from parakeet_tpu import config as C
from parakeet_tpu import params as P
from parakeet_tpu.models import encoder as E
from parakeet_tpu.params import Params


def _interp(monkeypatch):
    import parakeet_tpu.ops.pallas_conv as PC

    orig = PC.fused_conv_module

    def interp(*args, **kw):
        kw["interpret"] = True
        return orig(*args, **kw)

    monkeypatch.setattr(PC, "fused_conv_module", interp)


@pytest.fixture
def tiny():
    cfg = C.EncoderConfig(mel_bins=80, subsampling_channels=8, hidden_size=16,
                          num_layers=1, num_heads=2, ffn_intermediate=32,
                          conv_kernel_size=9)
    params = P.init_params(P.encoder_spec(cfg, "encoder_"), seed=12)
    return cfg, Params(params).sub("encoder_")


def test_fused_conv_module_matches_nch(tiny, monkeypatch):
    _interp(monkeypatch)
    cfg, root = tiny
    p = root.sub("layers_").sub("0").sub("conv_")
    x = jnp.asarray(np.random.RandomState(3).randn(2, 20, 16).astype(np.float32))

    ref = np.asarray(E.conv_module(p, x, cfg.conv_kernel_size, 1e-5))
    E.set_conv_layout("pallas")
    try:
        got = np.asarray(E.conv_module(p, x, cfg.conv_kernel_size, 1e-5))
    finally:
        E.set_conv_layout("nch")
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=1e-5)


def test_fused_conv_module_pad_mask(tiny, monkeypatch):
    """Padded rows must not bleed into valid frames (pad_mask semantics)."""
    _interp(monkeypatch)
    cfg, root = tiny
    p = root.sub("layers_").sub("0").sub("conv_")
    rng = np.random.RandomState(5)
    x = np.zeros((2, 24, 16), np.float32)
    x[0, :16] = rng.randn(16, 16)
    x[1, :24] = rng.randn(24, 16)
    lengths = np.array([16, 24])
    pad_mask = jnp.asarray(np.arange(24)[None, :] >= lengths[:, None])

    ref = np.asarray(E.conv_module(p, jnp.asarray(x), cfg.conv_kernel_size, 1e-5, pad_mask))
    E.set_conv_layout("pallas")
    try:
        got = np.asarray(E.conv_module(p, jnp.asarray(x), cfg.conv_kernel_size, 1e-5, pad_mask))
    finally:
        E.set_conv_layout("nch")
    np.testing.assert_allclose(got[0, :16], ref[0, :16], rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(got[1], ref[1], rtol=2e-4, atol=1e-5)


def test_full_encoder_pallas_conv(tiny, monkeypatch):
    _interp(monkeypatch)
    cfg, root = tiny
    x = jnp.asarray(np.random.RandomState(6).randn(1, 48, 80).astype(np.float32))
    ref = np.asarray(E.fastconformer_encode(root, cfg, x))
    E.set_conv_layout("pallas")
    try:
        got = np.asarray(E.fastconformer_encode(root, cfg, x))
    finally:
        E.set_conv_layout("nch")
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-5)

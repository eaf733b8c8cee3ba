"""Fused Pallas FFN kernel vs the XLA path (interpret mode)."""

import numpy as np
import jax.numpy as jnp
import pytest

from parakeet_tpu import config as C
from parakeet_tpu import params as P
from parakeet_tpu.models import encoder as E
from parakeet_tpu.params import Params


def _interp(monkeypatch):
    import parakeet_tpu.ops.pallas_ffn as PF

    orig = PF.fused_feed_forward

    def interp(*args, **kw):
        kw["interpret"] = True
        return orig(*args, **kw)

    monkeypatch.setattr(PF, "fused_feed_forward", interp)


@pytest.fixture
def tiny():
    cfg = C.EncoderConfig(mel_bins=80, subsampling_channels=8, hidden_size=16,
                          num_layers=2, num_heads=2, ffn_intermediate=32)
    params = P.init_params(P.encoder_spec(cfg, "encoder_"), seed=21)
    return cfg, Params(params).sub("encoder_")


def test_fused_ffn_matches_xla(tiny, monkeypatch):
    _interp(monkeypatch)
    cfg, root = tiny
    p = root.sub("layers_").sub("0").sub("ffn1_")
    x = jnp.asarray(np.random.RandomState(7).randn(2, 64, 16).astype(np.float32))  # T >= 64: kernel guard
    ref = np.asarray(E.feed_forward(p, x, 1e-5))
    E.set_fused_ffn(True)
    try:
        got = np.asarray(E.feed_forward(p, x, 1e-5))
    finally:
        E.set_fused_ffn(False)
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=1e-5)


def test_full_encoder_fused_ffn(tiny, monkeypatch):
    """Whole encoder with fused FFNs (incl. final-norm fusion into ffn2)."""
    _interp(monkeypatch)
    cfg, root = tiny
    x = jnp.asarray(np.random.RandomState(9).randn(2, 520, 80).astype(np.float32))  # T'=65 >= 64
    ref = np.asarray(E.fastconformer_encode(root, cfg, x))
    E.set_fused_ffn(True)
    try:
        got = np.asarray(E.fastconformer_encode(root, cfg, x))
    finally:
        E.set_fused_ffn(False)
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-5)


def test_fused_ffn_guard_small_chunks(tiny, monkeypatch):
    """Streaming-sized chunks (T < 64) bypass the kernel (pad waste)."""
    called = []
    import parakeet_tpu.ops.pallas_ffn as PF

    def boom(*a, **k):
        called.append(1)
        raise AssertionError("kernel must not run for tiny chunks")

    monkeypatch.setattr(PF, "fused_feed_forward", boom)
    cfg, root = tiny
    p = root.sub("layers_").sub("0").sub("ffn1_")
    x = jnp.asarray(np.random.RandomState(1).randn(1, 8, 16).astype(np.float32))
    E.set_fused_ffn(True)
    try:
        E.feed_forward(p, x, 1e-5)
    finally:
        E.set_fused_ffn(False)
    assert not called

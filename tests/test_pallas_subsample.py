"""Fused subsampling kernel (conv1→dw1→conv2) vs the XLA path (interpret)."""

import numpy as np
import jax.numpy as jnp
import pytest

from parakeet_tpu import config as C
from parakeet_tpu import params as P
from parakeet_tpu.models import encoder as E
from parakeet_tpu.ops.pallas_subsample import fused_subsample_block1
from parakeet_tpu.params import Params


def _setup(mel=80, ch=16, t=77, b=2, seed=5):
    cfg = C.EncoderConfig(mel_bins=mel, subsampling_channels=ch, hidden_size=32,
                          num_layers=1, num_heads=2, ffn_intermediate=64)
    params = Params(P.init_params(P.encoder_spec(cfg, "encoder_"), seed=seed))
    p = params.sub("encoder_").sub("subsampling_")
    x = jnp.asarray(np.random.RandomState(seed).randn(b, t, mel).astype(np.float32))
    return p, x


def _fused(p, x, activation="relu", t4_tile=4):
    return fused_subsample_block1(
        x,
        p["conv1_.weight"], p["conv1_.bias"],
        p["dw1_.weight"], p["dw1_.bias"],
        p["conv2_.weight"], p["conv2_.bias"],
        activation=activation, t4_tile=t4_tile, interpret=True,
    )


# The kernel is default-OFF (measured negative, TUNING.md r4) — one ragged-T
# canary stays in the default profile; the full shape matrix runs nightly.
@pytest.mark.parametrize(
    "t",
    [pytest.param(77, marks=pytest.mark.slow),
     pytest.param(101, marks=pytest.mark.slow),
     pytest.param(32, marks=pytest.mark.slow),
     63],
)
def test_fused_subsample_matches_xla_block1(t):
    """after_block1 parity across T shapes (odd/even, tile-exact, ragged)."""
    p, x = _setup(t=t)
    want = np.asarray(E.conv_subsampling_stages(p, x)["after_block1"])
    got = np.asarray(_fused(p, x))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


@pytest.mark.slow
def test_fused_subsample_silu():
    p, x = _setup(mel=128, t=65, seed=9)
    want = np.asarray(E.conv_subsampling_stages(p, x, activation="silu")["after_block1"])
    got = np.asarray(_fused(p, x, activation="silu"))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


@pytest.mark.slow
def test_fused_subsample_bf16_close():
    p, x = _setup(t=95)
    xb = x.astype(jnp.bfloat16)
    pb = Params({k: (v.astype(jnp.bfloat16) if v.dtype == jnp.float32 else v)
                 for k, v in p.data.items()}, p.prefix)
    want = np.asarray(
        E.conv_subsampling_stages(pb, xb)["after_block1"]).astype(np.float32)
    got = np.asarray(_fused(pb, xb)).astype(np.float32)
    np.testing.assert_allclose(got, want, rtol=0.1, atol=0.1)


def test_conv_subsampling_toggle_matches(monkeypatch):
    """Full conv_subsampling output (through dw2/conv3/proj) with the
    set_fused_subsample toggle on == XLA path; small-T inputs fall back."""
    import parakeet_tpu.ops.pallas_subsample as PS

    orig = PS.fused_subsample_block1

    def interp(*a, **kw):
        kw["interpret"] = True
        return orig(*a, **kw)

    monkeypatch.setattr(PS, "fused_subsample_block1", interp)
    monkeypatch.setattr(E, "_SUBSAMPLE_T4_TILE", 4)
    cfg = C.EncoderConfig(mel_bins=80, subsampling_channels=16, hidden_size=32,
                          num_layers=1, num_heads=2, ffn_intermediate=64)
    params = Params(P.init_params(P.encoder_spec(cfg, "encoder_"), seed=3))
    p = params.sub("encoder_").sub("subsampling_")
    x = jnp.asarray(np.random.RandomState(3).randn(2, 99, 80).astype(np.float32))
    want = np.asarray(E.conv_subsampling(p, x))
    E.set_fused_subsample(True)
    try:
        got = np.asarray(E.conv_subsampling(p, x))
        # small input → guard rejects → identical object path (no kernel)
        small = np.asarray(E.conv_subsampling(
            p, jnp.asarray(np.random.RandomState(4).randn(1, 9, 80).astype(np.float32))))
        assert small.shape[1] == E.subsample_length(9)
    finally:
        E.set_fused_subsample(False)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)

"""FastConformer encoder unit tests with independent numpy oracles
(strategy from reference compare_encoder.py / test_all.cpp:200-236)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from parakeet_tpu import config as C
from parakeet_tpu import params as P
from parakeet_tpu.models import encoder as E
from parakeet_tpu.params import Params


def tiny_cfg(**kw):
    base = dict(
        mel_bins=80, subsampling_channels=16, hidden_size=32, num_layers=2,
        num_heads=4, ffn_intermediate=64, conv_kernel_size=9,
    )
    base.update(kw)
    return C.EncoderConfig(**base)


@pytest.fixture(scope="module")
def tiny():
    cfg = tiny_cfg()
    params = P.init_params(P.encoder_spec(cfg, "encoder_"), seed=0)
    return cfg, Params(params).sub("encoder_")


def test_pos_emb_values():
    pe = np.asarray(E.sinusoidal_position_embedding(4, 8))
    assert pe.shape == (7, 8)
    # Row 0 ↔ position +3, row 3 ↔ position 0, row 6 ↔ position -3.
    np.testing.assert_allclose(pe[3, 0::2], 0.0, atol=1e-7)  # sin(0)
    np.testing.assert_allclose(pe[3, 1::2], 1.0, atol=1e-7)  # cos(0)
    d = 8
    for i in range(0, d, 2):
        div = np.exp(i * (-np.log(10000.0) / d))
        assert abs(pe[0, i] - np.sin(3 * div)) < 1e-6
        assert abs(pe[6, i] - np.sin(-3 * div)) < 1e-6


def test_rel_shift_index_map():
    """rel_shift must realize out[t, s] = in[t, (T-1) - t + s] (the rel-pos
    table row for relative position t-s; encoder.cpp:85-109)."""
    b, h, t = 2, 3, 5
    rng = np.random.RandomState(0)
    x = rng.randn(b, h, t, 2 * t - 1).astype(np.float32)
    out = np.asarray(E.rel_shift(jnp.asarray(x)))
    for ti in range(t):
        for s in range(t):
            np.testing.assert_allclose(out[:, :, ti, s], x[:, :, ti, (t - 1) - ti + s], rtol=1e-6)


def test_subsampling_shape(tiny):
    cfg, p = tiny
    x = jnp.zeros((2, 101, 80))
    y = E.conv_subsampling(p.sub("subsampling_"), x)
    assert y.shape == (2, 13, 32)
    assert E.subsample_length(101) == 13


def test_attention_vs_naive_oracle(tiny):
    """Full rel-pos attention vs a loop-free numpy oracle that indexes the
    position table directly (no shift trick)."""
    cfg, p = tiny
    rng = np.random.RandomState(1)
    t, d, H = 7, cfg.hidden_size, cfg.num_heads
    hd = d // H
    x = rng.randn(1, t, d).astype(np.float32) * 0.5
    pos_emb = np.asarray(E.sinusoidal_position_embedding(t, d))

    a = p.sub("layers_").sub("0").sub("attn_")
    ours = np.asarray(E.rel_position_attention(a, jnp.asarray(x), jnp.asarray(pos_emb), H))

    def lin(prefix, v, bias=True):
        w = np.asarray(a[prefix + ".weight"])
        out = v @ w.T
        if bias:
            out = out + np.asarray(a[prefix + ".bias"])
        return out

    q = lin("mha_.q_proj", x[0]).reshape(t, H, hd).transpose(1, 0, 2)
    k = lin("mha_.k_proj", x[0]).reshape(t, H, hd).transpose(1, 0, 2)
    v = lin("mha_.v_proj", x[0]).reshape(t, H, hd).transpose(1, 0, 2)
    u = np.asarray(a["pos_bias_u_"])  # (H, hd)
    vb = np.asarray(a["pos_bias_v_"])
    pproj = (pos_emb @ np.asarray(a["pos_proj_.weight"]).T).reshape(2 * t - 1, H, hd)

    scores = np.zeros((H, t, t), np.float32)
    for h in range(H):
        content = (q[h] + u[h]) @ k[h].T
        pos = np.zeros((t, t), np.float32)
        for ti in range(t):
            for s in range(t):
                row = (t - 1) - (ti - s)  # table row for rel position ti-s
                pos[ti, s] = (q[h, ti] + vb[h]) @ pproj[row, h]
        scores[h] = (content + pos) / np.sqrt(hd)
    att = np.exp(scores - scores.max(-1, keepdims=True))
    att /= att.sum(-1, keepdims=True)
    ctx = np.einsum("hts,hsd->htd", att, v).transpose(1, 0, 2).reshape(t, d)
    oracle = lin("mha_.out_proj", ctx)

    np.testing.assert_allclose(ours[0], oracle, rtol=1e-3, atol=1e-4)


def test_encoder_forward_shape_and_determinism(tiny):
    cfg, p = tiny
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 64, 80).astype(np.float32))
    y1 = E.fastconformer_encode(p, cfg, x)
    y2 = E.fastconformer_encode(p, cfg, x)
    assert y1.shape == (2, E.subsample_length(64), cfg.hidden_size)
    assert np.isfinite(np.asarray(y1)).all()
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))


def test_padded_batch_matches_unpadded(tiny):
    """A padded+masked batch entry must match the unpadded single-utterance
    encode except the last couple of frames (subsampling conv bleed at the
    pad boundary — inherent to NeMo-style batching too)."""
    cfg, p = tiny
    rng = np.random.RandomState(3)
    mel = rng.randn(1, 64, 80).astype(np.float32)

    solo = np.asarray(E.fastconformer_encode(p, cfg, jnp.asarray(mel)))[0]  # (8? , d)

    padded = np.zeros((1, 96, 80), np.float32)
    padded[:, :64] = mel
    lengths = jnp.asarray([64])
    batched = np.asarray(E.fastconformer_encode(p, cfg, jnp.asarray(padded), lengths))[0]

    t_valid = E.subsample_length(64)
    np.testing.assert_allclose(batched[: t_valid - 2], solo[: t_valid - 2], rtol=2e-3, atol=2e-4)


def test_xscaling_and_silu_config():
    cfg = C.StreamingEncoderConfig(
        mel_bins=80, subsampling_channels=8, hidden_size=16, num_layers=1,
        num_heads=2, ffn_intermediate=32, conv_kernel_size=9,
        subsampling_activation="silu", xscaling=True,
    )
    params = P.init_params(P.encoder_spec(cfg, "encoder_"), seed=4)
    p = Params(params).sub("encoder_")
    x = jnp.asarray(np.random.RandomState(5).randn(1, 32, 80).astype(np.float32))
    y = E.fastconformer_encode(p, cfg, x)
    assert y.shape == (1, E.subsample_length(32), 16)
    assert np.isfinite(np.asarray(y)).all()

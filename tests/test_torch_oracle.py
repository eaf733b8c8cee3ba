"""Cross-framework full-encoder oracle: an independent PyTorch rebuild of
the FastConformer pipeline from the SAME flat param dict, mirroring the
reference's tier-3 parity strategy (compare_encoder.py rebuilds the model
in PyTorch from the same safetensors and diffs stage by stage).

This is the strongest parity evidence available without real weights: two
implementations in two frameworks, one weight schema, equal outputs. The
torch side uses torch.nn layers directly (Conv2d/Conv1d/Linear/LayerNorm/
BatchNorm1d), NOT a port of our JAX code, so a shared mistake is unlikely.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as TF  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from parakeet_tpu import config as C  # noqa: E402
from parakeet_tpu import params as P  # noqa: E402
from parakeet_tpu.models import encoder as E  # noqa: E402
from parakeet_tpu.models.ctc import ctc_log_probs  # noqa: E402
from parakeet_tpu.params import Params  # noqa: E402

torch.manual_seed(0)


def tiny_cfg():
    return C.EncoderConfig(
        mel_bins=80, subsampling_channels=8, hidden_size=32, num_layers=2,
        num_heads=4, ffn_intermediate=64, conv_kernel_size=9,
    )


def t(params, key):
    return torch.from_numpy(np.asarray(params[key], np.float32))


def torch_subsampling(params, x, prefix="encoder_.subsampling_"):
    """x: (B, T, mel) → (B, T/8, d). NCHW torch convs, channel-major flatten
    (encoder.cpp:208-241; ReLU per the code, not the header comment)."""
    h = x.unsqueeze(1)  # (B, 1, T, mel)
    c = t(params, f"{prefix}.conv1_.weight").shape[0]
    h = TF.relu(TF.conv2d(h, t(params, f"{prefix}.conv1_.weight"),
                          t(params, f"{prefix}.conv1_.bias"), stride=2, padding=1))
    h = TF.conv2d(h, t(params, f"{prefix}.dw1_.weight"),
                  t(params, f"{prefix}.dw1_.bias"), stride=2, padding=1, groups=c)
    h = TF.relu(TF.conv2d(h, t(params, f"{prefix}.conv2_.weight"),
                          t(params, f"{prefix}.conv2_.bias")))
    h = TF.conv2d(h, t(params, f"{prefix}.dw2_.weight"),
                  t(params, f"{prefix}.dw2_.bias"), stride=2, padding=1, groups=c)
    h = TF.relu(TF.conv2d(h, t(params, f"{prefix}.conv3_.weight"),
                          t(params, f"{prefix}.conv3_.bias")))
    b, ch, tt, f = h.shape
    h = h.permute(0, 2, 1, 3).reshape(b, tt, ch * f)  # channel-major
    return TF.linear(h, t(params, f"{prefix}.proj_.weight"), t(params, f"{prefix}.proj_.bias"))


def torch_rel_shift(x):
    """(B, H, T, 2T-1) → (B, H, T, T) pad-reshape trick (encoder.cpp:85-109)."""
    b, h, tt, pos = x.shape
    x = TF.pad(x, (1, 0))
    x = x.reshape(b, h, pos + 1, tt)[:, :, 1:, :].reshape(b, h, tt, pos)
    return x[:, :, :, :tt]


def torch_attention(params, x, pos_emb, heads, a):
    b, tt, d = x.shape
    hd = d // heads
    q = TF.linear(x, t(params, f"{a}.mha_.q_proj.weight"), t(params, f"{a}.mha_.q_proj.bias"))
    k = TF.linear(x, t(params, f"{a}.mha_.k_proj.weight"), t(params, f"{a}.mha_.k_proj.bias"))
    v = TF.linear(x, t(params, f"{a}.mha_.v_proj.weight"), t(params, f"{a}.mha_.v_proj.bias"))
    q = q.view(b, tt, heads, hd).transpose(1, 2)
    k = k.view(b, tt, heads, hd).transpose(1, 2)
    v = v.view(b, tt, heads, hd).transpose(1, 2)
    u = t(params, f"{a}.pos_bias_u_")[None, :, None, :]
    vb = t(params, f"{a}.pos_bias_v_")[None, :, None, :]
    p = TF.linear(pos_emb, t(params, f"{a}.pos_proj_.weight"))  # bias-free
    p = p.view(-1, heads, hd).transpose(0, 1)  # (H, 2T-1, hd)
    content = (q + u) @ k.transpose(-2, -1)
    pos_score = torch.einsum("bhtd,hsd->bhts", q + vb, p)
    scores = (content + torch_rel_shift(pos_score)) / np.sqrt(hd)  # scale AFTER sum
    attn = TF.softmax(scores, dim=-1)
    out = (attn @ v).transpose(1, 2).reshape(b, tt, d)
    return TF.linear(out, t(params, f"{a}.mha_.out_proj.weight"), t(params, f"{a}.mha_.out_proj.bias"))


def torch_ffn(params, x, a):
    h = TF.layer_norm(x, (x.shape[-1],), t(params, f"{a}.norm_.weight"), t(params, f"{a}.norm_.bias"))
    h = TF.silu(TF.linear(h, t(params, f"{a}.fc1_.weight"), t(params, f"{a}.fc1_.bias")))
    h = TF.linear(h, t(params, f"{a}.fc2_.weight"), t(params, f"{a}.fc2_.bias"))
    return x + 0.5 * h


def torch_conv_module(params, x, kernel, a):
    d = x.shape[-1]
    h = TF.layer_norm(x, (d,), t(params, f"{a}.norm_.weight"), t(params, f"{a}.norm_.bias"))
    h = h.transpose(1, 2)  # (B, d, T)
    h = TF.conv1d(h, t(params, f"{a}.pointwise_conv1_.weight"), t(params, f"{a}.pointwise_conv1_.bias"))
    h = TF.glu(h, dim=1)
    h = TF.conv1d(h, t(params, f"{a}.depthwise_conv_.weight"), t(params, f"{a}.depthwise_conv_.bias"),
                  padding=(kernel - 1) // 2, groups=d)
    h = TF.batch_norm(h, t(params, f"{a}.batch_norm_.running_mean"),
                      t(params, f"{a}.batch_norm_.running_var"),
                      t(params, f"{a}.batch_norm_.weight"), t(params, f"{a}.batch_norm_.bias"),
                      training=False, eps=1e-5)
    h = TF.silu(h)
    h = TF.conv1d(h, t(params, f"{a}.pointwise_conv2_.weight"), t(params, f"{a}.pointwise_conv2_.bias"))
    return x + h.transpose(1, 2)


def torch_encoder(params, cfg, x):
    h = torch_subsampling(params, x)
    pos = torch.from_numpy(np.asarray(E.sinusoidal_position_embedding(h.shape[1], cfg.hidden_size)))
    for i in range(cfg.num_layers):
        a = f"encoder_.layers_.{i}"
        h = torch_ffn(params, h, f"{a}.ffn1_")
        attn_in = TF.layer_norm(h, (cfg.hidden_size,), t(params, f"{a}.attn_.norm_.weight"),
                                t(params, f"{a}.attn_.norm_.bias"))
        h = h + torch_attention(params, attn_in, pos, cfg.num_heads, f"{a}.attn_")
        h = torch_conv_module(params, h, cfg.conv_kernel_size, f"{a}.conv_")
        h = torch_ffn(params, h, f"{a}.ffn2_")
        h = TF.layer_norm(h, (cfg.hidden_size,), t(params, f"{a}.final_norm_.weight"),
                          t(params, f"{a}.final_norm_.bias"))
    return h


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_cfg()
    spec = P.encoder_spec(cfg, "encoder_")
    spec.update(P.ctc_spec(11, cfg.hidden_size))
    params = P.init_params(spec, seed=42)
    rng = np.random.RandomState(1)
    feats = rng.randn(2, 64, 80).astype(np.float32) * 0.5
    return cfg, params, feats


def test_subsampling_matches_torch(setup):
    cfg, params, feats = setup
    ours = np.asarray(E.conv_subsampling(Params(params).sub("encoder_").sub("subsampling_"),
                                         jnp.asarray(feats)))
    with torch.no_grad():
        ref = torch_subsampling(params, torch.from_numpy(feats)).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_full_encoder_matches_torch(setup):
    """Two independent implementations (JAX feature-minor vs torch NCHW/NCT),
    one weight schema → equal encoder outputs."""
    cfg, params, feats = setup
    ours = np.asarray(E.fastconformer_encode(Params(params).sub("encoder_"), cfg,
                                             jnp.asarray(feats)))
    with torch.no_grad():
        ref = torch_encoder(params, cfg, torch.from_numpy(feats)).numpy()
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)


def test_ctc_log_probs_match_torch(setup):
    cfg, params, feats = setup
    enc = E.fastconformer_encode(Params(params).sub("encoder_"), cfg, jnp.asarray(feats))
    ours = np.asarray(ctc_log_probs(Params(params).sub("ctc_decoder_"), enc))
    with torch.no_grad():
        enc_t = torch.from_numpy(np.asarray(enc))
        h = TF.conv1d(enc_t.transpose(1, 2), t(params, "ctc_decoder_.proj_.weight"),
                      t(params, "ctc_decoder_.proj_.bias")).transpose(1, 2)
        ref = TF.log_softmax(h, dim=-1).numpy()
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)

"""Independent PyTorch rebuild of the FastConformer encoder from the SAME
flat param dict — the cross-framework parity/benchmark reference.

This mirrors the C++ reference's tier-3 parity strategy: its
`scripts/compare_encoder.py:23-354` rebuilds the model in PyTorch from the
same safetensors and diffs stage by stage, and its
`scripts/pytorch_benchmark.py:51-189` times the PyTorch encoder for
cross-engine comparison. Here the torch side uses torch.nn.functional
layers directly (NCHW convs, NCT conv1d), NOT a port of our JAX code, so a
shared mistake between the two implementations is unlikely.

Consumers: tests/test_torch_oracle.py (numeric parity gate) and
scripts/pytorch_benchmark.py (torch-CPU timing baseline).

torch is an optional import at call time — the JAX package never needs it.
"""

from __future__ import annotations

import numpy as np


def _torch():
    import torch  # noqa: PLC0415 — optional heavy dep, imported on use

    return torch


def t(params, key):
    torch = _torch()
    v = params[key]
    if isinstance(v, torch.Tensor):
        return v
    return torch.from_numpy(np.array(v, np.float32))


def to_torch_params(params):
    """Pre-convert a flat param dict to torch tensors once — keeps weight
    conversion out of timed benchmark loops (t() passes tensors through)."""
    torch = _torch()
    return {k: torch.from_numpy(np.array(v, np.float32)) for k, v in params.items()}


def torch_subsampling(params, x, prefix="encoder_.subsampling_", activation="relu",
                      return_stages=False):
    """x: (B, T, mel) → (B, T/8, d). NCHW torch convs, channel-major flatten
    (reference encoder.cpp:208-241; ReLU per the code, not the header
    comment). activation: "relu"|"silu" — the streaming/NEST variant's
    selectable activation (streaming_encoder.cpp:325-346).

    return_stages: also return the named conv intermediates in the
    reference's NCHW debug-dump layout (compare_encoder.py:110-113 stage
    names) — consumed by scripts/acceptance.py to fabricate
    reference-format dumps from an independent implementation."""
    import torch.nn.functional as TF

    act = TF.relu if activation == "relu" else TF.silu
    h = x.unsqueeze(1)  # (B, 1, T, mel)
    c = t(params, f"{prefix}.conv1_.weight").shape[0]
    h = act(TF.conv2d(h, t(params, f"{prefix}.conv1_.weight"),
                      t(params, f"{prefix}.conv1_.bias"), stride=2, padding=1))
    after_conv1 = h
    h = TF.conv2d(h, t(params, f"{prefix}.dw1_.weight"),
                  t(params, f"{prefix}.dw1_.bias"), stride=2, padding=1, groups=c)
    h = act(TF.conv2d(h, t(params, f"{prefix}.conv2_.weight"),
                      t(params, f"{prefix}.conv2_.bias")))
    after_block1 = h
    h = TF.conv2d(h, t(params, f"{prefix}.dw2_.weight"),
                  t(params, f"{prefix}.dw2_.bias"), stride=2, padding=1, groups=c)
    h = act(TF.conv2d(h, t(params, f"{prefix}.conv3_.weight"),
                      t(params, f"{prefix}.conv3_.bias")))
    after_block2 = h
    b, ch, tt, f = h.shape
    h = h.permute(0, 2, 1, 3).reshape(b, tt, ch * f)  # channel-major
    out = TF.linear(h, t(params, f"{prefix}.proj_.weight"), t(params, f"{prefix}.proj_.bias"))
    if return_stages:
        return out, {
            "after_conv1": after_conv1,   # (B, C, T/2, F/2) NCHW — ref dump order
            "after_block1": after_block1,
            "after_block2": after_block2,
        }
    return out


def torch_rel_shift(x):
    """(B, H, T, 2T-1) → (B, H, T, T) pad-reshape trick (encoder.cpp:85-109)."""
    import torch.nn.functional as TF

    b, h, tt, pos = x.shape
    x = TF.pad(x, (1, 0))
    x = x.reshape(b, h, pos + 1, tt)[:, :, 1:, :].reshape(b, h, tt, pos)
    return x[:, :, :, :tt]


def torch_attention(params, x, pos_emb, heads, a):
    """Rel-pos MHSA (encoder.cpp:79-186): content (Q+u)Kᵀ + shifted pos
    (Q+v)Pᵀ, scale AFTER the sum."""
    torch = _torch()
    import torch.nn.functional as TF

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
    scores = (content + torch_rel_shift(pos_score)) / np.sqrt(hd)
    attn = TF.softmax(scores, dim=-1)
    out = (attn @ v).transpose(1, 2).reshape(b, tt, d)
    return TF.linear(out, t(params, f"{a}.mha_.out_proj.weight"), t(params, f"{a}.mha_.out_proj.bias"))


def torch_ffn(params, x, a):
    """Macaron FFN with 0.5 half-step residual (encoder.cpp:34-46)."""
    import torch.nn.functional as TF

    h = TF.layer_norm(x, (x.shape[-1],), t(params, f"{a}.norm_.weight"), t(params, f"{a}.norm_.bias"))
    h = TF.silu(TF.linear(h, t(params, f"{a}.fc1_.weight"), t(params, f"{a}.fc1_.bias")))
    h = TF.linear(h, t(params, f"{a}.fc2_.weight"), t(params, f"{a}.fc2_.bias"))
    return x + 0.5 * h


def torch_conv_module(params, x, kernel, a):
    """Pointwise→GLU→depthwise→inference-BN→SiLU→pointwise (encoder.cpp:50-75)."""
    import torch.nn.functional as TF

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


def torch_encoder(params, cfg, x, prefix="encoder_"):
    """Full FastConformer forward (encoder.cpp:245-271) on torch tensors.
    A StreamingEncoderConfig engages the full-seq streaming-encoder path
    (streaming_encoder.cpp:389-427): selectable subsampling activation and
    the optional ·sqrt(d_model) xscaling — i.e. this also oracles the
    Sortformer NEST encoder."""
    torch = _torch()
    import math

    import torch.nn.functional as TF

    from parakeet_tpu.models import encoder as E

    h = torch_subsampling(
        params, x, prefix=f"{prefix}.subsampling_",
        activation=getattr(cfg, "subsampling_activation", "relu"),
    )
    if getattr(cfg, "xscaling", False):
        h = h * math.sqrt(cfg.hidden_size)
    pos = torch.from_numpy(np.asarray(E.sinusoidal_position_embedding(h.shape[1], cfg.hidden_size)))
    for i in range(cfg.num_layers):
        a = f"{prefix}.layers_.{i}"
        h = torch_ffn(params, h, f"{a}.ffn1_")
        attn_in = TF.layer_norm(h, (cfg.hidden_size,), t(params, f"{a}.attn_.norm_.weight"),
                                t(params, f"{a}.attn_.norm_.bias"))
        h = h + torch_attention(params, attn_in, pos, cfg.num_heads, f"{a}.attn_")
        h = torch_conv_module(params, h, cfg.conv_kernel_size, f"{a}.conv_")
        h = torch_ffn(params, h, f"{a}.ffn2_")
        h = TF.layer_norm(h, (cfg.hidden_size,), t(params, f"{a}.final_norm_.weight"),
                          t(params, f"{a}.final_norm_.bias"))
    return h


# ─── Transducer side (prediction LSTM + joint + scalar greedy decode) ────────
#
# Extends the oracle through the TDT/RNNT decode to TEXT, matching the
# reference parity bar (compare_encoder.py:23-354 runs to transcript). The
# LSTM is torch.nn.LSTM itself (cuDNN-layout weights, NOT a port of
# ops/lstm.py); the greedy loop is a SCALAR per-utterance state machine
# written from the reference semantics (tdt.cpp:36-210, rnnt.cpp:56-177)
# plus the repo's one documented deviation (forced t+=1 on the max_symbols
# livelock corner — decode/transducer.py module doc).


def torch_prediction_lstm(params, prefix="prediction_"):
    """Build a torch.nn.LSTM from the schema weights. input_proj_ carries
    the merged NeMo bias (convert_nemo.py:409-417) → bias_ih; bias_hh = 0."""
    torch = _torch()

    n = 0
    while f"{prefix}.lstm_.cells_.{n}.input_proj_.weight" in params:
        n += 1
    w0 = t(params, f"{prefix}.lstm_.cells_.0.input_proj_.weight")
    hidden = w0.shape[0] // 4
    lstm = torch.nn.LSTM(w0.shape[1], hidden, num_layers=n, batch_first=True)
    sd = {}
    for i in range(n):
        cell = f"{prefix}.lstm_.cells_.{i}"
        sd[f"weight_ih_l{i}"] = t(params, f"{cell}.input_proj_.weight")
        sd[f"weight_hh_l{i}"] = t(params, f"{cell}.hidden_proj_.weight")
        sd[f"bias_ih_l{i}"] = t(params, f"{cell}.input_proj_.bias")
        sd[f"bias_hh_l{i}"] = torch.zeros(4 * hidden)
    lstm.load_state_dict(sd)
    lstm.eval()
    return lstm, n, hidden


def torch_joint(params, enc_t, pred, joint_prefix, is_tdt):
    """One joint evaluation: (label_log_probs, duration_log_probs | None).
    enc_proj has a bias; pred_proj is bias-free (rnnt.cpp:33)."""
    import torch.nn.functional as TF

    j = joint_prefix
    hidden = TF.relu(
        TF.linear(enc_t, t(params, f"{j}.enc_proj_.weight"), t(params, f"{j}.enc_proj_.bias"))
        + TF.linear(pred, t(params, f"{j}.pred_proj_.weight"))
    )
    if is_tdt:
        label = TF.log_softmax(
            TF.linear(hidden, t(params, f"{j}.label_proj_.weight"), t(params, f"{j}.label_proj_.bias")),
            dim=-1,
        )
        dur = TF.log_softmax(
            TF.linear(hidden, t(params, f"{j}.duration_proj_.weight"), t(params, f"{j}.duration_proj_.bias")),
            dim=-1,
        )
        return label, dur
    label = TF.log_softmax(
        TF.linear(hidden, t(params, f"{j}.out_proj_.weight"), t(params, f"{j}.out_proj_.bias")),
        dim=-1,
    )
    return label, None


def torch_transducer_greedy_decode(
    params,
    enc,  # (T, enc_hidden) torch tensor — ONE utterance
    *,
    durations=(0, 1, 2, 3, 4),
    blank_id,
    max_symbols=10,
    joint_prefix="tdt_joint_",
    is_tdt=True,
    clamp_end=True,
):
    """Scalar TDT/RNNT greedy decode to (tokens, [(tok, start, end, conf)]).

    Reference semantics (tdt.cpp:36-118 / :122-210, rnnt.cpp:56-177):
    SOS = blank; blank → restore saved LSTM state, t += max(skip, 1);
    non-blank → emit + feed back, t += skip if skip > 0 else another symbol
    on the same frame capped at max_symbols (forced t += 1 at the cap —
    the repo's documented livelock deviation); timestamps end_frame =
    t + max(skip, 1) - 1, clamped to len-1; confidence = exp(label lp).
    RNNT ≡ durations=(0,)."""
    torch = _torch()

    lstm, n_layers, hidden = torch_prediction_lstm(params)
    emb = t(params, "prediction_.embed_.weight")
    tt_len = enc.shape[0]
    with torch.no_grad():
        h = torch.zeros(n_layers, 1, hidden)
        c = torch.zeros(n_layers, 1, hidden)
        last = blank_id
        tokens: list[int] = []
        ts: list[tuple[int, int, int, float]] = []
        tpos = 0
        sym = 0
        while tpos < tt_len:
            out, (h2, c2) = lstm(emb[last][None, None, :], (h, c))
            pred = out[0, 0]
            label_lp, dur_lp = torch_joint(params, enc[tpos], pred, joint_prefix, is_tdt)
            tok = int(torch.argmax(label_lp).item())
            if is_tdt:
                dur_idx = int(torch.argmax(dur_lp).item())
                skip = int(durations[dur_idx])
            else:
                skip = 0
            if tok == blank_id:
                # blank: LSTM state NOT committed (h/c unchanged)
                tpos += max(skip, 1)
                sym = 0
                continue
            h, c = h2, c2
            last = tok
            tokens.append(tok)
            end = tpos + max(skip, 1) - 1
            if clamp_end:
                end = min(end, tt_len - 1)
            ts.append((tok, tpos, end, float(torch.exp(label_lp[tok]).item())))
            if skip > 0:
                tpos += skip
                sym = 0
            elif sym + 1 >= max_symbols:
                tpos += 1  # forced advance (documented livelock deviation)
                sym = 0
            else:
                sym += 1
    return tokens, ts


def torch_sortformer_tail(params, cfg, enc):
    """Sortformer tail (projection → post-norm transformer → speaker head)
    rebuilt on torch.nn.TransformerEncoderLayer — torch's OWN post-norm
    block implementation (self-attn → add → norm1 → ReLU-FFN → add →
    norm2), not a port of models/transformer.py, so a shared mistake is
    unlikely. Reference: sortformer.cpp:50-68 (forward chain),
    transformer.cpp:9-88 (post-norm blocks).

    enc: (B, T, encoder_hidden) NEST-encoder output → (B, T, max_speakers)
    sigmoid speaker probabilities.
    """
    torch = _torch()
    import torch.nn.functional as TF

    tc = cfg.transformer
    if tc.pre_ln:
        raise ValueError("oracle maps the post-norm (Sortformer) variant only")
    d = tc.hidden_size
    with torch.no_grad():
        x = torch.as_tensor(np.asarray(enc, np.float32))
        x = TF.linear(x, t(params, "projection_.weight"), t(params, "projection_.bias"))
        for i in range(tc.num_layers):
            a = f"transformer_.layers_.{i}"
            lay = torch.nn.TransformerEncoderLayer(
                d, tc.num_heads, dim_feedforward=tc.ffn_intermediate,
                dropout=0.0, activation="relu", batch_first=True,
                norm_first=False, layer_norm_eps=tc.layer_norm_eps,
            )
            lay.self_attn.in_proj_weight.copy_(torch.cat(
                [t(params, f"{a}.mha_.{p}.weight") for p in ("q_proj", "k_proj", "v_proj")]
            ))
            lay.self_attn.in_proj_bias.copy_(torch.cat(
                [t(params, f"{a}.mha_.{p}.bias") for p in ("q_proj", "k_proj", "v_proj")]
            ))
            lay.self_attn.out_proj.weight.copy_(t(params, f"{a}.mha_.out_proj.weight"))
            lay.self_attn.out_proj.bias.copy_(t(params, f"{a}.mha_.out_proj.bias"))
            lay.linear1.weight.copy_(t(params, f"{a}.fc1_.weight"))
            lay.linear1.bias.copy_(t(params, f"{a}.fc1_.bias"))
            lay.linear2.weight.copy_(t(params, f"{a}.fc2_.weight"))
            lay.linear2.bias.copy_(t(params, f"{a}.fc2_.bias"))
            lay.norm1.weight.copy_(t(params, f"{a}.norm1_.weight"))
            lay.norm1.bias.copy_(t(params, f"{a}.norm1_.bias"))
            lay.norm2.weight.copy_(t(params, f"{a}.norm2_.weight"))
            lay.norm2.bias.copy_(t(params, f"{a}.norm2_.bias"))
            lay.eval()
            x = lay(x)
        if tc.has_final_norm:
            x = TF.layer_norm(
                x, (d,), t(params, "transformer_.final_norm_.weight"),
                t(params, "transformer_.final_norm_.bias"), tc.layer_norm_eps,
            )
        h = TF.relu(x)
        h = TF.linear(h, t(params, "first_hidden_.weight"), t(params, "first_hidden_.bias"))
        h = TF.relu(h)
        h = TF.linear(h, t(params, "output_proj_.weight"), t(params, "output_proj_.bias"))
        return torch.sigmoid(h)


__all__ = [
    "t",
    "to_torch_params",
    "torch_subsampling",
    "torch_rel_shift",
    "torch_attention",
    "torch_ffn",
    "torch_conv_module",
    "torch_encoder",
    "torch_prediction_lstm",
    "torch_joint",
    "torch_transducer_greedy_decode",
    "torch_sortformer_tail",
]

"""FastConformer encoder, TPU-first.

Re-designs the reference encoder stack (src/encoder.cpp) as pure functions
over a `Params` view: ConvSubsampling (8×, ReLU — the code applies ReLU even
though the reference header comment says SiLU; encoder.cpp:224-232),
NeMo-style rel-pos MHSA with the pad-reshape rel_shift trick
(encoder.cpp:85-109), macaron FFN with 0.5 half-step (encoder.cpp:39-46),
conv module with inference BatchNorm (encoder.cpp:59-75), and the sinusoidal
relative position table (encoder.cpp:9-30).

Everything here traces into one XLA program per (batch, length) shape; the
whole block stack is MXU-friendly batched matmuls. Optional length masking
(absent in the reference, which always passes an empty mask) is provided for
padded batched inference — pad frames are masked out of attention.
"""

from __future__ import annotations

import functools
import math

import numpy as np
import jax
import jax.numpy as jnp

from parakeet_tpu.config import EncoderConfig
from parakeet_tpu.ops.layers import (
    conv2d_nhwc,
    glu,
    layer_norm,
    linear,
    matmul_precision,
)
from parakeet_tpu.params import Params

_F32 = jnp.float32


def _silu(x):
    # inline (x * sigmoid(x)): jax.nn.silu lowers via closed_call, which this
    # jax version fails to cache-lower when a pallas_call shares the jaxpr
    return x * jax.nn.sigmoid(x)
_NEG_INF = -1e9

# Fused Pallas attention (ops/pallas_attention.py). Off by default; enable
# with set_fused_attention(True) on TPU for the unmasked batched path.
# Modes: False/"off" = XLA path; True/"v1" = fused scores/shift/softmax/AV
# (grid (B,H), projections in XLA); "block" = additionally fuses the
# QKV/out projections (grid (B,), weights VMEM-resident).
_FUSED_ATTENTION: str | bool = False


def set_fused_attention(mode) -> None:
    global _FUSED_ATTENTION
    if mode in (False, "off", None):
        _FUSED_ATTENTION = False
    elif mode in (True, "v1"):
        _FUSED_ATTENTION = "v1"
    elif mode in ("block", "block2", "block4", "block8", "mega",
                  "bd2", "bd4", "bd8",
                  "blockhp", "block2hp", "block4hp", "block8hp"):
        # "blockN" = block kernel with N batch items per program (the
        # projection matmuls span N·TP rows — see fused_rel_attention_block
        # batch_block); "bdN" = blockN with the per-item content/AV matmuls
        # merged into single block-diagonal matmuls; "mega" = block kernel
        # with the macaron ffn1 fused in; the "hp" suffix packs head PAIRS
        # into the per-item content/AV matmuls (fills the 128-wide MXU tile
        # that hd=64 heads half-waste — see _attention_core headpair)
        _FUSED_ATTENTION = mode
    else:
        raise ValueError(f"unknown fused attention mode {mode!r}")


def _attn_batch_block() -> int:
    """NB for the blockN/bdN modes (1 for plain block/mega)."""
    if isinstance(_FUSED_ATTENTION, str) and _FUSED_ATTENTION.startswith("block"):
        n = _FUSED_ATTENTION[5:]
        if n.endswith("hp"):
            n = n[:-2]
        return int(n or 1)
    if isinstance(_FUSED_ATTENTION, str) and _FUSED_ATTENTION.startswith("bd"):
        return int(_FUSED_ATTENTION[2:])
    return 1


def _attn_blockdiag() -> bool:
    """True when the bdN (block-diagonal scores/AV) kernel variant is on."""
    return isinstance(_FUSED_ATTENTION, str) and _FUSED_ATTENTION.startswith("bd")


def _attn_headpair() -> bool:
    """True when the hp (head-pair-packed scores/AV) kernel variant is on."""
    return isinstance(_FUSED_ATTENTION, str) and _FUSED_ATTENTION.endswith("hp")


def get_fused_attention() -> str | bool:
    """Current process-global fused-attention mode (False = XLA path)."""
    return _FUSED_ATTENTION


# Score-tensor storage for the fused attention kernels: "f32" (default,
# matches the XLA path bit-for-bit through the softmax) or "bf16" (the
# VERDICT r4 #2 operating point: the (TP,TP)/(TP,2TP) score and softmax
# intermediates stay bfloat16 between MXU and VPU stages — ~1e-3 relative
# score noise, NOT bit-parity; see ops/pallas_attention._attention_core).
_SCORE_STORAGE = "f32"


def set_score_storage(mode: str) -> None:
    """"bf16" applies to the BLOCK fused-attention kernels; the 'v1' mode
    rejects it loudly (no silent f32 measurement), and a block mode whose
    shape guard falls back to v1/XLA runs f32 scores (the documented,
    more-precise fallback)."""
    global _SCORE_STORAGE
    if mode not in ("f32", "bf16"):
        raise ValueError(f"score storage must be 'f32' or 'bf16', got {mode!r}")
    _SCORE_STORAGE = mode


def get_score_storage() -> str:
    return _SCORE_STORAGE


def fused_kernels_active() -> bool:
    """True when ANY process-global fused-Pallas mode is on (attention,
    ffn, block2, conv layout). Callers that trace model code inside
    lax.scan/fori_loop check this — pallas_call inside a scan body crashes
    this jax version's lowering cache (see CLAUDE.md)."""
    return (
        bool(_FUSED_ATTENTION)
        or _FUSED_FFN
        or _FUSED_BLOCK2
        or _FUSED_SUBSAMPLE
        or _CONV_LAYOUT == "pallas"
    )


# ─── Sinusoidal relative position embedding (encoder.cpp:9-30) ──────────────


@functools.lru_cache(maxsize=64)
def _pos_emb_np(seq_len: int, d_model: int) -> np.ndarray:
    total = 2 * seq_len - 1
    position = (seq_len - 1 - np.arange(total, dtype=np.float64))[:, None]
    i = np.arange(0, d_model, 2, dtype=np.float64)
    div_term = np.exp(i * (-math.log(10000.0) / d_model))[None, :]
    pe = np.zeros((total, d_model), dtype=np.float64)
    pe[:, 0::2] = np.sin(position * div_term)
    pe[:, 1::2] = np.cos(position * div_term)[:, : pe[:, 1::2].shape[1]]
    return pe.astype(np.float32)


def sinusoidal_position_embedding(seq_len: int, d_model: int) -> jnp.ndarray:
    """(2*seq_len-1, d_model): relative positions +(L-1) … -(L-1)."""
    return jnp.asarray(_pos_emb_np(seq_len, d_model))


# ─── Subsampling ─────────────────────────────────────────────────────────────


def subsample_length(t: int) -> int:
    """Output frames after three k3/s2/p1 convs."""
    for _ in range(3):
        t = (t - 1) // 2 + 1
    return t


def conv_subsampling_stages(
    p: Params, x: jnp.ndarray, activation: str = "relu"
) -> dict[str, jnp.ndarray]:
    """conv_subsampling with named intermediates for the cross-implementation
    parity bridge (scripts/dump_stages.py). Stage names follow the reference
    parity scripts (compare_encoder.py:110-113): after_conv1 = first
    conv+act, after_block1 = dw1+pointwise+act, after_block2 =
    dw2+pointwise+act. Conv stages are NHWC (our layout); the bridge
    transposes to the reference's NCHW dump order."""
    act = jax.nn.relu if activation == "relu" else _silu
    c = p["conv1_.weight"].shape[0]

    h = x[:, :, :, None]  # (B, T, mel, 1) NHWC
    h = act(conv2d_nhwc(p.sub("conv1_"), h, stride=(2, 2), padding=(1, 1)))
    after_conv1 = h
    h = conv2d_nhwc(p.sub("dw1_"), h, stride=(2, 2), padding=(1, 1), groups=c)
    h = act(conv2d_nhwc(p.sub("conv2_"), h))
    after_block1 = h
    h = conv2d_nhwc(p.sub("dw2_"), h, stride=(2, 2), padding=(1, 1), groups=c)
    h = act(conv2d_nhwc(p.sub("conv3_"), h))
    after_block2 = h

    b, t, f, ch = h.shape
    h = jnp.transpose(h, (0, 1, 3, 2)).reshape(b, t, ch * f)
    return {
        "after_conv1": after_conv1,
        "after_block1": after_block1,
        "after_block2": after_block2,
        "subsampling_out": linear(p.sub("proj_"), h),
    }


# Fused conv1→dw1→conv2 front kernel (ops/pallas_subsample.py) — kills the
# ~1.3 GB conv1 HBM intermediate at bench batch (TUNING.md r3/r4).
_FUSED_SUBSAMPLE = False


def set_fused_subsample(enabled: bool) -> None:
    global _FUSED_SUBSAMPLE
    _FUSED_SUBSAMPLE = bool(enabled)


_SUBSAMPLE_T4_TILE = 32


def _subsample_fusable(p: Params, x: jnp.ndarray) -> bool:
    """Offline-sized inputs only (streaming chunks fall back to XLA), float
    weights (the quantize include= filter can in principle hit these),
    even F2 (mel 80/128 presets)."""
    stage2 = ((x.shape[1] - 1) // 2) // 2 + 1  # frames after conv1+dw1
    if stage2 < _SUBSAMPLE_T4_TILE:
        return False
    f2 = (x.shape[2] - 1) // 2 + 1
    if f2 % 2:
        return False
    return not any(
        jnp.issubdtype(p[k].dtype, jnp.integer)
        for k in ("conv1_.weight", "dw1_.weight", "conv2_.weight")
    )


def conv_subsampling(p: Params, x: jnp.ndarray, activation: str = "relu") -> jnp.ndarray:
    """(B, T, mel) → (B, T/8, d_model). Reference: encoder.cpp:208-241,
    streaming variant with selectable activation streaming_encoder.cpp:325-346.

    Runs in NHWC (TPU-preferred conv layout; 18% faster than NCHW here,
    identical numerics). Flatten stays channel-major (C*F), matching the
    reference's (B, T/8, C·F/8) layout. With set_fused_subsample(True) the
    first three convs run as one Pallas kernel (VMEM-resident conv1
    intermediate); dw2+conv3+proj stay XLA either way."""
    if _FUSED_SUBSAMPLE and _subsample_fusable(p, x):
        from parakeet_tpu.ops.pallas_subsample import fused_subsample_block1

        h = fused_subsample_block1(
            x,
            p["conv1_.weight"], p["conv1_.bias"],
            p["dw1_.weight"], p["dw1_.bias"],
            p["conv2_.weight"], p["conv2_.bias"],
            activation=activation, t4_tile=_SUBSAMPLE_T4_TILE,
        )
        act = jax.nn.relu if activation == "relu" else _silu
        c = p["conv1_.weight"].shape[0]
        h = conv2d_nhwc(p.sub("dw2_"), h, stride=(2, 2), padding=(1, 1), groups=c)
        h = act(conv2d_nhwc(p.sub("conv3_"), h))
        b, t, f, ch = h.shape
        h = jnp.transpose(h, (0, 1, 3, 2)).reshape(b, t, ch * f)
        return linear(p.sub("proj_"), h)
    return conv_subsampling_stages(p, x, activation)["subsampling_out"]


# ─── Conformer block pieces ──────────────────────────────────────────────────


# Fused macaron-FFN Pallas kernel (ops/pallas_ffn.py); opt-in like the
# other kernels. When on, the block's final LayerNorm fuses into ffn2.
_FUSED_FFN = False


def set_fused_ffn(enabled: bool) -> None:
    global _FUSED_FFN
    _FUSED_FFN = bool(enabled)


# Fused conv+ffn2+final-norm second-half kernel (ops/pallas_block.py).
_FUSED_BLOCK2 = False


def set_fused_block2(enabled: bool) -> None:
    global _FUSED_BLOCK2
    _FUSED_BLOCK2 = bool(enabled)


def _ffn_fusable(p: Params, x: jnp.ndarray) -> bool:
    """Kernel guard: the chunk must be long enough that padding T to 128
    lanes isn't waste (streaming chunks are 2-20 frames), and both FFN
    weight matrices must fit VMEM alongside activations (600m's 1024x4096
    pair is 16 MB bf16 — too big)."""
    if x.shape[1] < 64:
        return False
    w1 = p["fc1_.weight"]
    # the kernel consumes BOTH weight matrices — partial quantization
    # (quantize_params include=/exclude=) can quantize either independently
    if jnp.issubdtype(w1.dtype, jnp.integer) or jnp.issubdtype(
        p["fc2_.weight"].dtype, jnp.integer
    ):
        return False  # int8/int4 weights decode via the XLA linear path
    return 2 * w1.size * w1.dtype.itemsize <= 8 * 1024 * 1024


def feed_forward(p: Params, x: jnp.ndarray, eps: float, xla_only: bool = False) -> jnp.ndarray:
    """Macaron FFN with 0.5 half-step residual (encoder.cpp:39-46).
    xla_only: never dispatch the Pallas kernel (see conformer_block)."""
    if not xla_only and _FUSED_FFN and _ffn_fusable(p, x):
        return _feed_forward_fused(p, x, eps)
    h = layer_norm(p.sub("norm_"), x, eps)
    h = _silu(linear(p.sub("fc1_"), h))
    h = linear(p.sub("fc2_"), h)
    return x + 0.5 * h


def _feed_forward_fused(p: Params, x: jnp.ndarray, eps: float, final: Params | None = None):
    from parakeet_tpu.ops.pallas_ffn import fused_feed_forward

    kw = {}
    if final is not None:
        kw = dict(final_norm_w=final["weight"], final_norm_b=final["bias"])
    return fused_feed_forward(
        x,
        p["norm_.weight"], p["norm_.bias"],
        p["fc1_.weight"], p["fc1_.bias"],
        p["fc2_.weight"], p["fc2_.bias"],
        eps=eps, **kw,
    )


def _pointwise_as_matmul(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """k=1 Conv1d over feature-minor (B, T, C) activations as one matmul.
    Weight: torch Conv1d layout (C_out, C_in, 1)."""
    w = p["weight"][:, :, 0]  # (C_out, C_in)
    y = jax.lax.dot_general(
        x, w, (((2,), (1,)), ((), ())),
        preferred_element_type=_F32, precision=matmul_precision(x.dtype),
    )
    b = p.get("bias")
    if b is not None:
        y = y + b.astype(_F32)
    return y.astype(x.dtype)


# conv-module activation layout: "nhc" = feature-minor (pointwise convs as
# matmuls, NHC depthwise), "nch" = r1's transpose-convolve-transpose,
# "pallas" = single fused VMEM kernel (ops/pallas_conv.py).
_CONV_LAYOUT = "nch"


def set_conv_layout(layout: str) -> None:
    global _CONV_LAYOUT
    assert layout in ("nhc", "nch", "pallas"), layout
    _CONV_LAYOUT = layout


def conv_module(
    p: Params,
    x: jnp.ndarray,
    kernel_size: int,
    eps: float,
    pad_mask: jnp.ndarray | None = None,
    xla_only: bool = False,
) -> jnp.ndarray:
    """Pointwise→GLU→depthwise→BN(inference)→SiLU→pointwise, residual
    (encoder.cpp:59-75).

    Two equivalent layouts (set_conv_layout): "nhc" keeps activations
    feature-minor (pointwise convs as matmuls, depthwise in NHC, BN on the
    minor axis); "nch" is the reference-shaped (B, C, T)
    permute-convolve-permute. Numerics match (torch-oracle pinned); which
    is faster is backend-dependent — measured per TUNING.md.

    pad_mask: optional (B, T) bool, True = padding. Padded positions are
    zero-filled before the depthwise conv (NeMo batching semantics) so pad
    garbage can't bleed into valid frames. The reference is batch-1 and
    never pads, so this is a no-op on its path.
    xla_only: never dispatch the Pallas layout (see conformer_block)."""
    d = x.shape[-1]
    if _CONV_LAYOUT == "pallas" and not xla_only:
        from parakeet_tpu.ops.pallas_conv import fused_conv_module

        lengths = None
        if pad_mask is not None:
            lengths = (~pad_mask).sum(axis=1).astype(jnp.int32)
        return fused_conv_module(
            x,
            p["norm_.weight"], p["norm_.bias"],
            p["pointwise_conv1_.weight"], p["pointwise_conv1_.bias"],
            p["depthwise_conv_.weight"], p["depthwise_conv_.bias"],
            p["batch_norm_.weight"], p["batch_norm_.bias"],
            p["batch_norm_.running_mean"], p["batch_norm_.running_var"],
            p["pointwise_conv2_.weight"], p["pointwise_conv2_.bias"],
            lengths=lengths, eps=eps,
        )
    if _CONV_LAYOUT == "nch":
        from parakeet_tpu.ops.layers import batch_norm_1d, conv1d

        h = layer_norm(p.sub("norm_"), x, eps)
        h = jnp.swapaxes(h, 1, 2)  # (B, d, T)
        h = conv1d(p.sub("pointwise_conv1_"), h)
        h = glu(h, axis=1)
        if pad_mask is not None:
            h = jnp.where(pad_mask[:, None, :], 0.0, h)
        h = conv1d(p.sub("depthwise_conv_"), h, padding=(kernel_size - 1) // 2, groups=d)
        h = batch_norm_1d(p.sub("batch_norm_"), h)
        h = _silu(h)
        h = conv1d(p.sub("pointwise_conv2_"), h)
        return x + jnp.swapaxes(h, 1, 2)
    h = layer_norm(p.sub("norm_"), x, eps)
    h = _pointwise_as_matmul(p.sub("pointwise_conv1_"), h)  # (B, T, 2d)
    h = glu(h, axis=-1)
    if pad_mask is not None:
        h = jnp.where(pad_mask[:, :, None], 0.0, h)
    # depthwise conv over time, feature-minor: rhs (k, 1, d) "HIO"
    wd = jnp.transpose(p["depthwise_conv_.weight"], (2, 1, 0))
    pad = (kernel_size - 1) // 2
    from parakeet_tpu.ops.layers import conv_pref

    y = jax.lax.conv_general_dilated(
        h, wd, window_strides=(1,), padding=[(pad, pad)],
        dimension_numbers=("NHC", "HIO", "NHC"), feature_group_count=d,
        preferred_element_type=conv_pref(h), precision=matmul_precision(h.dtype),
    )
    bd = p.get("depthwise_conv_.bias")
    if bd is not None:
        y = y + bd.astype(y.dtype)
    h = y  # (B, T, d); f32 at inference, bf16 when conv accumulation is off
    bn = p.sub("batch_norm_")
    mean = bn["running_mean"].astype(_F32)
    var = bn["running_var"].astype(_F32)
    # torch BatchNorm1d default eps (matches batch_norm_1d / the reference)
    h = (h - mean) * jax.lax.rsqrt(var + 1e-5) * bn["weight"].astype(_F32) + bn["bias"].astype(_F32)
    h = h.astype(x.dtype)
    h = _silu(h)
    h = _pointwise_as_matmul(p.sub("pointwise_conv2_"), h)
    return x + h


def rel_shift(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, T, 2T-1) → (B, H, T, T) via the pad-reshape trick
    (encoder.cpp:85-109)."""
    b, h, t, pos_len = x.shape
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (1, 0)))
    x = x.reshape(b, h, pos_len + 1, t)
    x = x[:, :, 1:, :]
    x = x.reshape(b, h, t, pos_len)
    return x[:, :, :, :t]


def _split_heads(x: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    b, t, d = x.shape
    return jnp.transpose(x.reshape(b, t, num_heads, d // num_heads), (0, 2, 1, 3))


def _attn_block_fusable(p: Params, x: jnp.ndarray, nb: int | None = None) -> bool:
    """VMEM guard for the block/mega attention kernels: the per-program live
    set (two (TP,TP) f32 score buffers, the (TP,D) f32 rotation product and
    accumulator) plus the resident weight blocks must fit. Verified fits:
    110m T=125 (~3.8 MB) and 600m T=125 (~12.7 MB); long offline clips
    (T' in the thousands) must fall back — a (3456,3456) f32 score buffer
    alone is ~47 MB."""
    # the kernel consumes all five projection matrices — guard each, since
    # partial quantization can int8 any subset independently
    if any(
        jnp.issubdtype(p[k].dtype, jnp.integer)
        for k in ("mha_.q_proj.weight", "mha_.k_proj.weight", "mha_.v_proj.weight",
                  "mha_.out_proj.weight", "pos_proj_.weight")
    ):
        return False  # int8/int4 weights decode via the XLA linear path
    t = x.shape[1]
    tp = -(-t // 128) * 128
    d = x.shape[-1]
    itemsize = x.dtype.itemsize
    if nb is None:
        nb = _attn_batch_block()
    weights = 5 * d * d * itemsize  # q/k/v/out/pos head blocks
    # batch-blocked rows scale the x/out blocks, qkv temporaries, and the
    # f32 AV scratch by NB; the per-item (TP,TP) score/exp buffers do not
    live = 2 * tp * tp * 4 + 3 * nb * tp * d * 4 + 2 * nb * tp * d * itemsize
    if nb > 1:
        # split-score path extras (_attention_core's nb>1 branch): the
        # shared (NB·TP, TP) f32 pos_all buffer plus the (NB·TP, D)
        # concatenated [ṽa|ṽb] position-matmul operand
        live += nb * tp * tp * 4 + nb * tp * d * itemsize
        if _attn_blockdiag():
            # (NB·TP, NB·TP) f32 score product + same-shape probs in
            # x.dtype + the cross-item iota/compare masks
            live += nb * nb * tp * tp * (8 + itemsize)
    if _attn_headpair():
        # hp extras: the pos weight pair blocks double to (H/2, 2hd, 2D)
        # (+d·d), pos_pair is (2·NB·TP, TP) vs pos_all's (NB·TP, TP)
        # (+nb·tp·tp f32), plus the per-(item,pair) kv/v packs and the
        # (TP, 2TP) packed content scores
        live += d * d * itemsize + nb * tp * tp * 4
        # per-(item,pair) kv/v packs are (2TP, 2hd) with hd = d/heads
        # (= d/8 on every preset) + the (TP, 2TP) f32 packed content scores
        live += 2 * (2 * tp) * (2 * d // 8) * itemsize + tp * 2 * tp * 4
    # norm-fusion extras (conformer_block always requests pre-LN + residual
    # fusion when this guard passes): kernel_layer_norm's (NB·TP, D) f32
    # temporary plus the normed attn_in copy, while raw x stays alive for
    # the in-kernel residual
    live += nb * tp * d * (4 + itemsize)
    return weights + live <= 14 * 1024 * 1024


def _mega_fusable(p: Params, x: jnp.ndarray) -> bool:
    """COMBINED VMEM guard for the mega kernel: it keeps the ffn1 weights
    AND the five attention projections AND the score/rotation live set
    resident at once, so passing _ffn_fusable and _attn_block_fusable
    individually is not sufficient (their budgets would double-book VMEM
    for mid-sized configs like f32 D=512/F=1920/T=384)."""
    w1 = p["ffn1_.fc1_.weight"]
    ffn_w = 2 * w1.size * w1.dtype.itemsize
    t = x.shape[1]
    tp = -(-t // 128) * 128
    d = x.shape[-1]
    itemsize = x.dtype.itemsize
    attn_w = 5 * d * d * itemsize
    live = 2 * tp * tp * 4 + 3 * tp * d * 4 + 2 * tp * d * itemsize
    return ffn_w + attn_w + live <= 14 * 1024 * 1024


def _block_attention_or_none(
    p: Params,
    x: jnp.ndarray,
    lengths,
    mask,
    norm: Params | None = None,
    eps: float = 1e-5,
):
    """Run the whole-block fused attention kernel if the current global
    mode + shapes allow it; None otherwise (caller falls back).

    norm: when given, `x` is the raw BLOCK input and the kernel fuses the
    attention pre-LayerNorm AND the residual add (returns x + attn(LN(x))).

    Graceful NB downgrade: a blockN mode whose VMEM budget doesn't fit at
    this model size (600m d=1024 rejects nb=4) falls back down the halving
    chain to the largest fitting batch block — still the block kernel,
    never v1."""
    if _FUSED_ATTENTION not in (
        "block", "block2", "block4", "block8", "mega", "bd2", "bd4", "bd8",
        "blockhp", "block2hp", "block4hp", "block8hp",
    ):
        return None
    if not (mask is None or lengths is not None):  # mega degrades to block here
        return None
    nb = _attn_batch_block()
    candidates = []
    while nb >= 1:
        candidates.append(nb)
        nb //= 2
    nb_fit = next((n for n in candidates if _attn_block_fusable(p, x, n)), None)
    if nb_fit is None:
        return None
    from parakeet_tpu.ops.pallas_attention import fused_rel_attention_block

    mha = p.sub("mha_")
    kw = {}
    if norm is not None:
        kw = dict(norm_w=norm["weight"], norm_b=norm["bias"], eps=eps)
    return fused_rel_attention_block(
        x,
        mha["q_proj.weight"], mha["q_proj.bias"],
        mha["k_proj.weight"], mha["k_proj.bias"],
        mha["v_proj.weight"], mha["v_proj.bias"],
        p["pos_bias_u_"].astype(x.dtype), p["pos_bias_v_"].astype(x.dtype),
        p["pos_proj_.weight"],
        mha["out_proj.weight"], mha["out_proj.bias"],
        lengths=lengths,
        batch_block=nb_fit,
        blockdiag=_attn_blockdiag(),
        headpair=_attn_headpair(),
        score_bf16=(_SCORE_STORAGE == "bf16"),
        **kw,
    )


def rel_position_attention(
    p: Params,
    x: jnp.ndarray,
    pos_emb: jnp.ndarray,
    num_heads: int,
    mask: jnp.ndarray | None = None,
    lengths: jnp.ndarray | None = None,
    xla_only: bool = False,
) -> jnp.ndarray:
    """NeMo-style relative-position MHSA (encoder.cpp:112-181).

    content = (Q+u)Kᵀ; pos = rel_shift((Q+v)Pᵀ); scores scaled AFTER the sum
    (encoder.cpp:160). mask: (B, 1, T, T) bool, True = masked.
    xla_only: never dispatch a Pallas kernel (see conformer_block).
    """
    b, t, d = x.shape
    head_dim = d // num_heads
    scale = 1.0 / math.sqrt(head_dim)

    mha = p.sub("mha_")

    out = None if xla_only else _block_attention_or_none(p, x, lengths, mask)
    if out is not None:
        return out

    q = _split_heads(linear(mha.sub("q_proj"), x), num_heads)
    k = _split_heads(linear(mha.sub("k_proj"), x), num_heads)
    v = _split_heads(linear(mha.sub("v_proj"), x), num_heads)

    bias_u = p["pos_bias_u_"].astype(x.dtype)[None, :, None, :]  # (1,H,1,hd)
    bias_v = p["pos_bias_v_"].astype(x.dtype)[None, :, None, :]

    if not xla_only and _FUSED_ATTENTION and (mask is None or lengths is not None) and t <= 768:
        # v1 path; also the fallback when the block kernel's guard rejects.
        # Its own per-(b,h) buffers are ~12·TP² bytes → cap T (beyond that,
        # plain XLA attention handles long clips).
        if _SCORE_STORAGE == "bf16" and _FUSED_ATTENTION == "v1":
            # only the block kernels implement bf16 score storage; an
            # explicit v1 run would silently measure f32 scores while
            # reporting the bf16 operating point. (When a BLOCK mode falls
            # back here on a guard-rejected shape, f32 scores are the
            # documented fallback behavior — more precise, never less.)
            raise ValueError(
                "score storage 'bf16' requires a block fused-attention mode; "
                "'v1' does not implement it — use set_fused_attention('block*') "
                "or set_score_storage('f32')"
            )
        from parakeet_tpu.ops.pallas_attention import fused_rel_attention

        pos = linear(p.sub("pos_proj_"), pos_emb.astype(x.dtype))  # (2T-1, d)
        pos = jnp.transpose(pos.reshape(-1, num_heads, head_dim), (1, 0, 2))
        out = fused_rel_attention(q + bias_u, q + bias_v, k, v, pos, lengths=lengths)
        out = jnp.transpose(out, (0, 2, 1, 3)).reshape(b, t, d)
        return linear(mha.sub("out_proj"), out)

    # (B,H,T,hd) @ (B,H,hd,T) → (B,H,T,T)
    content = jnp.einsum("bhtd,bhsd->bhts", q + bias_u, k,
                         preferred_element_type=_F32, precision=matmul_precision(x.dtype))

    pos = linear(p.sub("pos_proj_"), pos_emb.astype(x.dtype))  # (2T-1, d)
    pos = jnp.transpose(pos.reshape(-1, num_heads, head_dim), (1, 0, 2))  # (H,2T-1,hd)
    pos_score = jnp.einsum("bhtd,hsd->bhts", q + bias_v, pos,
                           preferred_element_type=_F32, precision=matmul_precision(x.dtype))
    pos_score = rel_shift(pos_score)

    scores = (content + pos_score) * scale
    if mask is not None:
        scores = jnp.where(mask, _NEG_INF, scores)
    attn = jax.nn.softmax(scores.astype(_F32), axis=-1).astype(x.dtype)

    out = jnp.einsum("bhts,bhsd->bhtd", attn, v,
                     preferred_element_type=_F32, precision=matmul_precision(x.dtype)).astype(x.dtype)
    out = jnp.transpose(out, (0, 2, 1, 3)).reshape(b, t, d)
    return linear(mha.sub("out_proj"), out)


def conformer_block(
    p: Params,
    x: jnp.ndarray,
    pos_emb: jnp.ndarray,
    cfg: EncoderConfig,
    mask: jnp.ndarray | None = None,
    pad_mask: jnp.ndarray | None = None,
    lengths: jnp.ndarray | None = None,
    xla_only: bool = False,
) -> jnp.ndarray:
    """ffn1 → attn → conv → ffn2 → final LayerNorm (encoder.cpp:196-204).

    xla_only: skip every fused-Pallas branch regardless of the process
    globals — required inside shard_map/scan bodies (pipeline parallelism),
    where Pallas programs can't run."""
    eps = cfg.layer_norm_eps
    if (
        not xla_only
        and _FUSED_ATTENTION == "mega"
        and (mask is None or lengths is not None)
        and _ffn_fusable(p.sub("ffn1_"), x)
        and _attn_block_fusable(p.sub("attn_"), x)
        and _mega_fusable(p, x)
    ):
        from parakeet_tpu.ops.pallas_attention import fused_ffn_attention

        a = p.sub("attn_")
        mha = a.sub("mha_")
        f = p.sub("ffn1_")
        x = fused_ffn_attention(
            x,
            ffn=dict(
                norm_w=f["norm_.weight"], norm_b=f["norm_.bias"],
                fc1_w=f["fc1_.weight"], fc1_b=f["fc1_.bias"],
                fc2_w=f["fc2_.weight"], fc2_b=f["fc2_.bias"],
            ),
            attn_norm_w=a["norm_.weight"], attn_norm_b=a["norm_.bias"],
            wq=mha["q_proj.weight"], bq=mha["q_proj.bias"],
            wk=mha["k_proj.weight"], bk=mha["k_proj.bias"],
            wv=mha["v_proj.weight"], bv=mha["v_proj.bias"],
            bias_u=a["pos_bias_u_"].astype(x.dtype), bias_v=a["pos_bias_v_"].astype(x.dtype),
            pos_w=a["pos_proj_.weight"],
            wo=mha["out_proj.weight"], bo=mha["out_proj.bias"],
            lengths=lengths, eps=eps,
        )
    else:
        x = feed_forward(p.sub("ffn1_"), x, eps, xla_only=xla_only)
        # try the block kernel with the pre-LN + residual fused in (two
        # fewer (B,T,D) HBM round trips per layer); fall back to XLA norm
        # + separate attention when the kernel doesn't apply
        fused = None if xla_only else _block_attention_or_none(
            p.sub("attn_"), x, lengths, mask,
            norm=p.sub("attn_").sub("norm_"), eps=eps,
        )
        if fused is not None:
            x = fused
        else:
            attn_in = layer_norm(p.sub("attn_").sub("norm_"), x, eps)
            x = x + rel_position_attention(
                p.sub("attn_"), attn_in, pos_emb, cfg.num_heads, mask, lengths,
                xla_only=xla_only,
            )
    if not xla_only and _FUSED_BLOCK2 and _ffn_fusable(p.sub("ffn2_"), x):
        # one kernel for the whole non-attention second half
        from parakeet_tpu.ops.pallas_block import fused_conv_ffn_final

        c = p.sub("conv_")
        f = p.sub("ffn2_")
        kern_lengths = lengths
        if kern_lengths is None and pad_mask is not None:
            kern_lengths = (~pad_mask).sum(axis=1).astype(jnp.int32)
        return fused_conv_ffn_final(
            x,
            conv=dict(
                norm_w=c["norm_.weight"], norm_b=c["norm_.bias"],
                w1=c["pointwise_conv1_.weight"], b1=c["pointwise_conv1_.bias"],
                wd=c["depthwise_conv_.weight"], bd=c["depthwise_conv_.bias"],
                bn_w=c["batch_norm_.weight"], bn_b=c["batch_norm_.bias"],
                bn_mean=c["batch_norm_.running_mean"], bn_var=c["batch_norm_.running_var"],
                w2=c["pointwise_conv2_.weight"], b2=c["pointwise_conv2_.bias"],
            ),
            ffn=dict(
                norm_w=f["norm_.weight"], norm_b=f["norm_.bias"],
                fc1_w=f["fc1_.weight"], fc1_b=f["fc1_.bias"],
                fc2_w=f["fc2_.weight"], fc2_b=f["fc2_.bias"],
            ),
            final_w=p["final_norm_.weight"], final_b=p["final_norm_.bias"],
            kernel_size=cfg.conv_kernel_size,
            lengths=kern_lengths,
            eps=eps,
        )
    x = conv_module(p.sub("conv_"), x, cfg.conv_kernel_size, eps, pad_mask, xla_only=xla_only)
    if not xla_only and _FUSED_FFN and _ffn_fusable(p.sub("ffn2_"), x):
        # final LayerNorm rides in ffn2's kernel epilogue (one less round trip)
        return _feed_forward_fused(p.sub("ffn2_"), x, eps, final=p.sub("final_norm_"))
    x = feed_forward(p.sub("ffn2_"), x, eps, xla_only=xla_only)
    return layer_norm(p.sub("final_norm_"), x, eps)


def length_mask(lengths: jnp.ndarray, t: int) -> jnp.ndarray:
    """(B,) valid encoder-frame counts → (B, 1, T, T) bool attention mask
    (True = masked). Not in the reference (it never masks); needed for
    padded batched inference on TPU."""
    valid = jnp.arange(t)[None, :] < lengths[:, None]  # (B, T)
    pair = valid[:, None, :] & valid[:, :, None]  # (B, T, T)
    return ~pair[:, None, :, :]


def encode_prologue(
    p: Params,
    cfg: EncoderConfig,
    features: jnp.ndarray,
    lengths: jnp.ndarray | None = None,
):
    """Everything before the conformer stack: subsampling (+xscaling), the
    rel-pos table, and the padding masks. Shared by `fastconformer_encode`
    and the pipeline-parallel encoder (parallel/pipeline.py), which runs
    the block stack under shard_map instead of a Python loop.

    Returns (x, pos_emb, mask, pad_mask, enc_lengths)."""
    activation = getattr(cfg, "subsampling_activation", "relu")
    xscaling = getattr(cfg, "xscaling", False)

    x = conv_subsampling(p.sub("subsampling_"), features, activation)
    if xscaling:
        x = x * math.sqrt(cfg.hidden_size)

    t = x.shape[1]
    pos_emb = sinusoidal_position_embedding(t, cfg.hidden_size)

    mask = pad_mask = enc_lengths = None
    if lengths is not None:
        enc_lengths = jnp.minimum(encoded_lengths(lengths), t)
        mask = length_mask(enc_lengths, t)
        pad_mask = jnp.arange(t)[None, :] >= enc_lengths[:, None]  # (B, T')
    return x, pos_emb, mask, pad_mask, enc_lengths


def fastconformer_encode(
    p: Params,
    cfg: EncoderConfig,
    features: jnp.ndarray,
    lengths: jnp.ndarray | None = None,
    act_sharding=None,
    remat: bool = False,
) -> jnp.ndarray:
    """(B, T, mel) → (B, T', d_model). Reference: encoder.cpp:245-271 (offline)
    and streaming_encoder.cpp:389-427 (full-seq path with activation/xscaling).

    `p` is the Params view at the encoder prefix (e.g. root.sub('encoder_')).
    `lengths`: optional per-utterance mel-frame counts for pad masking.
    `act_sharding`: optional NamedSharding for the (B, T', d_model)
    activations (parallel.mesh.activation_sharding) — constrains each
    block's output so GSPMD shards the encoder over time ('seq' axis) and
    inserts the halo/gather collectives itself. Requires the XLA attention
    path (Pallas kernels run per-device programs, not GSPMD-partitioned).
    `remat`: training-memory lever — wrap each conformer block in
    `jax.checkpoint`, so backward stores only the per-block inputs and
    recomputes the block's internals (attention scores, FFN hiddens:
    the O(B·T²·H + B·T·4D) terms) instead of keeping them alive. Forces
    the XLA path (a rematerialized Pallas call would re-enter the kernel
    inside the grad jaxpr, which this jax version's lowering cache rejects).
    """

    def _constrain(a):
        if act_sharding is not None:
            return jax.lax.with_sharding_constraint(a, act_sharding)
        return a

    x, pos_emb, mask, pad_mask, enc_lengths = encode_prologue(p, cfg, features, lengths)
    x = _constrain(x)

    layers = p.sub("layers_")
    for i in range(cfg.num_layers):
        if remat:
            def _block(xx, layer=layers.sub(str(i))):
                return conformer_block(
                    layer, xx, pos_emb, cfg, mask, pad_mask, enc_lengths, xla_only=True
                )
            x = jax.checkpoint(_block)(x)
        else:
            x = conformer_block(layers.sub(str(i)), x, pos_emb, cfg, mask, pad_mask, enc_lengths)
        x = _constrain(x)
    return x


def encoded_lengths(lengths: jnp.ndarray) -> jnp.ndarray:
    l = lengths
    for _ in range(3):
        l = (l - 1) // 2 + 1
    return l


__all__ = [
    "sinusoidal_position_embedding",
    "subsample_length",
    "conv_subsampling",
    "conv_subsampling_stages",
    "feed_forward",
    "conv_module",
    "set_conv_layout",
    "set_fused_subsample",
    "rel_shift",
    "rel_position_attention",
    "conformer_block",
    "length_mask",
    "encoded_lengths",
    "encode_prologue",
    "fastconformer_encode",
    "fused_kernels_active",
]

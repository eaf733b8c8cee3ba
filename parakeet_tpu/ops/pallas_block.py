"""Fused conformer-block-second-half Pallas kernel: conv module + ffn2 +
final LayerNorm in ONE kernel per batch element.

Measured motivation (TUNING.md r2): with the roll-free block attention
kernel the encoder spends ~11 ms of 26 ms in the conv module, ffn2 and the
per-layer glue between them — separate pallas calls for conv and FFN were
individually neutral-to-worse because each call re-fetches weights and
breaks XLA fusion at its boundary. Fusing the whole non-attention second
half eliminates two activation round trips and all intermediate
materialization:

    x ── conv module (LN → pw1 → GLU → depthwise → BN → SiLU → pw2 → +x)
      ── macaron FFN (LN → fc1 → SiLU → fc2 → + 0.5·)
      ── final LayerNorm

VMEM: conv weights ~3 MB + ffn 4.2 MB (110m bf16) + activations ~2 MB.
Weights' index maps are constant along the (B,) grid → fetched once.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from parakeet_tpu.ops.pallas_utils import (
    conv_module_body,
    depthwise_taps,
    ffn_body,
    fold_batch_norm,
    kernel_layer_norm,
    round_up,
    whole_block,
)

_F32 = jnp.float32


def _conv_ffn_kernel(
    len_ref,                     # SMEM (B, 1)
    x_ref,                       # (1, TP, D)
    cnw_ref, cnb_ref,            # conv LN (1, D)
    w1_ref, b1_ref,              # pw1 (2D, D), (1, 2D)
    wd_ref, bd_ref,              # depthwise (K8, D), (1, D)
    bnw_ref, bnb_ref,            # folded BN (1, D)
    w2_ref, b2_ref,              # pw2 (D, D), (1, D)
    fnw_ref, fnb_ref,            # ffn LN (1, D)
    f1_ref, g1_ref,              # fc1 (F, D), (1, F)
    f2_ref, g2_ref,              # fc2 (D, F), (1, D)
    onw_ref, onb_ref,            # final LN (1, D)
    out_ref,                     # (1, TP, D)
    *,
    eps: float,
    kernel_size: int,
    t_real: int,
):
    x = x_ref[0]
    valid = jnp.minimum(len_ref[pl.program_id(0), 0], t_real)

    # conv module + ffn2 share the single body implementations in
    # pallas_utils (same code pallas_conv / pallas_ffn run standalone)
    x2 = conv_module_body(
        x, valid, cnw_ref[0], cnb_ref[0], w1_ref[...], b1_ref[0],
        wd_ref[...], bd_ref[0], bnw_ref[0], bnb_ref[0], w2_ref[...], b2_ref[0],
        eps, kernel_size,
    )
    x3 = ffn_body(x2, fnw_ref[0], fnb_ref[0], f1_ref[...], g1_ref[0],
                  f2_ref[...], g2_ref[0], eps)
    out_ref[0] = kernel_layer_norm(x3, onw_ref[0], onb_ref[0], eps).astype(out_ref.dtype)


def fused_conv_ffn_final(
    x: jnp.ndarray,  # (B, T, D)
    conv: dict,      # conv-module params: norm_w/b, w1/b1, wd/bd, bn_w/b/mean/var, w2/b2
    ffn: dict,       # norm_w/b, fc1_w/b, fc2_w/b
    final_w, final_b,
    kernel_size: int,
    lengths: jnp.ndarray | None = None,
    eps: float = 1e-5,
    interpret: bool = False,
) -> jnp.ndarray:
    b, t, d = x.shape
    f = ffn["fc1_w"].shape[0]
    tp = round_up(t, 128)
    if lengths is None:
        lengths = jnp.full((b,), t, jnp.int32)
    lengths = lengths.astype(jnp.int32).reshape(b, 1)
    xpad = jnp.pad(x, ((0, 0), (0, tp - t), (0, 0)))

    bnw, bnb = fold_batch_norm(
        conv["bn_w"], conv["bn_b"], conv["bn_mean"], conv["bn_var"], d, x.dtype
    )
    k = kernel_size
    wd_t = depthwise_taps(conv["wd"], k)

    kern = functools.partial(_conv_ffn_kernel, eps=eps, kernel_size=k, t_real=t)

    args = (
        lengths, xpad,
        conv["norm_w"].reshape(1, d), conv["norm_b"].reshape(1, d),
        conv["w1"][:, :, 0], conv["b1"].reshape(1, 2 * d),
        wd_t, conv["bd"].reshape(1, d),
        bnw, bnb,
        conv["w2"][:, :, 0], conv["b2"].reshape(1, d),
        ffn["norm_w"].reshape(1, d), ffn["norm_b"].reshape(1, d),
        ffn["fc1_w"], ffn["fc1_b"].reshape(1, f),
        ffn["fc2_w"], ffn["fc2_b"].reshape(1, d),
        final_w.reshape(1, d), final_b.reshape(1, d),
    )
    out = pl.pallas_call(
        kern,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((b, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, tp, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            *[whole_block(a) for a in args[2:]],
        ],
        out_specs=pl.BlockSpec((1, tp, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, tp, d), x.dtype),
        interpret=interpret,
    )(*args)
    return out[:, :t, :]


__all__ = ["fused_conv_ffn_final"]

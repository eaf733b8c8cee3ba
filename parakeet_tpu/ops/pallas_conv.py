"""Fused conformer conv-module Pallas kernel.

In-situ ablation (TUNING.md r2) shows the conv module is the single most
expensive encoder submodule: the XLA path pays two full activation
transposes (the (B,d,T) conv layout), plus HBM round trips for the
pointwise/GLU/depthwise/BN/SiLU intermediates, every layer. This kernel
keeps the whole module in VMEM per batch element:

    LayerNorm → pointwise(d→2d, matmul) → GLU → [zero pad rows] →
    depthwise k-tap over time (k sublane-shifted slices) → inference BN →
    SiLU → pointwise(d→d, matmul) → +residual

Time lives on sublanes, channels on lanes, so the depthwise conv is k
static sublane shifts with broadcast multiply-accumulate — no transposes
anywhere. Weights' block index maps are constant along the (B,) grid, so
Mosaic keeps them VMEM-resident across programs; per-layer HBM traffic is
one read of x and one write of the output.

Reference semantics: encoder.cpp:59-75 (+ NeMo pad-mask zeroing before the
depthwise conv for batched padded inference).
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
    fold_batch_norm,
    round_up,
    whole_block,
)

_F32 = jnp.float32


def _conv_module_kernel(
    len_ref,   # SMEM (B, 1) valid frame counts
    x_ref,     # (1, TP, D)
    nw_ref, nb_ref,        # (1, D) layer-norm scale/bias
    w1_ref, b1_ref,        # (2D, D), (1, 2D) pointwise 1 (torch layout)
    wd_ref, bd_ref,        # (K8, D), (1, D) depthwise taps (time-major)
    bnw_ref, bnb_ref,      # (1, D) folded BN scale/bias
    w2_ref, b2_ref,        # (D, D), (1, D) pointwise 2
    out_ref,               # (1, TP, D)
    *,
    eps: float,
    kernel_size: int,
    t_real: int,
):
    x = x_ref[0]  # (TP, D)
    valid = jnp.minimum(len_ref[pl.program_id(0), 0], t_real)
    # single shared body (pallas_utils.conv_module_body) — also what the
    # fused second-half kernel (pallas_block) runs, so rounding can't drift
    out_ref[0] = conv_module_body(
        x, valid, nw_ref[0], nb_ref[0], w1_ref[...], b1_ref[0],
        wd_ref[...], bd_ref[0], bnw_ref[0], bnb_ref[0], w2_ref[...], b2_ref[0],
        eps, kernel_size,
    ).astype(out_ref.dtype)


def fused_conv_module(
    x: jnp.ndarray,          # (B, T, D)
    norm_w, norm_b,          # (D,)
    w1, b1,                  # torch Conv1d (2D, D, 1), (2D,)
    wd, bd,                  # torch depthwise (D, 1, K), (D,)
    bn_w, bn_b, bn_mean, bn_var,  # (D,)
    w2, b2,                  # (D, D, 1), (D,)
    lengths: jnp.ndarray | None = None,
    eps: float = 1e-5,
    interpret: bool = False,
) -> jnp.ndarray:
    b, t, d = x.shape
    k = wd.shape[-1]
    tp = round_up(t, 128)
    if lengths is None:
        lengths = jnp.full((b,), t, jnp.int32)
    lengths = lengths.astype(jnp.int32).reshape(b, 1)

    xpad = jnp.pad(x, ((0, 0), (0, tp - t), (0, 0)))

    bnw, bnb = fold_batch_norm(bn_w, bn_b, bn_mean, bn_var, d, x.dtype)
    wd_t = depthwise_taps(wd, k)  # (K8, D)

    kernel = functools.partial(
        _conv_module_kernel, eps=eps, kernel_size=k, t_real=t
    )

    args = (
        lengths,
        xpad,
        norm_w.reshape(1, d), norm_b.reshape(1, d),
        w1[:, :, 0], b1.reshape(1, 2 * d),
        wd_t, bd.reshape(1, d),
        bnw, bnb,
        w2[:, :, 0], b2.reshape(1, d),
    )
    out = pl.pallas_call(
        kernel,
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


__all__ = ["fused_conv_module"]

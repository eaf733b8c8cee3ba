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
    depthwise_taps,
    fold_batch_norm,
    kernel_layer_norm,
    kernel_precision,
    round_up,
    sigmoid_f32,
    silu_kernelside,
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
    tp, d = x.shape
    hi = jax.lax.Precision.HIGHEST if x.dtype == _F32 else jax.lax.Precision.DEFAULT

    # LayerNorm (f32 math, mirroring ops.layers.layer_norm)
    xf = x.astype(_F32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    h = (xf - mean) * jax.lax.rsqrt(var + eps)
    h = (h * nw_ref[0].astype(_F32) + nb_ref[0].astype(_F32)).astype(x.dtype)

    # pointwise d → 2d (y = h @ W1.T + b1)
    y = jax.lax.dot_general(
        h, w1_ref[...], (((1,), (1,)), ((), ())), preferred_element_type=_F32, precision=hi
    ) + b1_ref[0].astype(_F32)
    y = y.astype(x.dtype)
    a, g = y[:, :d], y[:, d:]
    # GLU (lane split at d — 128-aligned). Sigmoid computed in f32: Mosaic
    # mislowers bf16 `logistic` (vector.broadcast f32→bf16 verify error).
    gate = 1.0 / (1.0 + jnp.exp(-g.astype(_F32)))
    h = (a.astype(_F32) * gate).astype(x.dtype)

    # zero invalid rows so depthwise taps can't smear pad garbage into the
    # valid region (the XLA path has no pad rows / masks them)
    row = jax.lax.broadcasted_iota(jnp.int32, (tp, d), 0)
    valid = jnp.minimum(len_ref[pl.program_id(0), 0], t_real)
    h = jnp.where(row < valid, h, jnp.zeros_like(h))

    # depthwise conv over time: K sublane-shifted slices. h is zero-padded
    # conceptually on both sides by (k-1)//2; realize via one padded scratch.
    pad = (kernel_size - 1) // 2
    hp = jnp.pad(h.astype(_F32), ((pad, pad), (0, 0)))
    acc = jnp.zeros((tp, d), _F32)
    for k in range(kernel_size):  # static loop
        acc = acc + hp[k : k + tp, :] * wd_ref[k][None, :].astype(_F32)
    acc = acc + bd_ref[0].astype(_F32)

    # inference BN folded to scale/bias, then SiLU. The XLA path casts the
    # BN output to x.dtype before SiLU; mirror that rounding, but keep the
    # sigmoid itself in f32 (Mosaic bf16-logistic bug, see GLU above).
    acc = acc * bnw_ref[0].astype(_F32) + bnb_ref[0].astype(_F32)
    accd = acc.astype(x.dtype)
    acc = (accd.astype(_F32) * (1.0 / (1.0 + jnp.exp(-accd.astype(_F32))))).astype(x.dtype)

    # pointwise d → d, residual
    o = jax.lax.dot_general(
        acc, w2_ref[...], (((1,), (1,)), ((), ())), preferred_element_type=_F32, precision=hi
    ) + b2_ref[0].astype(_F32)
    out_ref[0] = (x.astype(_F32) + o).astype(out_ref.dtype)


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

    # Fold running stats into scale/bias: y = (v - mean)*rsqrt(var+eps)*w + b
    # (BatchNorm1d inference; torch default eps 1e-5, matching ops.layers)
    inv = jax.lax.rsqrt(bn_var.astype(_F32) + 1e-5)
    bnw = (bn_w.astype(_F32) * inv).reshape(1, d)
    bnb = (bn_b.astype(_F32) - bn_mean.astype(_F32) * inv * bn_w.astype(_F32)).reshape(1, d)

    # time-major depthwise taps, k padded to a sublane-friendly multiple
    k8 = round_up(k, 8)
    wd_t = jnp.pad(jnp.transpose(wd[:, 0, :], (1, 0)), ((0, k8 - k), (0, 0)))  # (K8, D)

    kernel = functools.partial(
        _conv_module_kernel, eps=eps, kernel_size=k, t_real=t
    )

    def whole(arr):
        return pl.BlockSpec(arr.shape, lambda i: (0,) * arr.ndim, memory_space=pltpu.VMEM)

    args = (
        lengths,
        xpad,
        norm_w.reshape(1, d), norm_b.reshape(1, d),
        w1[:, :, 0], b1.reshape(1, 2 * d),
        wd_t, bd.reshape(1, d),
        bnw.astype(x.dtype), bnb.astype(x.dtype),
        w2[:, :, 0], b2.reshape(1, d),
    )
    out = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((b, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, tp, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            *[whole(a) for a in args[2:]],
        ],
        out_specs=pl.BlockSpec((1, tp, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, tp, d), x.dtype),
        interpret=interpret,
    )(*args)
    return out[:, :t, :]


__all__ = ["fused_conv_module"]

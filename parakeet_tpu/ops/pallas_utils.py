"""Shared helpers for the Pallas TPU kernels (ops/pallas_*.py).

Centralizes the pieces that must stay identical across kernels: the
kernel-side LayerNorm, the f32 sigmoid workaround (Mosaic mislowers bf16
`logistic` into an invalid vector.broadcast), matmul precision choice,
whole-array BlockSpecs with constant index maps (weights stay VMEM-resident
across grid steps), inference-BatchNorm folding, and depthwise-weight
layout prep.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_F32 = jnp.float32


def round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def kernel_precision(dtype):
    """HIGHEST for f32 operands (XLA truncates f32 matmuls by default on
    this backend); DEFAULT for bf16 (native MXU; Mosaic rejects HIGHEST)."""
    return jax.lax.Precision.HIGHEST if dtype == _F32 else jax.lax.Precision.DEFAULT


def kernel_layer_norm(x, w, b, eps):
    """LayerNorm over the minor axis, f32 math (mirrors ops.layers.layer_norm)."""
    xf = x.astype(_F32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (y * w.astype(_F32) + b.astype(_F32)).astype(x.dtype)


def sigmoid_f32(x):
    """Sigmoid computed in f32 — Mosaic mislowers bf16 `logistic`
    ('vector.broadcast' f32→bf16 verification error)."""
    return 1.0 / (1.0 + jnp.exp(-x.astype(_F32)))


def silu_kernelside(x):
    """x·sigmoid(x) with the sigmoid in f32; result in x.dtype."""
    return (x.astype(_F32) * sigmoid_f32(x)).astype(x.dtype)


def whole_block(arr) -> pl.BlockSpec:
    """Whole-array VMEM block with a constant index map — Mosaic keeps the
    block resident across grid steps (weights fetched once per call)."""
    return pl.BlockSpec(arr.shape, lambda *_: (0,) * arr.ndim, memory_space=pltpu.VMEM)


def fold_batch_norm(bn_w, bn_b, bn_mean, bn_var, d: int, dtype):
    """Inference BatchNorm1d running stats → (scale, bias) row vectors
    (torch default eps 1e-5, matching ops.layers.batch_norm_1d)."""
    inv = jax.lax.rsqrt(bn_var.astype(_F32) + 1e-5)
    scale = (bn_w.astype(_F32) * inv).reshape(1, d)
    bias = (bn_b.astype(_F32) - bn_mean.astype(_F32) * inv * bn_w.astype(_F32)).reshape(1, d)
    return scale.astype(dtype), bias.astype(dtype)


def depthwise_taps(wd, k: int):
    """torch depthwise weight (D, 1, K) → time-major (K8, D), K padded to a
    sublane-friendly multiple of 8."""
    k8 = round_up(k, 8)
    return jnp.pad(jnp.transpose(wd[:, 0, :], (1, 0)), ((0, k8 - k), (0, 0)))


def ffn_body(x, nw, nb, w1, b1, w2, b2, eps: float):
    """Macaron FFN half-step on VALUES: LN → fc1 → SiLU → fc2 → x + 0.5·y.
    (TP, D) x.dtype in/out; matmuls f32-accumulated; SiLU rounds through
    x.dtype like the XLA path. SINGLE implementation shared by
    pallas_ffn / pallas_block / pallas_attention(mega) so rounding can't
    drift between the fused variants."""
    hi = kernel_precision(x.dtype)
    h = kernel_layer_norm(x, nw, nb, eps)
    h = jax.lax.dot_general(
        h, w1, (((1,), (1,)), ((), ())), preferred_element_type=_F32, precision=hi
    ) + b1.astype(_F32)
    h = silu_kernelside(h.astype(x.dtype))
    y = jax.lax.dot_general(
        h, w2, (((1,), (1,)), ((), ())), preferred_element_type=_F32, precision=hi
    ) + b2.astype(_F32)
    return (x.astype(_F32) + 0.5 * y).astype(x.dtype)


def conv_module_body(x, valid, nw, nb, w1, b1, wd_taps, bd, bn_scale, bn_bias,
                     w2, b2, eps: float, kernel_size: int):
    """Conformer conv module on VALUES: LN → pw1 → GLU → zero pad rows →
    depthwise (static tap loop) → folded BN → SiLU → pw2 → +x residual
    (residual held in f32). Shared by pallas_conv / pallas_block."""
    tp, d = x.shape
    hi = kernel_precision(x.dtype)
    h = kernel_layer_norm(x, nw, nb, eps)
    y = jax.lax.dot_general(
        h, w1, (((1,), (1,)), ((), ())), preferred_element_type=_F32, precision=hi
    ) + b1.astype(_F32)
    y = y.astype(x.dtype)
    a, g = y[:, :d], y[:, d:]
    h = (a.astype(_F32) * sigmoid_f32(g)).astype(x.dtype)  # GLU

    # zero invalid rows so depthwise taps can't smear pad garbage inward
    row = jax.lax.broadcasted_iota(jnp.int32, (tp, d), 0)
    h = jnp.where(row < valid, h, jnp.zeros_like(h))

    pad = (kernel_size - 1) // 2
    hp = jnp.pad(h.astype(_F32), ((pad, pad), (0, 0)))
    acc = jnp.zeros((tp, d), _F32)
    for k in range(kernel_size):  # static loop
        acc = acc + hp[k : k + tp, :] * wd_taps[k][None, :].astype(_F32)
    acc = acc + bd.astype(_F32)
    # folded inference BN, then SiLU with the XLA path's x.dtype rounding
    acc = acc * bn_scale.astype(_F32) + bn_bias.astype(_F32)
    acc = silu_kernelside(acc.astype(x.dtype))
    o = jax.lax.dot_general(
        acc, w2, (((1,), (1,)), ((), ())), preferred_element_type=_F32, precision=hi
    ) + b2.astype(_F32)
    return (x.astype(_F32) + o).astype(x.dtype)


__all__ = [
    "round_up",
    "kernel_precision",
    "kernel_layer_norm",
    "sigmoid_f32",
    "silu_kernelside",
    "whole_block",
    "fold_batch_norm",
    "depthwise_taps",
    "ffn_body",
    "conv_module_body",
]

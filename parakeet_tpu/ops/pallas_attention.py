"""Fused rel-pos attention Pallas kernel (offline encoder hot path).

Profiling (B=256, T=125): attention is ~60% of encoder time and HBM-bound —
XLA materializes the (B,H,T,2T-1) position scores, the pad/reshape/slice
rel_shift copies, and the (B,H,T,T) score/softmax tensors in HBM every
layer. This kernel keeps the whole per-(batch, head) attention in VMEM:

    content = (Q+u) Kᵀ                  (T,T)   MXU
    raw     = (Q+v) Pᵀ                  (T,2T-1) MXU
    shift   : row t ← raw[t, T-1-t : 2T-1-t]    (dynamic lane slices)
    softmax((content+shift)·scale) @ V  (T,hd)  MXU

Nothing but Q/K/V/P and the (T,hd) output touches HBM. Numerics: scores and
softmax in f32 (same as the XLA path); bf16 inputs supported.

Grid: (B, H). Fits easily: T≈125, hd=64 → all operands < 1 MB.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_F32 = jnp.float32


def _attn_kernel(qu_ref, qv_ref, k_ref, v_ref, p_ref, out_ref, shifted_ref, *, scale: float):
    # refs: (1, 1, T, hd) per (b, h) block; p_ref (1, 2T-1, hd); shifted (T, T) f32 scratch
    qu = qu_ref[0, 0]
    qv = qv_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    p = p_ref[0]
    t = qu.shape[0]

    hi = jax.lax.Precision.HIGHEST
    content = jax.lax.dot_general(
        qu, k, (((1,), (1,)), ((), ())), preferred_element_type=_F32, precision=hi
    )  # (T, T)
    raw = jax.lax.dot_general(
        qv, p, (((1,), (1,)), ((), ())), preferred_element_type=_F32, precision=hi
    )  # (T, 2T-1)

    def shift_row(i, _):
        # row i of the shifted matrix = raw[i, (T-1-i) : (2T-1-i)]
        shifted_ref[pl.ds(i, 1), :] = jax.lax.dynamic_slice(raw, (i, t - 1 - i), (1, t))
        return 0

    jax.lax.fori_loop(0, t, shift_row, 0)

    scores = (content + shifted_ref[:]) * scale
    # inline softmax (jax.nn.softmax lowers via closed_call; see module note)
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    attn = e / jnp.sum(e, axis=-1, keepdims=True)
    out = jax.lax.dot_general(
        attn.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=_F32, precision=hi,
    )
    out_ref[0, 0] = out.astype(out_ref.dtype)


def fused_rel_attention(  # no inner jit: nested closed_call trips this
    # jax version's cached lowering (KeyError in _lower_jaxpr_to_fun_cached);
    # callers are always inside an outer jit.
    q_u: jnp.ndarray,  # (B, H, T, hd): Q + pos_bias_u
    q_v: jnp.ndarray,  # (B, H, T, hd): Q + pos_bias_v
    k: jnp.ndarray,  # (B, H, T, hd)
    v: jnp.ndarray,  # (B, H, T, hd)
    p: jnp.ndarray,  # (H, 2T-1, hd): per-head projected position table
    interpret: bool = False,
) -> jnp.ndarray:
    b, h, t, hd = q_u.shape
    scale = 1.0 / math.sqrt(hd)
    kernel = functools.partial(_attn_kernel, scale=scale)

    def qspec():
        return pl.BlockSpec((1, 1, t, hd), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM)

    return pl.pallas_call(
        kernel,
        grid=(b, h),
        in_specs=[
            qspec(),
            qspec(),
            qspec(),
            qspec(),
            pl.BlockSpec((1, 2 * t - 1, hd), lambda i, j: (j, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, t, hd), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, t, hd), q_u.dtype),
        scratch_shapes=[pltpu.VMEM((t, t), _F32)],
        interpret=interpret,
    )(q_u, q_v, k, v, p)


__all__ = ["fused_rel_attention"]

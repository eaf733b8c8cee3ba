"""Fused macaron-FFN Pallas kernel (+ optional trailing LayerNorm).

In-situ ablation (TUNING.md r2): the two FFNs cost ~8 ms of the 34 ms
B=64 encoder forward — mostly HBM round trips between LN, fc1, SiLU, fc2
and the residual. This kernel runs the whole macaron FFN per batch element
in VMEM:

    h = LayerNorm(x) @ W1ᵀ + b1 ; h = SiLU(h)
    y = x + 0.5 · (h @ W2ᵀ + b2)
    [optionally: y = LayerNorm(y)  — the conformer block's final norm,
     fused into ffn2's kernel so the extra activation round trip vanishes]

Weights' index maps are constant along the (B,) grid → VMEM-resident
across programs. VMEM high-water for 110m (D=512, F=2048): W1+W2 4 MB bf16
+ x/h scratch ~1.3 MB. For 600m (D=1024, F=4096): 16 MB bf16 weights —
too big; callers fall back to the XLA path per-config (see
models/encoder.feed_forward).

Reference semantics: encoder.cpp:34-46 (0.5 half-step residual).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from parakeet_tpu.ops.pallas_utils import (
    ffn_body,
    kernel_layer_norm,
    round_up,
    whole_block,
)

_F32 = jnp.float32


def _ffn_kernel(
    x_ref,                 # (1, TP, D)
    nw_ref, nb_ref,        # (1, D) pre-norm
    w1_ref, b1_ref,        # (F, D), (1, F)
    w2_ref, b2_ref,        # (D, F), (1, D)
    fw_ref, fb_ref,        # (1, D) trailing norm (present iff final_norm)
    out_ref,               # (1, TP, D)
    *,
    eps: float,
    final_norm: bool,
):
    x = x_ref[0]
    # single shared body (pallas_utils.ffn_body) — also what pallas_block
    # and the mega attention kernel run, so rounding can't drift
    out = ffn_body(x, nw_ref[0], nb_ref[0], w1_ref[...], b1_ref[0],
                   w2_ref[...], b2_ref[0], eps)
    if final_norm:
        out = kernel_layer_norm(out, fw_ref[0], fb_ref[0], eps)
    out_ref[0] = out.astype(out_ref.dtype)


def fused_feed_forward(
    x: jnp.ndarray,          # (B, T, D)
    norm_w, norm_b,          # (D,)
    w1, b1,                  # torch Linear (F, D), (F,)
    w2, b2,                  # (D, F), (D,)
    final_norm_w=None, final_norm_b=None,  # fuse the block's final LayerNorm
    eps: float = 1e-5,
    interpret: bool = False,
) -> jnp.ndarray:
    b, t, d = x.shape
    f = w1.shape[0]
    tp = round_up(t, 128)
    xpad = jnp.pad(x, ((0, 0), (0, tp - t), (0, 0)))
    final = final_norm_w is not None
    fw = (final_norm_w if final else norm_w).reshape(1, d)
    fb = (final_norm_b if final else norm_b).reshape(1, d)

    kernel = functools.partial(_ffn_kernel, eps=eps, final_norm=final)

    args = (
        xpad,
        norm_w.reshape(1, d), norm_b.reshape(1, d),
        w1, b1.reshape(1, f),
        w2, b2.reshape(1, d),
        fw, fb,
    )
    out = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, tp, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            *[whole_block(a) for a in args[1:]],
        ],
        out_specs=pl.BlockSpec((1, tp, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, tp, d), x.dtype),
        interpret=interpret,
    )(*args)
    return out[:, :t, :]


__all__ = ["fused_feed_forward"]

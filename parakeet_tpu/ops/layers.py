"""Primitive NN ops over torch-layout weights.

These replace the axiom layer zoo (`axiom::nn::Linear/Conv1d/Conv2d/
LayerNorm/BatchNorm1d/Embedding`, SURVEY §2.14) with pure functions on a
`Params` prefix view. Weight layouts are torch's (what the reference
safetensors files contain): Linear (out, in), Conv1d (out, in/groups, k),
Conv2d (out, in/groups, kh, kw).

All matmuls set preferred_element_type=float32 so bf16 params still
accumulate in f32 on the MXU. Normalization layers compute in f32.
"""

from __future__ import annotations

import contextvars

import jax
import jax.numpy as jnp
from jax import lax

from parakeet_tpu.params import Params

_F32 = jnp.float32

# f32 contractions NEED Precision.HIGHEST on this XLA (default silently
# truncates to bf16-like passes — CLAUDE.md / TUNING.md); bf16 operands hit
# the MXU natively and HIGHEST would only ask XLA to upcast. Precision is
# therefore chosen per-operand-dtype. set_bf16_precision exists for A/B.
_BF16_PRECISION = lax.Precision.DEFAULT

# When True, bf16 matmuls request bf16 outputs (bias added in bf16) instead
# of materializing f32 and casting — the MXU still accumulates in f32
# internally; this only changes the output buffer dtype and bias rounding.
_BF16_OUTPUT = False


def set_bf16_precision(p) -> None:
    global _BF16_PRECISION
    _BF16_PRECISION = p


def set_bf16_matmul_output(enabled: bool) -> None:
    global _BF16_OUTPUT
    _BF16_OUTPUT = bool(enabled)


# When True, int8-weight linears run as W8A8 s8×s8→s32 dots (dynamic
# per-row activation absmax scales) instead of weight-only dequantize.
# Streams int8 weight bytes even inside while_loops; ~0.5% logit error.
_INT8_COMPUTE = False


def set_int8_compute(enabled: bool) -> None:
    global _INT8_COMPUTE
    _INT8_COMPUTE = bool(enabled)


def matmul_precision(dtype) -> lax.Precision:
    return lax.Precision.HIGHEST if dtype == _F32 else _BF16_PRECISION


def anchor_quantized_weights(params: Params, anchor: jnp.ndarray) -> Params:
    """Tie int-quantized weight leaves to a loop-carried value.

    Inside a `lax.while_loop` body the dequantize in `linear` (int8→bf16
    convert / int4 nibble unpack) is loop-INVARIANT, and XLA's LICM hoists
    it out of the loop — materializing a full-precision copy of every
    quantized weight that then streams from HBM each iteration, erasing
    the entire bandwidth win quantization was bought for (this is why the
    r3 int8-decoder e2e measurement read "within noise"; TUNING.md).

    Passing each int8 leaf through an `optimization_barrier` together
    with a loop-carried array makes the barrier non-hoistable, so the
    dequantize stays in the body. The barrier is an aliasing no-op and the
    arithmetic is unchanged — results stay bit-identical to the unanchored
    path.

    Measured (r4, B=192 isolated decode): int8 anchored 18.45 ms vs 19.37
    bf16 — real but below the byte-ratio prediction, because XLA emits the
    in-loop convert as its own fusion (a materialize + reread) rather than
    folding it into the dot's weight stream; `set_int8_compute` (W8A8) is
    the path that truly streams int8 bytes. int4 leaves are deliberately
    NOT anchored: the per-iteration nibble unpack measured 2× SLOWER
    (37 ms) than letting LICM hoist it once.

    Returns `params` unchanged when no int8 leaves exist (the normal
    f32/bf16 decode path pays nothing).
    """
    data = params.data
    keys = [
        k
        for k, v in data.items()
        if hasattr(v, "dtype") and v.dtype == jnp.int8
    ]
    if not keys:
        return params
    out = lax.optimization_barrier(tuple(data[k] for k in keys) + (anchor,))
    new = dict(data)
    for k, v in zip(keys, out[:-1]):
        new[k] = v
    return Params(new, params.prefix)


def linear(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """y = x @ W.T (+ b). W: (out, in); x: (..., in).

    int8 W (quantize.quantize_params): the per-out-channel scale commutes
    with the contraction, so dequant happens on the (..., out) RESULT —
    W streams from HBM as int8 and is upcast on the fly, never
    materialized dequantized.

    Packed int4 W (uint8 + ##scale4 group scales): in-dim group scales
    don't commute, so the nibble unpack + scale run right before the
    matmul — XLA fuses them into the weight read (4-bit HBM stream)."""
    w = p["weight"]
    if w.dtype == jnp.uint8:
        from parakeet_tpu.quantize import SCALE4_SUFFIX, dequantize_int4_jnp

        w = dequantize_int4_jnp(w, p["weight" + SCALE4_SUFFIX], x.dtype)
    elif w.dtype == jnp.int8:
        from parakeet_tpu.quantize import SCALE_SUFFIX

        scale = p["weight" + SCALE_SUFFIX]
        if _INT8_COMPUTE:
            # W8A8: the weight operand of the dot IS the stored s8 tensor,
            # so the loop streams int8 bytes — the weight-only path below
            # cannot deliver that inside a while_loop (XLA materializes the
            # dequantize as its own fusion even when anchored against LICM;
            # TUNING.md r4). Activations quantize per call with a dynamic
            # per-row absmax scale. NOT bit-parity with the float path
            # (~0.5% logit error) — opt-in via set_int8_compute.
            xf = x.astype(_F32)
            ax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
            sx = jnp.maximum(ax, 1e-30) / 127.0
            xq = jnp.round(xf / sx).astype(jnp.int8)
            y = jax.lax.dot_general(
                xq, w, (((x.ndim - 1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(_F32)
            y = y * sx * scale.astype(_F32)
        else:
            y = jax.lax.dot_general(
                x, w.astype(x.dtype), (((x.ndim - 1,), (1,)), ((), ())),
                preferred_element_type=_F32, precision=matmul_precision(x.dtype),
            )
            y = y * scale.astype(_F32)
        b = p.get("bias")
        if b is not None:
            y = y + b.astype(_F32)
        return y.astype(x.dtype)
    pref = x.dtype if (_BF16_OUTPUT and x.dtype != _F32) else _F32
    y = jax.lax.dot_general(
        x, w, (((x.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=pref, precision=matmul_precision(x.dtype),
    )
    b = p.get("bias")
    if b is not None:
        y = y + b.astype(pref)
    return y.astype(x.dtype)


def embedding(p: Params, ids: jnp.ndarray) -> jnp.ndarray:
    """ids (...,) int32 → (..., dim)."""
    return jnp.take(p["weight"], ids, axis=0)


def layer_norm(p: Params, x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    xf = x.astype(_F32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * lax.rsqrt(var + eps)
    y = y * p["weight"].astype(_F32) + p["bias"].astype(_F32)
    return y.astype(x.dtype)


def batch_norm_1d(p: Params, x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """Inference-mode BatchNorm1d over (B, C, T) using running stats."""
    mean = p["running_mean"].astype(_F32)[None, :, None]
    var = p["running_var"].astype(_F32)[None, :, None]
    w = p["weight"].astype(_F32)[None, :, None]
    b = p["bias"].astype(_F32)[None, :, None]
    y = (x.astype(_F32) - mean) * lax.rsqrt(var + eps) * w + b
    return y.astype(x.dtype)


# When True (default), convs accumulate into f32 outputs even from bf16
# inputs (preferred_element_type) — the inference numerics. bf16 TRAINING
# must turn this off (train.with_compute_dtype does, at trace time): this
# jax version's conv TRANSPOSE rule can't mix a f32 cotangent with bf16
# operands ("requires arguments to have the same dtypes"), and rounding
# conv outputs to bf16 is standard bf16-training behavior anyway.
# Context-local (not process-global): a trainer toggling it mid-trace must
# never leak into a concurrent thread's trace (e.g. an eval thread running
# bf16 inference while a new bucket shape retraces the train step).
_CONV_ACCUM_F32: contextvars.ContextVar[bool] = contextvars.ContextVar(
    "parakeet_conv_accum_f32", default=True
)


def set_conv_accum_f32(enabled: bool) -> None:
    _CONV_ACCUM_F32.set(bool(enabled))


def get_conv_accum_f32() -> bool:
    return _CONV_ACCUM_F32.get()


def conv_pref(x) -> jnp.dtype | None:
    """preferred_element_type for a conv over `x` under the current
    accumulation mode (see set_conv_accum_f32). Public: encoder.py's
    feature-minor depthwise conv uses it too."""
    return _F32 if (_CONV_ACCUM_F32.get() or x.dtype == _F32) else None


_conv_pref = conv_pref  # internal alias used by conv1d/conv2d below


def conv1d(
    p: Params,
    x: jnp.ndarray,
    *,
    stride: int = 1,
    padding: int = 0,
    groups: int = 1,
) -> jnp.ndarray:
    """x: (B, C_in, T) → (B, C_out, T'). Weight: (C_out, C_in/groups, k)."""
    w = p["weight"]
    y = lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride,),
        padding=[(padding, padding)],
        dimension_numbers=("NCH", "OIH", "NCH"),
        feature_group_count=groups,
        preferred_element_type=_conv_pref(x),
        precision=matmul_precision(x.dtype),
    )
    b = p.get("bias")
    if b is not None:
        y = y + b.astype(y.dtype)[None, :, None]
    return y.astype(x.dtype)


def conv2d(
    p: Params,
    x: jnp.ndarray,
    *,
    stride: tuple[int, int] = (1, 1),
    padding: tuple[int, int] = (0, 0),
    groups: int = 1,
    layout: str = "NCHW",
) -> jnp.ndarray:
    """2-D conv over torch-layout weights (C_out, C_in/g, kh, kw).

    layout selects the activation layout (NCHW or NHWC — the latter is
    TPU-preferred; measured 18% faster on the subsampling stack, identical
    numerics)."""
    w = p["weight"]
    y = lax.conv_general_dilated(
        x,
        w,
        window_strides=stride,
        padding=[(padding[0], padding[0]), (padding[1], padding[1])],
        dimension_numbers=(layout, "OIHW", layout),
        feature_group_count=groups,
        preferred_element_type=_conv_pref(x),
        precision=matmul_precision(x.dtype),
    )
    b = p.get("bias")
    if b is not None:
        bshape = [1, 1, 1, 1]
        bshape[layout.index("C")] = -1
        y = y + b.astype(y.dtype).reshape(bshape)
    return y.astype(x.dtype)


def conv2d_nhwc(p: Params, x: jnp.ndarray, **kw) -> jnp.ndarray:
    """conv2d with NHWC activations; see conv2d."""
    return conv2d(p, x, layout="NHWC", **kw)


def glu(x: jnp.ndarray, axis: int) -> jnp.ndarray:
    a, b = jnp.split(x, 2, axis=axis)
    return a * jax.nn.sigmoid(b)


__all__ = ["matmul_precision", "set_bf16_precision", "set_int8_compute", "anchor_quantized_weights", "set_conv_accum_f32", "get_conv_accum_f32", "conv_pref", "linear", "embedding", "layer_norm", "batch_norm_1d", "conv1d", "conv2d", "conv2d_nhwc", "glu"]

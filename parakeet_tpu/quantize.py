"""Weight-only INT8 quantization for inference.

The reference lists "Model quantization — INT8/INT4 weight quantization"
as an unchecked Tier-3 roadmap item (/root/reference/README.md). On TPU
the win is HBM bandwidth: weight-bound configs (600m encoders at modest
batch) stream half the bytes per step; the matmul itself still runs
bf16/f32 on the MXU with the dequant folded in AFTER the contraction —
per-OUTPUT-channel symmetric scales commute with the matmul:

    y = x @ (q · s[:, None]).T  ==  (x @ q.T) · s[None, :]

so the kernel never materializes dequantized weights (ops/layers.linear
int8 branch). Quantized tensors live in the same flat params dict: the
int8 array keeps the schema key, its f32 scale rides at `<key>##scale`
('#' can't appear in converter schema names, so no collision).

Applies to 2-D linear weights only (LayerNorm/bias/conv/embedding excluded
— embeddings are gathers, not matmuls, and the rest is numerically
load-bearing but tiny). safetensors I/O round-trips int8 natively, so
quantized checkpoints are half-size on disk too.
"""

from __future__ import annotations

import re

import numpy as np
import jax.numpy as jnp

SCALE_SUFFIX = "##scale"

# never quantize: embeddings (gather path), normalization, anything 1-D
_EXCLUDE = re.compile(r"embed_|norm|bias")


def quantize_tensor(w: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(out, in) f32/bf16 → (int8 q, f32 per-out-channel scale s) with
    w ≈ q · s[:, None]; symmetric, max-abs calibrated."""
    w32 = np.asarray(w, np.float32)
    s = np.abs(w32).max(axis=1) / 127.0
    s = np.maximum(s, 1e-12)
    q = np.clip(np.rint(w32 / s[:, None]), -127, 127).astype(np.int8)
    return q, s.astype(np.float32)


def dequantize_tensor(q: np.ndarray, s: np.ndarray) -> np.ndarray:
    return np.asarray(q, np.float32) * np.asarray(s, np.float32)[:, None]


def quantize_params(params: dict, *, min_elems: int = 4096, include: str | None = None) -> dict:
    """Quantize eligible 2-D `.weight` tensors of a flat param dict to int8
    (+ `##scale` sidecars); everything else passes through unchanged.

    min_elems: skip tiny matrices (quant overhead without bandwidth win).
    include: optional regex — only keys matching it are quantized.

    Note: for tensor-parallel meshes, shard_params replicates the `##scale`
    sidecars (they're (out,)-shaped and tiny); quantized + TP over the out
    dim would need a matching scale shard — use quantization with DP/seq
    meshes, or replicated weights.
    """
    out: dict = {}
    for k, v in params.items():
        arr = np.asarray(v)
        eligible = (
            k.endswith(".weight")
            and arr.dtype != np.int8  # already quantized: re-quantizing the
            # raw codes would replace the real ##scale with ~1.0 (garbage)
            and arr.ndim == 2
            and arr.size >= min_elems
            and not _EXCLUDE.search(k)
            and (include is None or re.search(include, k))
        )
        if eligible:
            q, s = quantize_tensor(arr)
            out[k] = jnp.asarray(q)
            out[k + SCALE_SUFFIX] = jnp.asarray(s)
        else:
            out[k] = v
    return out


def quantized_fraction(params: dict) -> float:
    """Fraction of parameter ELEMENTS stored as int8 (observability). The
    byte fraction is lower (int8 elements are 1 byte vs 4 for f32) —
    element count is what predicts how much of the weight set dequantizes
    at runtime."""
    q = total = 0
    for k, v in params.items():
        if k.endswith(SCALE_SUFFIX):
            continue
        n = int(np.prod(v.shape))
        total += n
        if v.dtype == jnp.int8:
            q += n
    return q / total if total else 0.0


__all__ = [
    "SCALE_SUFFIX",
    "quantize_tensor",
    "dequantize_tensor",
    "quantize_params",
    "quantized_fraction",
]

"""Weight-only INT8 / INT4 quantization for inference.

The reference lists "Model quantization — INT8/INT4 weight quantization"
as an unchecked Tier-3 roadmap item (/root/reference/README.md). On TPU
the win is HBM bandwidth and footprint: weight-bound configs (600m
encoders at modest batch) stream half (int8) or a quarter (int4) of the
bytes per step; the matmul itself still runs bf16/f32 on the MXU.

INT8: per-OUTPUT-channel symmetric scales commute with the matmul:

    y = x @ (q · s[:, None]).T  ==  (x @ q.T) · s[None, :]

so the kernel never materializes dequantized weights (ops/layers.linear
int8 branch).

INT4: symmetric codes in [-7, 7] with GROUP-WISE scales along the input
dimension (group_size inputs share one scale — the standard int4 recipe;
per-out-channel-only scales lose too much at 4 bits). Two codes pack per
uint8 byte (element 2j in the low nibble, 2j+1 in the high nibble), so
the stored tensor is (out, in/2) uint8. In-dim group scales do NOT
commute with the contraction, so ops/layers.linear unpacks and
dequantizes to the activation dtype right before the matmul — XLA fuses
the nibble unpack + scale into the weight read; the weight still streams
from HBM at 4 bits + scales. All shape bookkeeping is recoverable from
the two arrays (in = 2·packed.shape[1]; group = in / scales.shape[1]),
so no extra metadata rides the checkpoint.

Quantized tensors live in the same flat params dict: the int8/uint8
array keeps the schema key, its f32 scale rides at `<key>##scale`
(int8) or `<key>##scale4` (int4) — '#' can't appear in converter schema
names, so no collision.

Applies to 2-D linear weights only (LayerNorm/bias/conv/embedding excluded
— embeddings are gathers, not matmuls, and the rest is numerically
load-bearing but tiny). safetensors I/O round-trips int8/uint8 natively,
so quantized checkpoints are half- (int8) or quarter-size (int4) on disk.
"""

from __future__ import annotations

import re

import numpy as np
import jax.numpy as jnp

SCALE_SUFFIX = "##scale"
SCALE4_SUFFIX = "##scale4"

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


def _int4_group(in_dim: int, group_size: int) -> int:
    """Effective group size: the largest divisor of in_dim ≤ group_size."""
    if group_size < 1:
        raise ValueError(f"group_size must be >= 1, got {group_size}")
    return max(g for g in range(1, min(group_size, in_dim) + 1) if in_dim % g == 0)


def quantize_tensor_int4(
    w: np.ndarray, group_size: int = 64
) -> tuple[np.ndarray, np.ndarray]:
    """(out, in) float → (packed uint8 (out, in/2), f32 scales (out, in/g)).

    Symmetric codes in [-7, 7], one max-abs scale per (out-channel,
    input-group); element 2j in the low nibble of byte j, 2j+1 in the high
    nibble. Requires even in-dim (callers gate eligibility)."""
    w32 = np.asarray(w, np.float32)
    out, in_dim = w32.shape
    if in_dim % 2:
        raise ValueError(f"int4 packing needs an even in-dim, got {w32.shape}")
    g = _int4_group(in_dim, group_size)
    grouped = w32.reshape(out, in_dim // g, g)
    s = np.abs(grouped).max(axis=2) / 7.0
    s = np.maximum(s, 1e-12)
    q = np.clip(np.rint(grouped / s[:, :, None]), -7, 7).astype(np.int8)
    q = q.reshape(out, in_dim)
    nib = (q & 0xF).astype(np.uint8)
    packed = nib[:, 0::2] | (nib[:, 1::2] << 4)
    return packed, s.astype(np.float32)


def unpack_int4(packed: np.ndarray) -> np.ndarray:
    """(out, in/2) uint8 → (out, in) int8 codes in [-7, 7]."""
    p = np.asarray(packed, np.uint8)
    lo = (p & 0xF).astype(np.int8)
    hi = (p >> 4).astype(np.int8)
    lo = np.where(lo > 7, lo - 16, lo).astype(np.int8)
    hi = np.where(hi > 7, hi - 16, hi).astype(np.int8)
    codes = np.empty((p.shape[0], p.shape[1] * 2), np.int8)
    codes[:, 0::2] = lo
    codes[:, 1::2] = hi
    return codes


def dequantize_tensor_int4(packed: np.ndarray, s: np.ndarray) -> np.ndarray:
    """Invert quantize_tensor_int4; group size recovered from the shapes."""
    codes = unpack_int4(packed)
    out, in_dim = codes.shape
    n_groups = np.asarray(s).shape[1]
    g = in_dim // n_groups
    grouped = codes.reshape(out, n_groups, g).astype(np.float32)
    return (grouped * np.asarray(s, np.float32)[:, :, None]).reshape(out, in_dim)


def dequantize_int4_jnp(packed: jnp.ndarray, s: jnp.ndarray, dtype) -> jnp.ndarray:
    """Traceable dequant for the runtime path (ops/layers.linear): nibble
    unpack + group scale, fused by XLA into the consuming matmul's weight
    read so the tensor streams from HBM at 4 bits."""
    out, half = packed.shape
    in_dim = half * 2
    n_groups = s.shape[1]
    g = in_dim // n_groups
    lo = (packed & jnp.uint8(0xF)).astype(jnp.int8)
    hi = (packed >> jnp.uint8(4)).astype(jnp.int8)
    lo = jnp.where(lo > 7, lo - 16, lo)
    hi = jnp.where(hi > 7, hi - 16, hi)
    codes = jnp.stack([lo, hi], axis=-1).reshape(out, in_dim)
    wf = codes.reshape(out, n_groups, g).astype(jnp.float32) * s[:, :, None].astype(jnp.float32)
    return wf.reshape(out, in_dim).astype(dtype)


def quantize_params(
    params: dict,
    *,
    mode: str = "int8",
    min_elems: int = 4096,
    include: str | None = None,
    group_size: int = 64,
    as_numpy: bool = False,
) -> dict:
    """Quantize eligible 2-D `.weight` tensors of a flat param dict to int8
    (+ `##scale` sidecars) or packed int4 (+ `##scale4`); everything else
    passes through unchanged.

    mode: "int8" (per-out-channel scales) or "int4" (group-wise scales,
    two codes per byte; odd in-dims stay unquantized).
    min_elems: skip tiny matrices (quant overhead without bandwidth win).
    include: optional regex — only keys matching it are quantized.
    group_size: int4 inputs sharing one scale (clamped to a divisor).
    as_numpy: keep outputs as numpy arrays (no device placement) — for
    offline tools that must not initialize a backend (quantize_ckpt).

    Note: for tensor-parallel meshes, shard_params replicates the scale
    sidecars (they're tiny); quantized + TP over a quantized dim would
    need matching scale/packing shards — use quantization with DP/seq
    meshes, or replicated weights.
    """
    if mode not in ("int8", "int4"):
        raise ValueError(f"unsupported quantize mode {mode!r} (want 'int8' or 'int4')")
    out: dict = {}
    for k, v in params.items():
        arr = np.asarray(v)
        eligible = (
            k.endswith(".weight")
            # already quantized: re-quantizing raw int8 codes would replace
            # the real ##scale with ~1.0 (garbage); uint8 is packed int4
            and arr.dtype not in (np.int8, np.uint8)
            and arr.ndim == 2
            and arr.size >= min_elems
            and not _EXCLUDE.search(k)
            and (include is None or re.search(include, k))
            and (mode == "int8" or arr.shape[1] % 2 == 0)
        )
        if eligible:
            wrap = (lambda a: a) if as_numpy else jnp.asarray
            if mode == "int4":
                q, s = quantize_tensor_int4(arr, group_size=group_size)
                out[k] = wrap(q)
                out[k + SCALE4_SUFFIX] = wrap(s)
            else:
                q, s = quantize_tensor(arr)
                out[k] = wrap(q)
                out[k + SCALE_SUFFIX] = wrap(s)
        else:
            out[k] = v
    return out


def quantized_fraction(params: dict) -> float:
    """Fraction of parameter ELEMENTS stored quantized (observability). The
    byte fraction differs (int8 = 1 byte, int4 = ½ byte vs 4 for f32) —
    element count is what predicts how much of the weight set dequantizes
    at runtime. uint8 tensors are packed int4: one stored byte = two
    logical elements."""
    q = total = 0
    for k, v in params.items():
        if k.endswith(SCALE_SUFFIX) or k.endswith(SCALE4_SUFFIX):
            continue
        n = int(np.prod(v.shape))
        if v.dtype == jnp.uint8:
            n *= 2  # packed int4: logical element count
            q += n
        elif v.dtype == jnp.int8:
            q += n
        total += n
    return q / total if total else 0.0


__all__ = [
    "SCALE_SUFFIX",
    "SCALE4_SUFFIX",
    "quantize_tensor",
    "dequantize_tensor",
    "quantize_tensor_int4",
    "dequantize_tensor_int4",
    "dequantize_int4_jnp",
    "unpack_int4",
    "quantize_params",
    "quantized_fraction",
]

"""Vanilla transformer encoder (Sortformer head).

Reference: src/transformer.cpp:9-88 — standard MHA + ReLU FFN blocks with
switchable pre/post-norm (Sortformer uses post-norm: norm applied AFTER the
residual add, transformer.cpp:51,61), optional final norm.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from parakeet_tpu.config import TransformerConfig
from parakeet_tpu.ops.layers import layer_norm, linear, matmul_precision
from parakeet_tpu.params import Params

_F32 = jnp.float32
_NEG_INF = -1e9


def transformer_block(
    p: Params, x: jnp.ndarray, cfg: TransformerConfig, mask: jnp.ndarray | None = None
) -> jnp.ndarray:
    eps = cfg.layer_norm_eps
    num_heads = cfg.num_heads
    b, t, d = x.shape
    hd = d // num_heads
    scale = 1.0 / math.sqrt(hd)

    mha_in = layer_norm(p.sub("norm1_"), x, eps) if cfg.pre_ln else x
    mha = p.sub("mha_")

    def split(v):
        return jnp.transpose(v.reshape(b, t, num_heads, hd), (0, 2, 1, 3))

    q = split(linear(mha.sub("q_proj"), mha_in))
    k = split(linear(mha.sub("k_proj"), mha_in))
    v = split(linear(mha.sub("v_proj"), mha_in))

    scores = jnp.einsum(
        "bhtd,bhsd->bhts", q, k, preferred_element_type=_F32,
        precision=matmul_precision(x.dtype),
    ) * scale
    if mask is not None:
        scores = jnp.where(mask, _NEG_INF, scores)
    attn = jax.nn.softmax(scores.astype(_F32), axis=-1).astype(x.dtype)
    out = jnp.einsum(
        "bhts,bhsd->bhtd", attn, v, preferred_element_type=_F32,
        precision=matmul_precision(x.dtype),
    ).astype(x.dtype)
    out = jnp.transpose(out, (0, 2, 1, 3)).reshape(b, t, d)
    out = linear(mha.sub("out_proj"), out)

    x = (x + out) if cfg.pre_ln else layer_norm(p.sub("norm1_"), x + out, eps)

    ffn_in = layer_norm(p.sub("norm2_"), x, eps) if cfg.pre_ln else x
    h = jax.nn.relu(linear(p.sub("fc1_"), ffn_in))
    h = linear(p.sub("fc2_"), h)
    return (x + h) if cfg.pre_ln else layer_norm(p.sub("norm2_"), x + h, eps)


def transformer_encode(
    p: Params, cfg: TransformerConfig, x: jnp.ndarray, mask: jnp.ndarray | None = None
) -> jnp.ndarray:
    layers = p.sub("layers_")
    for i in range(cfg.num_layers):
        x = transformer_block(layers.sub(str(i)), x, cfg, mask)
    if cfg.has_final_norm:
        x = layer_norm(p.sub("final_norm_"), x, cfg.layer_norm_eps)
    return x


__all__ = ["transformer_block", "transformer_encode"]

"""Streaming FastConformer encoder with FIXED-SHAPE rolling caches.

Reference: src/streaming_encoder.cpp. The reference grows/trims per-layer
KV caches dynamically (:186-208) and builds a float mask on the CPU every
chunk (:239-261). The TPU-native redesign keeps every cache at a static
shape so each latency mode {0,1,6,13} and chunk cadence compiles ONCE:

  * KV cache: (L, B, H, left, hd), RIGHT-ALIGNED — slot left-1 is the most
    recent pre-chunk frame; a scalar `valid` counts real slots. With this
    alignment the reference's warmup-dependent position-bias slice
    (rightmost kv_len columns of (Q+v)Pᵀ, :223-232) reduces to the STATIC
    query-independent mapping  pos_score[:, qi, ki] = (q+v)·P[tc-1+ki]
    (tc = left + chunk): the dynamic shift cancels exactly — verified
    algebraically and by the parity test against a dynamic-shape oracle.
  * attention mask: dist = (left + qi) - ki; masked iff dist > left or
    -dist > right (reference :239-261) or ki names an unfilled cache slot.
  * conv cache: (L, B, d, k-1) of post-GLU activations, zeros initially
    (≡ the reference's first-chunk zero pad, :55-66).
  * mel remainder for subsampling stays host-side (tiny, variable 0..7
    frames, :348-385): consumable = floor(total/8)·8 frames per chunk.

Note the streaming attention applies NO rel_shift (matching the reference's
cached path — its full-seq path does shift; the two paths intentionally
differ in the reference too).
"""

from __future__ import annotations

import functools
import math
from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

from parakeet_tpu.config import StreamingEncoderConfig
from parakeet_tpu.models.encoder import (
    _silu,
    conv_subsampling,
    feed_forward,
    sinusoidal_position_embedding,
)
from parakeet_tpu.ops.layers import batch_norm_1d, conv1d, glu, layer_norm, linear, matmul_precision
from parakeet_tpu.params import Params

_F32 = jnp.float32
_NEG_INF = -1e9


def encoder_compute_dtype(params: dict, prefix: str = "encoder_", default=_F32):
    """The streaming encoder's compute dtype: the first FLOATING leaf under
    `prefix`. Weight-only-quantized encoders keep float scales (and the
    int8/int4 code leaves are skipped), so this returns the dtype the
    activations should run at. Single source of truth for the mel cast in
    streaming_encoder_chunk and for cache initialization — a f32 cache
    around bf16 weights silently promotes every K/V concat back to f32."""
    return next(
        (v.dtype for kk, v in params.items()
         if kk.startswith(prefix) and jnp.issubdtype(v.dtype, jnp.floating)),
        default,
    )


def init_encoder_cache(cfg: StreamingEncoderConfig, batch: int, dtype=_F32) -> dict:
    """Fixed-shape cache pytree (replaces EncoderCache/BlockCache structs,
    streaming_encoder.hpp:28-43)."""
    l, d, h = cfg.num_layers, cfg.hidden_size, cfg.num_heads
    hd = d // h
    left, k = cfg.att_context_left, cfg.conv_kernel_size
    return {
        "conv": jnp.zeros((l, batch, d, k - 1), dtype),
        "key": jnp.zeros((l, batch, h, left, hd), dtype),
        "value": jnp.zeros((l, batch, h, left, hd), dtype),
        "valid": jnp.zeros((batch,), jnp.int32),  # per-item filled KV slots (≤ left)
    }


def _streaming_attention(
    p: Params,
    x: jnp.ndarray,  # (B, chunk, d) — already layer-normed
    pos_tail: jnp.ndarray,  # (tc, d): P rows tc-1 … 2tc-2 (positions 0…-(tc-1))
    k_cache: jnp.ndarray,  # (B, H, left, hd)
    v_cache: jnp.ndarray,
    valid: jnp.ndarray,  # (B,) int32 — per-item filled cache slots
    num_heads: int,
    att_left: int,
    att_right: int,
):
    b, chunk, d = x.shape
    hd = d // num_heads
    scale = 1.0 / math.sqrt(hd)
    mha = p.sub("mha_")

    def split(t):
        return jnp.transpose(t.reshape(b, chunk, num_heads, hd), (0, 2, 1, 3))

    q = split(linear(mha.sub("q_proj"), x))
    k_new = split(linear(mha.sub("k_proj"), x))
    v_new = split(linear(mha.sub("v_proj"), x))

    k_full = jnp.concatenate([k_cache, k_new], axis=2)  # (B, H, tc, hd)
    v_full = jnp.concatenate([v_cache, v_new], axis=2)
    tc = k_full.shape[2]
    left = k_cache.shape[2]

    new_k_cache = k_full[:, :, -left:, :] if left > 0 else k_cache
    new_v_cache = v_full[:, :, -left:, :] if left > 0 else v_cache

    bias_u = p["pos_bias_u_"].astype(x.dtype)[None, :, None, :]
    bias_v = p["pos_bias_v_"].astype(x.dtype)[None, :, None, :]

    content = jnp.einsum(
        "bhtd,bhsd->bhts", q + bias_u, k_full,
        preferred_element_type=_F32, precision=matmul_precision(x.dtype),
    )
    # Query-independent position bias (see module docstring): (B,H,chunk,tc)
    pproj = linear(p.sub("pos_proj_"), pos_tail.astype(x.dtype))  # (tc, d)
    pproj = jnp.transpose(pproj.reshape(tc, num_heads, hd), (1, 0, 2))  # (H,tc,hd)
    pos_score = jnp.einsum(
        "bhtd,hsd->bhts", q + bias_v, pproj,
        preferred_element_type=_F32, precision=matmul_precision(x.dtype),
    )

    scores = (content + pos_score) * scale

    qi = jnp.arange(chunk)[:, None]
    ki = jnp.arange(tc)[None, :]
    dist = (left + qi) - ki
    mask = (dist > att_left) | (-dist > att_right)  # (chunk, tc)
    # per-item unfilled cache slots: (B, 1, chunk, tc)
    unfilled = ki[None] < (left - valid)[:, None, None]
    full_mask = mask[None, None] | unfilled[:, None]
    scores = jnp.where(full_mask, _NEG_INF, scores)

    attn = jax.nn.softmax(scores.astype(_F32), axis=-1).astype(x.dtype)
    out = jnp.einsum(
        "bhts,bhsd->bhtd", attn, v_full,
        preferred_element_type=_F32, precision=matmul_precision(x.dtype),
    ).astype(x.dtype)
    out = jnp.transpose(out, (0, 2, 1, 3)).reshape(b, chunk, d)
    return linear(mha.sub("out_proj"), out), new_k_cache, new_v_cache


def _causal_conv_module(
    p: Params, x: jnp.ndarray, conv_cache: jnp.ndarray, kernel_size: int, eps: float
):
    """Causal conv with cache prepend (streaming_encoder.cpp:41-78)."""
    d = x.shape[-1]
    h = layer_norm(p.sub("norm_"), x, eps)
    h = jnp.swapaxes(h, 1, 2)  # (B, d, chunk)
    h = conv1d(p.sub("pointwise_conv1_"), h)
    h = glu(h, axis=1)
    h = jnp.concatenate([conv_cache, h], axis=2)  # (B, d, k-1+chunk)
    new_cache = h[:, :, -(kernel_size - 1) :]
    h = conv1d(p.sub("depthwise_conv_"), h, groups=d)  # VALID → (B, d, chunk)
    h = batch_norm_1d(p.sub("batch_norm_"), h)
    h = _silu(h)
    h = conv1d(p.sub("pointwise_conv2_"), h)
    return x + jnp.swapaxes(h, 1, 2), new_cache


def _streaming_block(
    p: Params,
    x: jnp.ndarray,
    pos_tail: jnp.ndarray,
    cache_slice: tuple,
    cfg: StreamingEncoderConfig,
):
    conv_c, k_c, v_c, valid = cache_slice
    eps = cfg.layer_norm_eps
    x = feed_forward(p.sub("ffn1_"), x, eps)
    attn_in = layer_norm(p.sub("attn_").sub("norm_"), x, eps)
    attn_out, k_c, v_c = _streaming_attention(
        p.sub("attn_"), attn_in, pos_tail, k_c, v_c, valid,
        cfg.num_heads, cfg.att_context_left, cfg.att_context_right,
    )
    x = x + attn_out
    x, conv_c = _causal_conv_module(p.sub("conv_"), x, conv_c, cfg.conv_kernel_size, eps)
    x = feed_forward(p.sub("ffn2_"), x, eps)
    x = layer_norm(p.sub("final_norm_"), x, eps)
    return x, (conv_c, k_c, v_c)


@functools.partial(jax.jit, static_argnames=("cfg", "prefix"))
def streaming_encoder_chunk(
    params: dict, mel: jnp.ndarray, cache: dict, *, cfg: StreamingEncoderConfig, prefix: str = "encoder_"
):
    """One chunk through the streaming encoder.

    mel: (B, Tmel, mel_bins) with Tmel divisible by 8 (host guarantees —
    streaming_encoder.cpp:361-368). Returns (enc (B, Tmel/8, d), new cache).
    """
    p = Params(params).sub(prefix)
    # run at the ENCODER WEIGHTS' dtype: the mel frontend is always f32
    # (parity), so a bf16 compute_dtype session would otherwise feed f32
    # activations into bf16 convs (lax.conv requires matching dtypes)
    wdt = encoder_compute_dtype(params, prefix, mel.dtype)
    x = conv_subsampling(p.sub("subsampling_"), mel.astype(wdt),
                         cfg.subsampling_activation)
    if cfg.xscaling:
        x = x * math.sqrt(cfg.hidden_size)

    chunk = x.shape[1]
    tc = cfg.att_context_left + chunk
    # P rows tc-1 … 2tc-2 ↔ relative positions 0 … -(tc-1)
    pos_tail = sinusoidal_position_embedding(tc, cfg.hidden_size)[tc - 1 :]

    layers = p.sub("layers_")
    new_conv, new_k, new_v = [], [], []
    for i in range(cfg.num_layers):
        x, (cc, kc, vc) = _streaming_block(
            layers.sub(str(i)),
            x,
            pos_tail,
            (cache["conv"][i], cache["key"][i], cache["value"][i], cache["valid"]),
            cfg,
        )
        new_conv.append(cc)
        new_k.append(kc)
        new_v.append(vc)

    new_cache = {
        "conv": jnp.stack(new_conv),
        "key": jnp.stack(new_k),
        "value": jnp.stack(new_v),
        "valid": jnp.minimum(cache["valid"] + chunk, cfg.att_context_left),
    }
    return x, new_cache


@dataclass
class StreamingEncoderSession:
    """Host wrapper: mel remainder buffering + jitted chunk steps
    (replaces StreamingFastConformerEncoder::forward_chunk + EncoderCache)."""

    params: dict
    cfg: StreamingEncoderConfig
    batch: int = 1
    prefix: str = "encoder_"

    def __post_init__(self):
        self.reset()

    def reset(self) -> None:
        # cache dtype follows the weights so bf16 sessions keep bf16 K/V
        wdt = encoder_compute_dtype(self.params, self.prefix)
        self.cache = init_encoder_cache(self.cfg, self.batch, wdt)
        self._mel_rem = np.zeros((self.batch, 0, self.cfg.mel_bins), np.float32)
        self.frames_seen = 0

    def forward_chunk(self, mel_chunk) -> jnp.ndarray | None:
        """(B, T, mel) → (B, T'/8, d) or None when <8 mel frames buffered."""
        mel = np.concatenate([self._mel_rem, np.asarray(mel_chunk, np.float32)], axis=1)
        total = mel.shape[1]
        consumable = (total // 8) * 8
        if consumable == 0:
            self._mel_rem = mel
            return None
        self._mel_rem = mel[:, consumable:]
        out, self.cache = streaming_encoder_chunk(
            self.params, jnp.asarray(mel[:, :consumable]), self.cache,
            cfg=self.cfg, prefix=self.prefix,
        )
        self.frames_seen += out.shape[1]
        return out


__all__ = [
    "encoder_compute_dtype",
    "init_encoder_cache",
    "streaming_encoder_chunk",
    "StreamingEncoderSession",
]

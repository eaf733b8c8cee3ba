"""Sortformer speaker diarization.

Reference: src/sortformer.cpp — NEST encoder (streaming FastConformer,
128 mel, ReLU subsampling, xscaling) → Linear 512→192 → 18-layer post-norm
Transformer → speaker head relu → first_hidden_ → relu → output_proj_ →
sigmoid → (B, T, 4) activity probs. `hidden_to_spks_` is registered/loaded
but never used in forward (sortformer.cpp:42-68 vs sortformer.hpp:121-124)
— we keep it in the schema for state_dict compatibility only.

Host-side: probs → segments thresholding (:70-113), AOSC arrival-order
cache (:9-38), streaming diarize_chunk (:125-150).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from parakeet_tpu import params as P
from parakeet_tpu.config import SortformerConfig, make_sortformer_117m_config
from parakeet_tpu.decode.timestamp import frame_to_seconds
from parakeet_tpu.models.encoder import fastconformer_encode
from parakeet_tpu.models.streaming_encoder import StreamingEncoderSession
from parakeet_tpu.models.transformer import transformer_encode
from parakeet_tpu.ops.layers import linear
from parakeet_tpu.params import Params, load_params


from dataclasses import dataclass


@dataclass
class DiarizationSegment:
    speaker_id: int
    start: float  # seconds
    end: float


class AOSCCache:
    """Arrival-order speaker cache (sortformer.cpp:9-38)."""

    def __init__(self, max_speakers: int = 4):
        self.max_speakers = max_speakers
        self.reset()

    def update(self, probs) -> None:
        """probs: (T, max_speakers) sigmoid activity."""
        p = np.asarray(probs)
        for t in range(p.shape[0]):
            for s in range(min(p.shape[1], self.max_speakers)):
                if p[t, s] > 0.5 and not self._active[s]:
                    self._active[s] = True
                    self._order.append(s)

    def speaker_order(self) -> list[int]:
        return list(self._order)

    def reset(self) -> None:
        self._active = [False] * self.max_speakers
        self._order: list[int] = []


def _speaker_logits(root: Params, trans_out: jnp.ndarray) -> jnp.ndarray:
    h = jax.nn.relu(trans_out)
    h = linear(root.sub("first_hidden_"), h)
    h = jax.nn.relu(h)
    return linear(root.sub("output_proj_"), h)


def _speaker_head(root: Params, trans_out: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.sigmoid(_speaker_logits(root, trans_out).astype(jnp.float32))


def sortformer_logits(
    params: dict,
    features: jnp.ndarray,
    *,
    cfg: SortformerConfig,
    mel_lengths: jnp.ndarray | None = None,
    remat: bool = False,
) -> jnp.ndarray:
    """(B, mel_len, 128) → (B, T, max_speakers) PRE-sigmoid activity logits.

    The training-side twin of `sortformer_forward` (inference applies
    sigmoid; the BCE losses in train.py want logits for stability).
    mel_lengths enables pad masking for batched training — in the NEST
    encoder AND the transformer stage, so padded frames never leak into
    valid-frame logits (the loss additionally masks padded rows). remat
    rematerializes encoder blocks in backward (fastconformer_encode)."""
    from parakeet_tpu.models.encoder import encoded_lengths, length_mask

    root = Params(params)
    enc = fastconformer_encode(
        root.sub("nest_encoder_"), cfg.nest_encoder, features, mel_lengths, remat=remat
    )
    mask = None
    if mel_lengths is not None:
        enc_lens = jnp.minimum(encoded_lengths(mel_lengths), enc.shape[1])
        mask = length_mask(enc_lens, enc.shape[1])
    proj = linear(root.sub("projection_"), enc)
    trans = transformer_encode(root.sub("transformer_"), cfg.transformer, proj, mask)
    return _speaker_logits(root, trans).astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("cfg",))
def _sortformer_tail_states(
    params: dict, enc: jnp.ndarray, *, cfg: SortformerConfig
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """projection → transformer → speaker head; returns (pre-head states,
    probs). Single implementation shared by every tail consumer so the
    embedding states can never diverge from diarize()'s probs."""
    root = Params(params)
    proj = linear(root.sub("projection_"), enc)
    trans = transformer_encode(root.sub("transformer_"), cfg.transformer, proj)
    return trans, _speaker_head(root, trans)


def _sortformer_tail(params: dict, enc: jnp.ndarray, *, cfg: SortformerConfig) -> jnp.ndarray:
    """projection → transformer → speaker head (shared by full + chunk paths)."""
    return _sortformer_tail_states(params, enc, cfg=cfg)[1]


@functools.partial(jax.jit, static_argnames=("cfg",))
def sortformer_forward(params: dict, features: jnp.ndarray, *, cfg: SortformerConfig) -> jnp.ndarray:
    """(B, mel_len, 128) unnormalized log-mel → (B, T, max_speakers) probs
    (sortformer.cpp:50-68)."""
    root = Params(params)
    enc = fastconformer_encode(root.sub("nest_encoder_"), cfg.nest_encoder, features)
    return _sortformer_tail(params, enc, cfg=cfg)


@functools.partial(jax.jit, static_argnames=("cfg",))
def sortformer_states(
    params: dict, features: jnp.ndarray, *, cfg: SortformerConfig
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Forward that also exposes the transformer hidden states:
    ((B, T, D) pre-head states, (B, T, S) activity probs). The reference
    roadmap's "speaker embedding extraction from Sortformer intermediate
    layers" hooks here."""
    root = Params(params)
    enc = fastconformer_encode(root.sub("nest_encoder_"), cfg.nest_encoder, features)
    return _sortformer_tail_states(params, enc, cfg=cfg)


def speaker_embeddings(
    hidden: np.ndarray,
    probs: np.ndarray,
    *,
    activity_threshold: float = 0.5,
    min_frames: int = 2,
) -> tuple[np.ndarray, list[bool]]:
    """Per-speaker embeddings from one utterance's states.

    hidden: (T, D) transformer pre-head states; probs: (T, S) activity.
    Each speaker's embedding is the activity-prob-weighted mean of the
    hidden states over frames where that speaker is active (> threshold),
    L2-normalized — suitable for cosine-similarity speaker verification.
    Returns ((S, D) embeddings, active flags); speakers with fewer than
    `min_frames` active frames get a zero vector and active=False.
    """
    h = np.asarray(hidden, np.float32)
    p = np.asarray(probs, np.float32)
    t_len, d = h.shape
    s_len = p.shape[1]
    out = np.zeros((s_len, d), np.float32)
    active: list[bool] = []
    for s in range(s_len):
        mask = p[:, s] > activity_threshold
        if mask.sum() < min_frames:
            active.append(False)
            continue
        w = p[mask, s]
        emb = (h[mask] * w[:, None]).sum(0) / w.sum()
        norm = float(np.linalg.norm(emb))
        out[s] = emb / norm if norm > 0 else emb
        active.append(True)
    return out, active


def probs_to_segments(probs, activity_threshold: float = 0.5) -> list[DiarizationSegment]:
    """(T, S) probs → contiguous active runs per speaker, sorted by start
    (sortformer.cpp:70-113)."""
    p = np.asarray(probs)
    t_len, s_len = p.shape
    segments: list[DiarizationSegment] = []
    for s in range(s_len):
        active = p[:, s] > activity_threshold
        in_seg = False
        start = 0
        for t in range(t_len):
            if active[t] and not in_seg:
                start, in_seg = t, True
            elif not active[t] and in_seg:
                segments.append(DiarizationSegment(s, frame_to_seconds(start), frame_to_seconds(t - 1)))
                in_seg = False
        if in_seg:
            segments.append(DiarizationSegment(s, frame_to_seconds(start), frame_to_seconds(t_len - 1)))
    segments.sort(key=lambda seg: seg.start)
    return segments


class Sortformer:
    """Facade mirroring the reference class (sortformer.hpp:100-139)."""

    def __init__(
        self,
        weights_path: str | None = None,
        config: SortformerConfig | None = None,
        *,
        params: dict | None = None,
        seed: int = 0,
    ):
        self.config = config or make_sortformer_117m_config()
        if params is not None:
            self.params = dict(params)
        else:
            self.params = load_params(
                P.sortformer_spec(self.config), weights_path, seed=seed,
                warn=lambda m: print(f"[parakeet] {m}"),
            )
        self._stream_session: StreamingEncoderSession | None = None

    def to_gpu(self) -> None:
        """API-compatibility no-op (reference: move weights to Metal GPU).
        JAX places arrays on the default device (the TPU) automatically."""

    def forward(self, features) -> jnp.ndarray:
        return sortformer_forward(self.params, jnp.asarray(features), cfg=self.config)

    def diarize(self, features) -> list[DiarizationSegment]:
        probs = np.asarray(self.forward(features))[0]  # (T, S)
        return probs_to_segments(probs, self.config.activity_threshold)

    def extract_embeddings(self, features) -> tuple[np.ndarray, list[bool]]:
        """(max_speakers, D) L2-normalized speaker embeddings + active
        flags for one utterance (reference Tier-3 roadmap item: "Speaker
        embedding extraction — speaker verification from Sortformer
        intermediate layers"). Compare utterances by cosine similarity."""
        hidden, probs = sortformer_states(
            self.params, jnp.asarray(features), cfg=self.config
        )
        return speaker_embeddings(
            np.asarray(hidden)[0], np.asarray(probs)[0],
            activity_threshold=self.config.activity_threshold,
        )

    # ── Streaming (sortformer.cpp:125-150) ───────────────────────────────

    def reset_stream(self) -> None:
        self._stream_session = None

    def diarize_chunk(self, features, aosc: AOSCCache) -> list[DiarizationSegment]:
        """Process a feature chunk; returns this chunk's segments."""
        if self._stream_session is None:
            self._stream_session = StreamingEncoderSession(
                self.params, self.config.nest_encoder, batch=1, prefix="nest_encoder_"
            )
        enc = self._stream_session.forward_chunk(np.asarray(features))
        if enc is None:
            return []
        probs = np.asarray(_sortformer_tail(self.params, enc, cfg=self.config))[0]
        aosc.update(probs)
        return probs_to_segments(probs, self.config.activity_threshold)


__all__ = [
    "AOSCCache",
    "DiarizationSegment",
    "Sortformer",
    "probs_to_segments",
    "sortformer_forward",
    "sortformer_logits",
    "sortformer_states",
    "speaker_embeddings",
]

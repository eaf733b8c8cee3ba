"""RNNT/TDT prediction network and joint networks.

Reference: RNNTPrediction (src/rnnt.cpp:9-28) = Embedding → LSTM → Dropout
(no-op at inference); RNNTJoint (rnnt.cpp:32-44) =
relu(enc_proj(enc) + pred_proj(pred)) → out_proj → log_softmax, pred_proj
bias-free; TDTJoint (src/tdt.cpp:9-24) shares the hidden and splits into
label_proj (vocab) + duration_proj (n_durations) heads.

SOS is the blank token id (NeMo `_SOS = blank`, noted at tdt.cpp:56-59):
feeding `blank` selects the blank row of the embedding as the start state.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from parakeet_tpu.ops.layers import embedding, linear
from parakeet_tpu.ops.lstm import lstm_forward, lstm_step, lstm_zero_state
from parakeet_tpu.params import Params

_F32 = jnp.float32


def prediction_step(
    p: Params, token: jnp.ndarray, lstm_state: jnp.ndarray, num_lstm_layers: int
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """One decode step: token (B,) int32 → ((B, pred_hidden), new_state)."""
    x = embedding(p.sub("embed_"), token)
    return lstm_step(p.sub("lstm_"), x, lstm_state, num_lstm_layers)


def prediction_forward(
    p: Params, labels: jnp.ndarray, lstm_state: jnp.ndarray, num_lstm_layers: int
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Sequence forward: labels (B, U) int32 → ((B, U, pred_hidden), state)."""
    x = embedding(p.sub("embed_"), labels)
    return lstm_forward(p.sub("lstm_"), x, lstm_state, num_lstm_layers)


def prediction_zero_state(num_lstm_layers: int, batch: int, pred_hidden: int, dtype=_F32):
    return lstm_zero_state(num_lstm_layers, batch, pred_hidden, dtype)


def joint_encoder_projection(p: Params, enc: jnp.ndarray) -> jnp.ndarray:
    """Precompute enc_proj over all frames: (B, T, enc_h) → (B, T, joint_h).

    The reference evaluates enc_proj once per decode STEP (rnnt.cpp:40);
    hoisting it out of the decode loop is numerically identical (row-wise
    matmul) and turns a per-iteration matmul into one large MXU op."""
    return linear(p.sub("enc_proj_"), enc)


def rnnt_joint(p: Params, enc: jnp.ndarray, pred: jnp.ndarray) -> jnp.ndarray:
    """(…, enc_h) × (…, pred_h) → (…, V) log-probs (rnnt.cpp:38-44)."""
    hidden = jax.nn.relu(linear(p.sub("enc_proj_"), enc) + linear(p.sub("pred_proj_"), pred))
    return jax.nn.log_softmax(linear(p.sub("out_proj_"), hidden).astype(_F32), axis=-1)


def rnnt_joint_precomputed(p: Params, enc_pre: jnp.ndarray, pred: jnp.ndarray) -> jnp.ndarray:
    """rnnt_joint with enc_proj already applied (joint_encoder_projection)."""
    hidden = jax.nn.relu(enc_pre + linear(p.sub("pred_proj_"), pred))
    return jax.nn.log_softmax(linear(p.sub("out_proj_"), hidden).astype(_F32), axis=-1)


def tdt_joint(
    p: Params, enc: jnp.ndarray, pred: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(…, enc_h) × (…, pred_h) → ((…, V), (…, D)) log-probs (tdt.cpp:15-24)."""
    hidden = jax.nn.relu(linear(p.sub("enc_proj_"), enc) + linear(p.sub("pred_proj_"), pred))
    label_lp = jax.nn.log_softmax(linear(p.sub("label_proj_"), hidden).astype(_F32), axis=-1)
    dur_lp = jax.nn.log_softmax(linear(p.sub("duration_proj_"), hidden).astype(_F32), axis=-1)
    return label_lp, dur_lp


def tdt_joint_precomputed(
    p: Params, enc_pre: jnp.ndarray, pred: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """tdt_joint with enc_proj already applied (joint_encoder_projection)."""
    hidden = jax.nn.relu(enc_pre + linear(p.sub("pred_proj_"), pred))
    label_lp = jax.nn.log_softmax(linear(p.sub("label_proj_"), hidden).astype(_F32), axis=-1)
    dur_lp = jax.nn.log_softmax(linear(p.sub("duration_proj_"), hidden).astype(_F32), axis=-1)
    return label_lp, dur_lp


__all__ = [
    "prediction_step",
    "prediction_forward",
    "prediction_zero_state",
    "rnnt_joint",
    "tdt_joint",
]

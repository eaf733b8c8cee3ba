"""CTC training step (TPU-native capability beyond the reference).

The reference is inference-only; this module adds a sharded CTC training
step so the framework can fine-tune the FastConformer+CTC stack on a
device mesh: data parallelism over the batch axis, tensor parallelism over
FFN/attention-head dims (parallel/mesh.py rules), XLA inserting the ICI
collectives (psum of gradients falls out of the sharded matmuls +
jit partitioning).

Loss: optax.ctc_loss over the jitted encoder+CTC forward.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp
import optax

from parakeet_tpu.config import TDTCTCConfig
from parakeet_tpu.models.ctc import ctc_log_probs
from parakeet_tpu.models.encoder import encoded_lengths, fastconformer_encode
from parakeet_tpu.parallel.mesh import batch_sharding, make_mesh, shard_params
from parakeet_tpu.params import Params


@dataclass
class TrainState:
    params: dict
    opt_state: object
    step: int = 0


def ctc_forward(params: dict, cfg, feats: jnp.ndarray, mel_lengths: jnp.ndarray):
    """(B, T, mel) → (B, T', V) log-probs + (B,) encoder lengths."""
    root = Params(params)
    enc = fastconformer_encode(root.sub("encoder_"), cfg.encoder, feats, mel_lengths)
    lp = ctc_log_probs(root.sub("ctc_decoder_"), enc)
    return lp, jnp.minimum(encoded_lengths(mel_lengths), lp.shape[1])


def ctc_loss_fn(params, cfg, batch, blank_id: int):
    feats, mel_lengths, labels, label_lengths = (
        batch["features"],
        batch["mel_lengths"],
        batch["labels"],
        batch["label_lengths"],
    )
    log_probs, enc_lens = ctc_forward(params, cfg, feats, mel_lengths)
    t = log_probs.shape[1]
    u = labels.shape[1]
    logit_pad = (jnp.arange(t)[None, :] >= enc_lens[:, None]).astype(jnp.float32)
    label_pad = (jnp.arange(u)[None, :] >= label_lengths[:, None]).astype(jnp.float32)
    per_seq = optax.ctc_loss(log_probs, logit_pad, labels, label_pad, blank_id=blank_id)
    return jnp.mean(per_seq)


def make_train_step(cfg: TDTCTCConfig, optimizer: optax.GradientTransformation, blank_id=None):
    """Jitted (params, opt_state, batch) → (params, opt_state, loss)."""
    if blank_id is None:
        blank_id = cfg.ctc_vocab_size - 1

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, batch):
        loss, grads = jax.value_and_grad(ctc_loss_fn)(params, cfg, batch, blank_id)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step


def make_sharded_trainer(
    cfg: TDTCTCConfig,
    params: dict,
    mesh=None,
    *,
    learning_rate: float = 1e-4,
    model_parallel: int = 1,
):
    """Set up a mesh-sharded trainer: params placed per TP rules, batches
    sharded over 'data'. Returns (mesh, state, step_fn, place_batch)."""
    if mesh is None:
        mesh = make_mesh(model_parallel=model_parallel)
    optimizer = optax.adamw(learning_rate)
    with mesh:
        sharded = shard_params(params, mesh)
        opt_state = jax.jit(optimizer.init)(sharded)
        step = make_train_step(cfg, optimizer)

    def place_batch(batch: dict) -> dict:
        out = {}
        for k, v in batch.items():
            arr = jnp.asarray(v)
            out[k] = jax.device_put(arr, batch_sharding(mesh, arr.ndim))
        return out

    return mesh, TrainState(sharded, opt_state), step, place_batch


def synthetic_batch(cfg: TDTCTCConfig, batch: int, mel_frames: int, max_labels: int, seed=0):
    rng = np.random.RandomState(seed)
    vocab = cfg.ctc_vocab_size - 1  # labels exclude blank
    return {
        "features": rng.randn(batch, mel_frames, cfg.encoder.mel_bins).astype(np.float32),
        "mel_lengths": np.full((batch,), mel_frames, np.int32),
        "labels": rng.randint(0, vocab, size=(batch, max_labels)).astype(np.int32),
        "label_lengths": np.full((batch,), max_labels, np.int32),
    }


__all__ = [
    "TrainState",
    "ctc_forward",
    "ctc_loss_fn",
    "make_train_step",
    "make_sharded_trainer",
    "synthetic_batch",
]

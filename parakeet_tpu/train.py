"""Training steps (TPU-native capability beyond the reference).

The reference is inference-only; this module adds sharded training steps
so the framework can fine-tune every stack it serves on a device mesh:
data parallelism over the batch axis, tensor parallelism over
FFN/attention-head dims (parallel/mesh.py rules), XLA inserting the ICI
collectives (psum of gradients falls out of the sharded matmuls +
jit partitioning).

Losses:
- CTC: optax.ctc_loss over the jitted encoder+CTC forward.
- RNNT / TDT: the lattice losses in ops/transducer_loss.py over the full
  (B, T', U+1) joint — the training-time counterparts of the greedy
  decoders in decode/transducer.py (inference semantics: src/rnnt.cpp,
  src/tdt.cpp). The joint tensor is the memory hot spot
  (B·T'·(U+1)·V f32); transducer_loss_fn wraps the joint in
  jax.checkpoint so backward rematerializes it instead of storing the
  post-ReLU hidden, and the classic mitigations (smaller B·U tiles, label
  bucketing) compose on top.
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
from parakeet_tpu.models.rnnt import (
    prediction_forward,
    prediction_zero_state,
    rnnt_joint,
    tdt_joint,
)
from parakeet_tpu.ops.transducer_loss import rnnt_loss, tdt_loss
from parakeet_tpu.parallel.mesh import (
    activation_sharding,
    batch_sharding,
    make_mesh,
    shard_params,
)
from parakeet_tpu.params import Params


@dataclass
class TrainState:
    params: dict
    opt_state: object
    step: int = 0


def ctc_forward(
    params: dict, cfg, feats: jnp.ndarray, mel_lengths: jnp.ndarray, act_sharding=None,
    remat: bool = False,
):
    """(B, T, mel) → (B, T', V) log-probs + (B,) encoder lengths.

    act_sharding: optional (B, T, D) NamedSharding for sequence-parallel
    encoding (parallel.mesh.activation_sharding).
    remat: rematerialize each conformer block in backward (see
    fastconformer_encode)."""
    root = Params(params)
    enc = fastconformer_encode(
        root.sub("encoder_"), cfg.encoder, feats, mel_lengths,
        act_sharding=act_sharding, remat=remat,
    )
    lp = ctc_log_probs(root.sub("ctc_decoder_"), enc)
    return lp, jnp.minimum(encoded_lengths(mel_lengths), lp.shape[1])


def ctc_loss_from_log_probs(log_probs, enc_lens, labels, label_lengths, blank_id: int):
    """Mean CTC NLL from (B, T', V) log-probs (shared by the plain and
    pipeline-parallel trainers)."""
    t = log_probs.shape[1]
    u = labels.shape[1]
    logit_pad = (jnp.arange(t)[None, :] >= enc_lens[:, None]).astype(jnp.float32)
    label_pad = (jnp.arange(u)[None, :] >= label_lengths[:, None]).astype(jnp.float32)
    per_seq = optax.ctc_loss(log_probs, logit_pad, labels, label_pad, blank_id=blank_id)
    return jnp.mean(per_seq)


def ctc_loss_fn(params, cfg, batch, blank_id: int, act_sharding=None, remat: bool = False):
    feats, mel_lengths, labels, label_lengths = (
        batch["features"],
        batch["mel_lengths"],
        batch["labels"],
        batch["label_lengths"],
    )
    log_probs, enc_lens = ctc_forward(params, cfg, feats, mel_lengths, act_sharding, remat=remat)
    return ctc_loss_from_log_probs(log_probs, enc_lens, labels, label_lengths, blank_id)


def transducer_forward(
    params: dict,
    cfg,
    feats: jnp.ndarray,
    mel_lengths: jnp.ndarray,
    labels: jnp.ndarray,
    *,
    loss: str = "tdt",
    joint_prefix: str | None = None,
    act_sharding=None,
    remat: bool = False,
):
    """Full-lattice transducer forward for training.

    (B, T, mel) features + (B, U) labels → joint log-probs over every
    (frame, label-prefix) pair: TDT → ((B, T', U+1, V), (B, T', U+1, D));
    RNNT → (B, T', U+1, V). Also returns (B,) encoder lengths.

    The prediction net consumes [SOS=blank; labels] (NeMo convention,
    tdt.cpp:56-59) so row u conditions on the first u labels.
    """
    root = Params(params)
    enc = fastconformer_encode(
        root.sub("encoder_"), cfg.encoder, feats, mel_lengths,
        act_sharding=act_sharding, remat=remat,
    )
    out = transducer_lattice(params, cfg, enc, labels, loss=loss, joint_prefix=joint_prefix)
    enc_lens = jnp.minimum(encoded_lengths(mel_lengths), enc.shape[1])
    return out, enc_lens


def transducer_lattice(
    params: dict,
    cfg,
    enc: jnp.ndarray,
    labels: jnp.ndarray,
    *,
    loss: str = "tdt",
    joint_prefix: str | None = None,
):
    """Prediction net + joint over a precomputed (B, T', H) encoding —
    the head half of `transducer_forward`, shared with the
    pipeline-parallel trainer (which encodes via parallel/pipeline.py)."""
    if joint_prefix is None:
        # resolve from the weight schema: the tdt-ctc-110m family keys its
        # TDT joint "tdt_joint_", the 600m presets key theirs "joint_"
        # (params.py tdt_spec/rnnt_spec) — sniff for the head this loss
        # needs so every preset trains without explicit plumbing
        head = "label_proj_" if loss == "tdt" else "out_proj_"
        prefs = ("tdt_joint_", "joint_") if loss == "tdt" else ("joint_", "tdt_joint_")
        joint_prefix = next(
            (p for p in prefs if f"{p}.{head}.weight" in params), prefs[0]
        )
    root = Params(params)
    b = labels.shape[0]
    blank = cfg.joint.vocab_size - 1
    sos = jnp.full((b, 1), blank, jnp.int32)
    pred_in = jnp.concatenate([sos, labels.astype(jnp.int32)], axis=1)  # (B, U+1)
    state0 = prediction_zero_state(
        cfg.prediction.num_lstm_layers, b, cfg.prediction.pred_hidden, enc.dtype
    )
    pred, _ = prediction_forward(
        root.sub("prediction_"), pred_in, state0, cfg.prediction.num_lstm_layers
    )
    jp = root.sub(joint_prefix)
    enc_b = enc[:, :, None, :]  # (B, T', 1, H)
    pred_b = pred[:, None, :, :]  # (B, 1, U+1, P)
    # enc_proj/pred_proj apply BEFORE the (T'×U+1) broadcast; only the
    # joint-hidden activation and the output head live on the full lattice.
    joint_fn = tdt_joint if loss == "tdt" else rnnt_joint
    return jax.checkpoint(lambda e, pr: joint_fn(jp, e, pr))(enc_b, pred_b)


def encoded_loss_fn(
    params: dict,
    cfg,
    enc: jnp.ndarray,
    enc_lens: jnp.ndarray,
    batch,
    *,
    loss: str = "hybrid",
    sigma: float = 0.0,
    ctc_weight: float = 0.3,
):
    """Training loss from a precomputed encoding (the heads-only half of
    the loss functions below). loss ∈ {'ctc','rnnt','tdt','hybrid'}.
    Used by the pipeline-parallel trainer, where the encoder runs under
    shard_map and must be computed exactly once."""
    labels, label_lengths = batch["labels"], batch["label_lengths"]
    root = Params(params)

    def _ctc():
        lp = ctc_log_probs(root.sub("ctc_decoder_"), enc)
        blank = cfg.ctc_vocab_size - 1
        return ctc_loss_from_log_probs(lp, enc_lens, labels, label_lengths, blank)

    def _transducer(kind):
        out = transducer_lattice(params, cfg, enc, labels, loss=kind)
        blank = cfg.joint.vocab_size - 1
        if kind == "tdt":
            lab_lp, dur_lp = out
            per_seq = tdt_loss(
                lab_lp, dur_lp, labels, enc_lens, label_lengths, blank,
                tuple(cfg.durations), sigma=sigma,
            )
        else:
            per_seq = rnnt_loss(out, labels, enc_lens, label_lengths, blank)
        return jnp.mean(per_seq)

    if loss == "ctc":
        return _ctc()
    if loss in ("rnnt", "tdt"):
        return _transducer(loss)
    if loss == "hybrid":
        return (1.0 - ctc_weight) * _transducer("tdt") + ctc_weight * _ctc()
    raise ValueError(f"unknown loss {loss!r}")


def transducer_loss_fn(
    params,
    cfg,
    batch,
    *,
    loss: str = "tdt",
    sigma: float = 0.0,
    joint_prefix: str | None = None,
    act_sharding=None,
    remat: bool = False,
):
    """Mean RNNT/TDT negative log-likelihood over a padded batch."""
    feats, mel_lengths, labels, label_lengths = (
        batch["features"],
        batch["mel_lengths"],
        batch["labels"],
        batch["label_lengths"],
    )
    out, enc_lens = transducer_forward(
        params, cfg, feats, mel_lengths, labels, loss=loss,
        joint_prefix=joint_prefix, act_sharding=act_sharding, remat=remat,
    )
    blank = cfg.joint.vocab_size - 1
    if loss == "tdt":
        lab_lp, dur_lp = out
        per_seq = tdt_loss(
            lab_lp, dur_lp, labels, enc_lens, label_lengths, blank,
            tuple(cfg.durations), sigma=sigma,
        )
    else:
        per_seq = rnnt_loss(out, labels, enc_lens, label_lengths, blank)
    return jnp.mean(per_seq)


def make_lr_schedule(
    learning_rate: float,
    *,
    schedule: str = "constant",
    warmup_steps: int = 0,
    decay_steps: int | None = None,
):
    """Learning-rate schedule for the trainers (resume-correct: schedules
    read the optimizer's step count, which checkpoints carry).

    - 'constant': flat lr, with an optional linear warmup from 0.
    - 'cosine': linear warmup to lr, cosine decay to 0 over decay_steps
      (required — pass the run's total steps).
    - 'noam': the Transformer inverse-sqrt schedule, peak lr at
      warmup_steps then lr·sqrt(warmup/step).
    """
    if schedule == "constant":
        if warmup_steps > 0:
            return optax.linear_schedule(0.0, learning_rate, warmup_steps)
        return learning_rate
    if schedule == "cosine":
        if not decay_steps or decay_steps < 2:
            raise ValueError(
                "cosine schedule needs decay_steps >= 2 (total steps; optax "
                f"requires warmup < total), got {decay_steps!r}"
            )
        # optax requires warmup < total; clamp so short smoke runs with a
        # fixed warmup (e.g. --steps 2 --warmup-steps 2) stay valid — but
        # a real run configured with warmup >= total steps is almost
        # certainly a mistake (it silently becomes all-warmup/no-decay),
        # so make the clamp loud instead of silent.
        warm = max(1, min(warmup_steps, decay_steps - 1))
        if warmup_steps >= decay_steps:
            import warnings

            warnings.warn(
                f"cosine schedule: warmup_steps={warmup_steps} >= "
                f"decay_steps={decay_steps}; clamping warmup to {warm}. "
                "If this is not a smoke run, fix the schedule "
                "(warmup should be a small fraction of total steps).",
                stacklevel=2,
            )
        return optax.warmup_cosine_decay_schedule(
            0.0, learning_rate, warm, decay_steps
        )
    if schedule == "noam":
        warm = max(warmup_steps, 1)

        def noam(count):
            step = jnp.maximum(count, 1).astype(jnp.float32)
            return learning_rate * jnp.minimum(step / warm, jnp.sqrt(warm / step))

        return noam
    raise ValueError(f"unknown schedule {schedule!r}")


def with_compute_dtype(loss_fn, compute_dtype):
    """Wrap a (params, batch) loss so the model runs in `compute_dtype`
    (e.g. bfloat16 — MXU-rate training) while the caller keeps f32 master
    params: the cast happens INSIDE the differentiated function, so
    gradients flow back to the f32 masters (cast's transpose is cast).
    Norm params stay f32 (params.cast_params), and the losses themselves
    already accumulate in f32 log-space."""
    if compute_dtype in (None, "float32", jnp.float32):
        return loss_fn
    from parakeet_tpu.ops import layers
    from parakeet_tpu.params import cast_params

    dt = jnp.bfloat16 if compute_dtype == "bfloat16" else jnp.dtype(compute_dtype)

    def f(params, batch):
        cp = cast_params(params, dt)
        cb = dict(batch, features=jnp.asarray(batch["features"]).astype(dt))
        # trace-time switch: f32-accumulating convs are not differentiable
        # in this jax version (the transpose conv rejects the mixed f32
        # cotangent / bf16 operand dtypes); bf16 training rounds conv
        # outputs like every other op. Inference paths are untouched.
        old = layers.get_conv_accum_f32()
        layers.set_conv_accum_f32(False)
        try:
            return loss_fn(cp, cb)
        finally:
            layers.set_conv_accum_f32(old)

    return f


def value_and_grad_accum(loss_fn, accum_steps: int = 1):
    """`jax.value_and_grad` over a (params, batch) loss — or, when
    accum_steps > 1, a `lax.scan` of per-chunk value_and_grads averaged
    into one (loss, grads) pair (gradient accumulation). The batch splits
    on its leading dim into equal chunks, so the averaged result equals the
    full-batch mean exactly, while backward peak memory drops to one
    chunk's activations + the running grad buffer."""
    if accum_steps <= 1:
        return jax.value_and_grad(loss_fn)

    def f(params, batch):
        from parakeet_tpu.models.encoder import fused_kernels_active

        if fused_kernels_active():
            # the loss (conformer blocks included) traces inside lax.scan;
            # a pallas_call in the scan body crashes this jax version's
            # lowering cache (CLAUDE.md) — fail loudly instead
            raise ValueError(
                "gradient accumulation scans the loss; disable the fused "
                "Pallas kernels first (set_fused_attention(False), "
                "set_fused_ffn(False), set_fused_block2(False), "
                "set_conv_layout('nch')) — they are inference-only levers"
            )
        n = accum_steps

        def split(v):
            if v.shape[0] % n:
                raise ValueError(
                    f"batch dim {v.shape[0]} not divisible by accum_steps={n}"
                )
            return v.reshape(n, v.shape[0] // n, *v.shape[1:])

        chunks = {k: split(jnp.asarray(v)) for k, v in batch.items()}

        def body(carry, chunk):
            lval, grads = jax.value_and_grad(loss_fn)(params, chunk)
            cl, cg = carry
            return (cl + lval / n, jax.tree.map(lambda a, b: a + b / n, cg, grads)), None

        zero = (jnp.zeros((), jnp.float32), jax.tree.map(jnp.zeros_like, params))
        (lval, grads), _ = jax.lax.scan(body, zero, chunks)
        return lval, grads

    return f


def make_transducer_train_step(
    cfg,
    optimizer: optax.GradientTransformation,
    *,
    loss: str = "tdt",
    sigma: float = 0.0,
    joint_prefix: str | None = None,
    act_sharding=None,
    remat: bool = False,
    accum_steps: int = 1,
    compute_dtype: str = "float32",
):
    """Jitted (params, opt_state, batch) → (params, opt_state, loss) for the
    RNNT/TDT stacks (loss='rnnt'|'tdt')."""
    if loss not in ("rnnt", "tdt"):
        raise ValueError(f"loss must be 'rnnt' or 'tdt', got {loss!r}")

    vag = value_and_grad_accum(
        with_compute_dtype(
            lambda p, b: transducer_loss_fn(
                p, cfg, b, loss=loss, sigma=sigma,
                joint_prefix=joint_prefix, act_sharding=act_sharding, remat=remat,
            ),
            compute_dtype,
        ),
        accum_steps,
    )

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, batch):
        lval, grads = vag(params, batch)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, lval

    return step


def hybrid_loss_fn(
    params,
    cfg: TDTCTCConfig,
    batch,
    *,
    ctc_weight: float = 0.3,
    sigma: float = 0.0,
    act_sharding=None,
    remat: bool = False,
):
    """(1-w)·TDT + w·CTC over the shared encoder — the training objective of
    the hybrid tdt-ctc checkpoints this framework's flagship preset serves
    (both heads share one encoder; XLA CSEs the duplicated encoder call
    inside the jitted step)."""
    tdt = transducer_loss_fn(
        params, cfg, batch, loss="tdt", sigma=sigma, act_sharding=act_sharding,
        remat=remat,
    )
    ctc = ctc_loss_fn(params, cfg, batch, cfg.ctc_vocab_size - 1, act_sharding, remat=remat)
    return (1.0 - ctc_weight) * tdt + ctc_weight * ctc


def make_hybrid_train_step(
    cfg: TDTCTCConfig,
    optimizer: optax.GradientTransformation,
    *,
    ctc_weight: float = 0.3,
    sigma: float = 0.0,
    act_sharding=None,
    remat: bool = False,
    accum_steps: int = 1,
    compute_dtype: str = "float32",
):
    """Jitted hybrid TDT+CTC train step (the flagship objective)."""
    vag = value_and_grad_accum(
        with_compute_dtype(
            lambda p, b: hybrid_loss_fn(
                p, cfg, b, ctc_weight=ctc_weight, sigma=sigma,
                act_sharding=act_sharding, remat=remat,
            ),
            compute_dtype,
        ),
        accum_steps,
    )

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, batch):
        lval, grads = vag(params, batch)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, lval

    return step


def make_train_step(
    cfg: TDTCTCConfig,
    optimizer: optax.GradientTransformation,
    blank_id=None,
    act_sharding=None,
    remat: bool = False,
    accum_steps: int = 1,
    compute_dtype: str = "float32",
):
    """Jitted (params, opt_state, batch) → (params, opt_state, loss)."""
    if blank_id is None:
        blank_id = cfg.ctc_vocab_size - 1

    vag = value_and_grad_accum(
        with_compute_dtype(
            lambda p, b: ctc_loss_fn(p, cfg, b, blank_id, act_sharding, remat=remat),
            compute_dtype,
        ),
        accum_steps,
    )

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, batch):
        loss, grads = vag(params, batch)
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
    seq_parallel: int = 1,
    loss: str = "ctc",
    sigma: float = 0.0,
    remat: bool = False,
    accum_steps: int = 1,
    sort_weight: float = 0.5,
    compute_dtype: str = "float32",
    schedule: str = "constant",
    warmup_steps: int = 0,
    decay_steps: int | None = None,
    clip_norm: float | None = None,
):
    """Set up a mesh-sharded trainer: params placed per TP rules, batches
    sharded over 'data'. loss ∈ {'ctc', 'rnnt', 'tdt', 'hybrid',
    'sortformer'} ('hybrid' = the flagship TDT+CTC objective; 'sortformer'
    = diarization Sort Loss + PIL, sort_weight applies). A mesh with a
    'seq' axis (> 1) — from make_mesh(seq_parallel=…) or given explicitly —
    additionally shards encoder activations over time (sequence
    parallelism; ASR objectives only).
    remat/accum_steps: training-memory levers (per-block rematerialization;
    gradient accumulation over equal batch chunks) — both numerically
    identical to the plain step. compute_dtype='bfloat16' runs the model
    at MXU rate while Adam keeps f32 master params (with_compute_dtype).
    schedule/warmup_steps/decay_steps: learning-rate schedule
    (make_lr_schedule) — resume-correct via the optimizer step count.
    clip_norm: global-norm gradient clipping before adamw.
    Returns (mesh, state, step_fn, place_batch)."""
    if mesh is None:
        mesh = make_mesh(model_parallel=model_parallel, seq_parallel=seq_parallel)
    act_sharding = activation_sharding(mesh)
    lr = make_lr_schedule(
        learning_rate, schedule=schedule, warmup_steps=warmup_steps,
        decay_steps=decay_steps,
    )
    optimizer = optax.adamw(lr)
    if clip_norm is not None:
        # NOTE: chaining changes the opt-state treedef, so checkpoints are
        # only resumable with the same clip setting (checkpoint.py's
        # treedef guard reports the mismatch)
        optimizer = optax.chain(optax.clip_by_global_norm(clip_norm), optimizer)
    mem = dict(remat=remat, accum_steps=accum_steps, compute_dtype=compute_dtype)
    if loss == "sortformer" and act_sharding is not None:
        raise ValueError("sequence parallelism is not supported for the sortformer objective")
    with mesh:
        # copy: the jitted step donates its params, and shard_params'
        # device_put can alias an already-placed array — never invalidate
        # the caller's dict
        sharded = shard_params({k: jnp.array(v, copy=True) for k, v in params.items()}, mesh)
        opt_state = jax.jit(optimizer.init)(sharded)
        if loss == "ctc":
            step = make_train_step(cfg, optimizer, act_sharding=act_sharding, **mem)
        elif loss == "hybrid":
            step = make_hybrid_train_step(cfg, optimizer, sigma=sigma, act_sharding=act_sharding, **mem)
        elif loss == "sortformer":
            step = make_sortformer_train_step(cfg, optimizer, sort_weight=sort_weight, **mem)
        else:
            step = make_transducer_train_step(
                cfg, optimizer, loss=loss, sigma=sigma, act_sharding=act_sharding, **mem
            )

    def place_batch(batch: dict) -> dict:
        out = {}
        for k, v in batch.items():
            arr = jnp.asarray(v)
            out[k] = jax.device_put(arr, batch_sharding(mesh, arr.ndim))
        return out

    return mesh, TrainState(sharded, opt_state), step, place_batch


# ─── Sortformer (diarization) training ──────────────────────────────────────
# The reference serves Sortformer inference-only; this trains it the way the
# Sortformer recipe does (arXiv:2409.06656): BCE on per-frame per-speaker
# activity, as a weighted hybrid of Sort Loss (targets ordered by arrival
# time — the model's output channels are arrival-ordered by construction)
# and PIL (min BCE over all speaker permutations; S=4 → 24, enumerable).


def sort_speakers_by_arrival(targets: jnp.ndarray) -> jnp.ndarray:
    """(B, T, S) 0/1 activity → channels reordered by each speaker's first
    active frame (never-active speakers last, original order preserved on
    ties — argsort is stable)."""
    t = targets.shape[1]
    active = targets > 0.5
    first = jnp.where(active.any(axis=1), jnp.argmax(active, axis=1), t)  # (B, S)
    order = jnp.argsort(first, axis=1, stable=True)
    return jnp.take_along_axis(targets, order[:, None, :], axis=2)


def sortformer_bce(logits: jnp.ndarray, targets: jnp.ndarray, frame_mask: jnp.ndarray) -> jnp.ndarray:
    """Per-sequence mean sigmoid BCE over valid frames: (B, T, S) logits ×
    targets, (B, T) mask → (B,)."""
    per = optax.sigmoid_binary_cross_entropy(logits, targets)  # (B, T, S)
    per = per * frame_mask[:, :, None]
    denom = jnp.maximum(frame_mask.sum(axis=1), 1.0) * targets.shape[-1]
    return per.sum(axis=(1, 2)) / denom


def sortformer_loss_fn(
    params: dict,
    cfg,
    batch,
    *,
    sort_weight: float = 0.5,
    remat: bool = False,
):
    """sort_weight·SortLoss + (1-sort_weight)·PIL over a padded batch.

    batch: features (B, mel_len, mel_bins), mel_lengths (B,), targets
    (B, T', S) 0/1 activity at the ENCODER frame rate (8× subsampled)."""
    from parakeet_tpu.models.sortformer import sortformer_logits

    feats, mel_lengths, targets = (
        batch["features"],
        batch["mel_lengths"],
        batch["targets"],
    )
    logits = sortformer_logits(
        params, feats, cfg=cfg, mel_lengths=mel_lengths, remat=remat
    )
    t = logits.shape[1]
    enc_lens = jnp.minimum(encoded_lengths(mel_lengths), t)
    mask = (jnp.arange(t)[None, :] < enc_lens[:, None]).astype(jnp.float32)
    tgt = targets[:, :t].astype(jnp.float32) * mask[:, :, None]

    total = 0.0
    if sort_weight > 0.0:
        total = total + sort_weight * sortformer_bce(
            logits, sort_speakers_by_arrival(tgt), mask
        )
    if sort_weight < 1.0:
        import itertools

        s = tgt.shape[-1]
        pil = jnp.stack(
            [sortformer_bce(logits, tgt[:, :, list(p)], mask)
             for p in itertools.permutations(range(s))],
            axis=1,
        ).min(axis=1)
        total = total + (1.0 - sort_weight) * pil
    return jnp.mean(total)


def make_sortformer_train_step(
    cfg,
    optimizer: optax.GradientTransformation,
    *,
    sort_weight: float = 0.5,
    remat: bool = False,
    accum_steps: int = 1,
    compute_dtype: str = "float32",
):
    """Jitted (params, opt_state, batch) → (params, opt_state, loss) for
    Sortformer diarization fine-tuning."""
    vag = value_and_grad_accum(
        with_compute_dtype(
            lambda p, b: sortformer_loss_fn(
                p, cfg, b, sort_weight=sort_weight, remat=remat
            ),
            compute_dtype,
        ),
        accum_steps,
    )

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, batch):
        lval, grads = vag(params, batch)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, lval

    return step


def synthetic_sortformer_batch(cfg, batch: int, mel_frames: int, seed=0):
    """Random mel features + block-structured 0/1 activity targets at the
    encoder frame rate (tests/dry runs; mirrors synthetic_batch)."""
    from parakeet_tpu.models.encoder import subsample_length

    rng = np.random.RandomState(seed)
    t = subsample_length(mel_frames)
    s = cfg.max_speakers
    targets = np.zeros((batch, t, s), np.float32)
    for b in range(batch):
        for k in range(rng.randint(1, s + 1)):
            start = rng.randint(0, max(1, t - 2))
            end = rng.randint(start + 1, t + 1)
            targets[b, start:end, k] = 1.0
    return {
        "features": rng.randn(batch, mel_frames, cfg.nest_encoder.mel_bins).astype(np.float32),
        "mel_lengths": np.full((batch,), mel_frames, np.int32),
        "targets": targets,
    }


def synthetic_batch(cfg, batch: int, mel_frames: int, max_labels: int, seed=0):
    rng = np.random.RandomState(seed)
    vocab = getattr(cfg, "ctc_vocab_size", cfg.joint.vocab_size) - 1  # labels exclude blank
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
    "ctc_loss_from_log_probs",
    "encoded_loss_fn",
    "transducer_lattice",
    "hybrid_loss_fn",
    "make_hybrid_train_step",
    "make_train_step",
    "make_sharded_trainer",
    "make_sortformer_train_step",
    "make_transducer_train_step",
    "sort_speakers_by_arrival",
    "sortformer_bce",
    "sortformer_loss_fn",
    "make_lr_schedule",
    "synthetic_batch",
    "synthetic_sortformer_batch",
    "transducer_forward",
    "transducer_loss_fn",
    "value_and_grad_accum",
    "with_compute_dtype",
]

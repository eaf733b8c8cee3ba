"""RNNT and TDT lattice losses (TPU-native training capability).

The reference (parakeet.cpp) is inference-only; its models were trained in
NeMo with the RNNT loss (Graves 2012) and the TDT loss (token-and-duration
transducer, Xu et al. 2023) respectively. This module provides both as
pure-JAX lattice DPs so the framework can fine-tune the transducer stacks
it serves (decode semantics: src/rnnt.cpp:56-177, src/tdt.cpp:36-210 —
the losses below are the training-time counterparts of those decoders).

TPU formulation
---------------
The RNNT forward variable obeys

    alpha[t, u] = logaddexp(alpha[t-1, u] + blank[t-1, u],
                            alpha[t, u-1] + emit[t, u-1])

The t-recurrence is a `lax.scan` over frames. The in-row u-recurrence is a
first-order linear recurrence in the (logaddexp, +) semiring,

    x[u] = c[u] ⊕ (x[u-1] ⊗ e[u]),

which we evaluate with `lax.associative_scan` over the composition of
semiring-affine maps (a, b) ↦ (a1⊗a2, b2 ⊕ (a2⊗b1)): O(log U) depth and
fully vectorized over (batch, u) instead of a serial Python loop — the
scan body is a handful of (B, U) VPU ops, so the whole loss is one fused
XLA while-loop over T.

TDT extends the lattice with duration-conditioned skips: a transition out
of (t, u) consumes d ∈ durations frames, where label emissions may use
d = 0 (the in-row recurrence above) and blank requires d ≥ 1. Lagged
cross-row contributions are carried in a rolling (d_max, B, U+1) pending
buffer inside the scan — contributions are accumulated into the slot that
lands d rows later, so the scan body never indexes earlier rows.

Both losses are exact (f32 lattice math), differentiable via JAX autodiff
through the scans, and verified against brute-force path enumeration and
finite-difference gradients (tests/test_transducer_loss.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_F32 = jnp.float32
# Finite -inf stand-in: logaddexp(-1e30, -1e30) has a well-defined gradient
# (0.5/0.5) where true -inf would give NaN through the max-subtraction.
_NEG = -1e30


def _semiring_affine_scan(a: jnp.ndarray, c: jnp.ndarray) -> jnp.ndarray:
    """Solve x[u] = c[u] ⊕ (x[u-1] + a[u]) over the last axis (x[-1] ≡ -inf).

    (⊕, +) = (logaddexp, add). Elements are affine maps x ↦ c ⊕ (a + x);
    prefix-composition via associative_scan yields x[u] directly because
    a[0] = -inf erases the phantom x[-1] term.
    """

    def combine(left, right):
        a1, b1 = left
        a2, b2 = right
        return a1 + a2, jnp.logaddexp(b2, a2 + b1)

    _, x = jax.lax.associative_scan(combine, (a, c), axis=-1)
    return x


def _gather_label_lp(log_probs: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """log_probs (B, T, U+1, V), labels (B, U) → emit (B, T, U) where
    emit[b, t, u] = log_probs[b, t, u, labels[b, u]]."""
    v = log_probs.shape[-1]
    safe = jnp.clip(labels, 0, v - 1).astype(jnp.int32)
    u = safe.shape[1]
    idx = jnp.broadcast_to(safe[:, None, :, None], log_probs[:, :, :u, :1].shape)
    return jnp.take_along_axis(log_probs[:, :, :u, :], idx, axis=3)[..., 0]


def rnnt_loss(
    log_probs: jnp.ndarray,
    labels: jnp.ndarray,
    frame_lengths: jnp.ndarray,
    label_lengths: jnp.ndarray,
    blank_id: int,
) -> jnp.ndarray:
    """Negative log-likelihood of the RNNT lattice (Graves 2012), per batch
    element.

    Args:
      log_probs: (B, T, U+1, V) joint log-softmax outputs (models.rnnt.rnnt_joint
        over all (frame, label-prefix) pairs).
      labels: (B, U) int32 target tokens (no blanks). Padding beyond
        label_lengths is ignored (it only feeds lattice columns the answer
        never reads).
      frame_lengths: (B,) valid encoder frames per element (1 ≤ · ≤ T).
      label_lengths: (B,) valid labels per element (0 ≤ · ≤ U).
      blank_id: blank token index in V.

    Returns: (B,) f32 — -log p(labels | encoder frames).
    """
    log_probs = log_probs.astype(_F32)
    b, t, u1, _ = log_probs.shape
    blank_lp = log_probs[..., blank_id]  # (B, T, U+1)
    emit_lp = _gather_label_lp(log_probs, labels)  # (B, T, U)

    # alpha row t=0: only d=0-style label emissions along the row.
    zeros = jnp.zeros((b, 1), _F32)
    alpha0 = jnp.concatenate([zeros, jnp.cumsum(emit_lp[:, 0, :], axis=-1)], axis=-1)

    # e[u] multiplies x[u-1]: the in-row emit out of column u-1. a[0] = -inf.
    neg_col = jnp.full((b, 1), _NEG, _F32)

    def row(alpha_prev, xs):
        blank_prev, emit_row = xs  # (B, U+1) at t-1, (B, U) at t
        c = alpha_prev + blank_prev
        a = jnp.concatenate([neg_col, emit_row], axis=-1)
        alpha = _semiring_affine_scan(a, c)
        return alpha, alpha

    xs = (
        jnp.moveaxis(blank_lp[:, : t - 1], 1, 0),  # rows t-1 = 0..T-2
        jnp.moveaxis(emit_lp[:, 1:], 1, 0),  # rows t = 1..T-1
    )
    _, rows = jax.lax.scan(row, alpha0, xs)
    alphas = jnp.concatenate([alpha0[None], rows], axis=0)  # (T, B, U+1)
    alphas = jnp.moveaxis(alphas, 0, 1)  # (B, T, U+1)

    t_last = jnp.clip(frame_lengths.astype(jnp.int32) - 1, 0, t - 1)
    u_last = jnp.clip(label_lengths.astype(jnp.int32), 0, u1 - 1)
    batch_ix = jnp.arange(b)
    ll = alphas[batch_ix, t_last, u_last] + blank_lp[batch_ix, t_last, u_last]
    return -ll


def tdt_loss(
    label_log_probs: jnp.ndarray,
    duration_log_probs: jnp.ndarray,
    labels: jnp.ndarray,
    frame_lengths: jnp.ndarray,
    label_lengths: jnp.ndarray,
    blank_id: int,
    durations: tuple[int, ...],
    sigma: float = 0.0,
) -> jnp.ndarray:
    """Negative log-likelihood of the TDT lattice (Xu et al., ICML 2023),
    per batch element — the training loss behind the tdt-ctc models this
    framework serves (decode counterpart: decode/transducer.py, tdt.cpp).

    Transitions out of lattice node (t, u), with per-node joint outputs
    label_lp (V) and dur_lp (len(durations)):

      token y_{u+1}, duration d  → (t+d, u+1), d ∈ durations (0 allowed)
      blank,        duration d  → (t+d, u),   d ∈ durations, d ≥ 1

    A path terminates by a blank that lands exactly on t = frame_length.
    `sigma` is the paper's logit under-normalization: subtracted from every
    token/blank log-prob inside the lattice (ignored at decode time).

    Args:
      label_log_probs: (B, T, U+1, V) from models.rnnt.tdt_joint.
      duration_log_probs: (B, T, U+1, D), D = len(durations).
      durations: the duration vocabulary, e.g. (0, 1, 2, 3, 4); must be
        sorted, unique, non-negative.

    Returns: (B,) f32.
    """
    if (not durations or list(durations) != sorted(set(durations))
            or durations[0] < 0):
        raise ValueError(f"durations must be sorted unique non-negative, got {durations}")
    label_log_probs = label_log_probs.astype(_F32) - sigma
    duration_log_probs = duration_log_probs.astype(_F32)
    b, t, u1, _ = label_log_probs.shape

    blank_lp = label_log_probs[..., blank_id]  # (B, T, U+1)
    emit_lp = _gather_label_lp(label_log_probs, labels)  # (B, T, U)

    has_d0 = durations[0] == 0
    d0_ix = 0 if has_d0 else None
    pos_durs = [(j, d) for j, d in enumerate(durations) if d >= 1]
    if not pos_durs:
        raise ValueError("durations must include at least one d >= 1 (blank advance)")
    d_max = max(d for _, d in pos_durs)

    neg_col = jnp.full((b, 1), _NEG, _F32)
    neg_row = jnp.full((1, b, u1), _NEG, _F32)

    def in_row(c, emit_row, dur_row):
        # d=0 label emissions: x[u] = c[u] ⊕ (x[u-1] + emit0[u-1])
        if not has_d0:
            return c
        e0 = emit_row + dur_row[:, :-1, d0_ix]  # (B, U): out of columns 0..U-1
        a = jnp.concatenate([neg_col, e0], axis=-1)
        return _semiring_affine_scan(a, c)

    def step(carry, xs):
        # pending[i] = cross-row contributions landing i rows from now
        # (slot 0 is consumed by the current row).
        pending = carry  # (d_max, B, U+1)
        blank_row, emit_row, dur_row = xs
        alpha = in_row(pending[0], emit_row, dur_row)

        # Schedule this row's outgoing d>=1 transitions.
        pending = jnp.concatenate([pending[1:], neg_row], axis=0)
        for j, d in pos_durs:
            dur_j = dur_row[..., j]  # (B, U+1)
            via_blank = alpha + blank_row + dur_j
            # label: (·, u) → (·+d, u+1): shift right along u.
            via_label = jnp.concatenate(
                [neg_col, alpha[:, :-1] + emit_row + dur_j[:, :-1]], axis=-1
            )
            pending = pending.at[d - 1].set(
                jnp.logaddexp(pending[d - 1], jnp.logaddexp(via_blank, via_label))
            )
        return pending, alpha

    xs = (
        jnp.moveaxis(blank_lp, 1, 0),
        jnp.moveaxis(emit_lp, 1, 0),
        jnp.moveaxis(duration_log_probs, 1, 0),
    )
    # Seed: alpha[0, 0] = 0 arrives via the slot row t=0 consumes.
    pending0 = jnp.full((d_max, b, u1), _NEG, _F32).at[0, :, 0].set(0.0)
    _, rows = jax.lax.scan(step, pending0, xs)
    alphas = jnp.moveaxis(rows, 0, 1)  # (B, T, U+1)

    # Termination: blank from (frame_length - d, U_valid) landing exactly on
    # frame_length, summed over d >= 1.
    t_len = frame_lengths.astype(jnp.int32)
    u_last = jnp.clip(label_lengths.astype(jnp.int32), 0, u1 - 1)
    batch_ix = jnp.arange(b)
    terms = []
    for j, d in pos_durs:
        t_src = t_len - d
        valid = t_src >= 0
        t_safe = jnp.clip(t_src, 0, t - 1)
        term = (
            alphas[batch_ix, t_safe, u_last]
            + blank_lp[batch_ix, t_safe, u_last]
            + duration_log_probs[batch_ix, t_safe, u_last, j]
        )
        terms.append(jnp.where(valid, term, _NEG))
    ll = jax.nn.logsumexp(jnp.stack(terms, axis=0), axis=0)
    return -ll


__all__ = ["rnnt_loss", "tdt_loss"]

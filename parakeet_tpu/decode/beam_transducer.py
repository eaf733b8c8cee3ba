"""Jitted batched TDT/RNNT beam search (capability beyond the reference's
greedy-only transducer decode, tdt.cpp:36-210 / rnnt.cpp:56-177).

Expansion-synchronous beam without prefix merging: every `lax.while_loop`
iteration advances ALL (batch × beam) hypotheses by exactly one transducer
decision — one batched prediction-LSTM step + joint — mirroring the greedy
loop's semantics per hypothesis (decode/transducer.py):

  * blank → parent LSTM state kept (blank restore), t += max(skip, 1)
  * non-blank → emit + feed back, zero-duration emissions capped at
    max_symbols with the same forced t += 1 anti-livelock
  * TDT durations: greedy argmax of the duration head (the head is
    label-independent, so duration choice never reorders label candidates);
    its log-prob joins the path score, so scores are true joint
    path log-probabilities and need no length normalization
  * RNNT ≡ TDT with durations=(0,)

Each iteration expands the top `expand_k` labels per live hypothesis
(finished/dead hypotheses contribute exactly one self-candidate), then
keeps the global top `beam_size` per batch element via `lax.top_k`. With
beam_size=1 the selected candidate is the label argmax, so the decode is
IDENTICAL to the greedy loop (asserted by tests). Hypotheses reaching the
same prefix by different alignments are NOT merged (standard no-merge
beam; merging needs content-addressed state, hostile to fixed-shape SPMD).

Everything stays on device until the final fetch; host code only unpacks
n-best lists.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

from parakeet_tpu.models.rnnt import (
    joint_encoder_projection,
    prediction_step,
    prediction_zero_state,
    rnnt_joint_precomputed,
    tdt_joint_precomputed,
)
from parakeet_tpu.params import Params

_F32 = jnp.float32
_DEAD = -1.0e30


@dataclass
class BeamHypothesis:
    tokens: list[int]
    score: float  # joint path log-probability
    frames: list[int]  # emission frame per token
    token_logprobs: list[float]  # raw label log-prob per emitted token


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_lstm_layers", "durations", "blank_id", "max_symbols",
        "max_out", "is_tdt", "joint_prefix", "beam_size", "expand_k",
    ),
)
def _beam_loop(
    params: dict,
    enc: jnp.ndarray,      # (B, T, H)
    enc_len: jnp.ndarray,  # (B,)
    *,
    num_lstm_layers: int,
    durations: tuple[int, ...],
    blank_id: int,
    max_symbols: int,
    max_out: int,
    is_tdt: bool,
    joint_prefix: str,
    beam_size: int,
    expand_k: int,
):
    b, t_max, _ = enc.shape
    k = beam_size
    m = expand_k
    root = Params(params)
    pred_p = root.sub("prediction_")
    joint_p = root.sub(joint_prefix)
    dur_arr = jnp.asarray(durations, jnp.int32)
    batch_ix = jnp.arange(b)[:, None]  # (B, 1)

    enc_pre = joint_encoder_projection(joint_p, enc)  # (B, T, J)
    # hidden_proj weight is (4H, H); derive H from the OUT dim — the in-dim
    # is halved for int4-packed (uint8) weights (quantize.py), so shape[1]
    # would build a wrong-sized LSTM state under quantize="int4"
    pred_hidden = params["prediction_.lstm_.cells_.0.hidden_proj_.weight"].shape[0] // 4

    lstm0 = prediction_zero_state(num_lstm_layers, b * k, pred_hidden)
    lhs = lstm0.shape  # (L, 2, B*K, H)
    state = dict(
        t=jnp.zeros((b, k), jnp.int32),
        token=jnp.full((b, k), blank_id, jnp.int32),
        # carried as (B, K, L, 2, H) so beam reordering is one gather
        lstm=jnp.transpose(lstm0.reshape(lhs[0], lhs[1], b, k, lhs[3]), (2, 3, 0, 1, 4)),
        sym=jnp.zeros((b, k), jnp.int32),
        # only beam 0 is live at start: avoids K duplicate root expansions
        score=jnp.full((b, k), _DEAD, _F32).at[:, 0].set(0.0),
        n_out=jnp.zeros((b, k), jnp.int32),
        out_tok=jnp.zeros((b, k, max_out), jnp.int32),
        out_frame=jnp.zeros((b, k, max_out), jnp.int32),
        out_lp=jnp.zeros((b, k, max_out), _F32),
    )

    def live(s):
        return (s["t"] < enc_len[:, None]) & (s["score"] > _DEAD / 2)

    def cond(s):
        return jnp.any(live(s))

    def body(s):
        t, token, sym, score = s["t"], s["token"], s["sym"], s["score"]
        active = live(s)  # (B, K)
        t_idx = jnp.clip(t, 0, t_max - 1)
        enc_pre_t = enc_pre[batch_ix, t_idx]  # (B, K, J)

        lstm_flat = jnp.transpose(s["lstm"], (2, 3, 0, 1, 4)).reshape(lhs)
        pred_flat, new_lstm_flat = prediction_step(
            pred_p, token.reshape(b * k), lstm_flat, num_lstm_layers
        )
        pred = pred_flat.reshape(b, k, -1)
        new_lstm = jnp.transpose(
            new_lstm_flat.reshape(lhs[0], lhs[1], b, k, lhs[3]), (2, 3, 0, 1, 4)
        )

        if is_tdt:
            label_lp, dur_lp = tdt_joint_precomputed(joint_p, enc_pre_t, pred)
            dur_idx = jnp.argmax(dur_lp, axis=-1)
            skip = dur_arr[jnp.clip(dur_idx, 0, len(durations) - 1)]  # (B, K)
            dur_bonus = jnp.take_along_axis(dur_lp, dur_idx[..., None], -1)[..., 0]
        else:
            label_lp = rnnt_joint_precomputed(joint_p, enc_pre_t, pred)
            skip = jnp.zeros((b, k), jnp.int32)
            dur_bonus = jnp.zeros((b, k), _F32)

        top_lp, top_tok = jax.lax.top_k(label_lp, m)  # (B, K, M)
        cand_live = score[..., None] + top_lp + dur_bonus[..., None]
        # finished/dead hypothesis → one self-candidate (slot 0), rest dead
        self_only = jnp.concatenate(
            [score[..., None], jnp.full((b, k, m - 1), _DEAD, _F32)], axis=-1
        ) if m > 1 else score[..., None]
        cand = jnp.where(active[..., None], cand_live, self_only)  # (B, K, M)

        sel_score, sel_ix = jax.lax.top_k(cand.reshape(b, k * m), k)  # (B, K)
        parent = sel_ix // m
        slot = sel_ix % m

        def by_parent(x, extra_dims=0):
            ix = parent.reshape(parent.shape + (1,) * extra_dims)
            return jnp.take_along_axis(x, ix, axis=1)

        t_p = by_parent(t)
        token_p = by_parent(token)
        sym_p = by_parent(sym)
        skip_p = by_parent(skip)
        n_out_p = by_parent(s["n_out"])
        lstm_p = jnp.take_along_axis(s["lstm"], parent[..., None, None, None], axis=1)
        lstm_n = jnp.take_along_axis(new_lstm, parent[..., None, None, None], axis=1)
        out_tok_p = by_parent(s["out_tok"], 1)
        out_frame_p = by_parent(s["out_frame"], 1)
        out_lp_p = by_parent(s["out_lp"], 1)
        expanded = by_parent(active)
        tok_sel = jnp.take_along_axis(
            jnp.take_along_axis(top_tok, parent[..., None], axis=1),
            slot[..., None], axis=2,
        )[..., 0]  # (B, K)
        lp_sel = jnp.take_along_axis(
            jnp.take_along_axis(top_lp, parent[..., None], axis=1),
            slot[..., None], axis=2,
        )[..., 0]  # (B, K) raw label log-prob of the selected expansion

        # greedy-loop semantics per selected expansion (transducer.py body)
        is_blank = tok_sel == blank_id
        emit = expanded & ~is_blank
        zero_dur = emit & (skip_p == 0)
        forced = zero_dur & (sym_p + 1 >= max_symbols)
        adv_blank = jnp.maximum(skip_p, 1)
        new_t = jnp.where(
            is_blank, t_p + adv_blank,
            jnp.where(skip_p > 0, t_p + skip_p, jnp.where(forced, t_p + 1, t_p)),
        )
        new_t = jnp.where(expanded, new_t, t_p)
        new_sym = jnp.where(expanded, jnp.where(zero_dur & ~forced, sym_p + 1, 0), sym_p)
        new_token = jnp.where(emit, tok_sel, token_p)
        keep = emit[..., None, None, None].astype(lstm_p.dtype)
        merged_lstm = lstm_n * keep + lstm_p * (1 - keep)  # blank restore

        idx = jnp.clip(n_out_p, 0, max_out - 1)
        k_ix = jnp.arange(k)[None, :]
        cur_tok = out_tok_p[batch_ix, k_ix, idx]
        cur_frame = out_frame_p[batch_ix, k_ix, idx]
        cur_lp = out_lp_p[batch_ix, k_ix, idx]
        out_tok = out_tok_p.at[batch_ix, k_ix, idx].set(
            jnp.where(emit, tok_sel, cur_tok)
        )
        out_frame = out_frame_p.at[batch_ix, k_ix, idx].set(
            jnp.where(emit, t_p, cur_frame)
        )
        out_lp = out_lp_p.at[batch_ix, k_ix, idx].set(
            jnp.where(emit, lp_sel, cur_lp)
        )

        return dict(
            t=new_t, token=new_token, lstm=merged_lstm, sym=new_sym,
            score=sel_score, n_out=n_out_p + emit.astype(jnp.int32),
            out_tok=out_tok, out_frame=out_frame, out_lp=out_lp,
        )

    final = jax.lax.while_loop(cond, body, state)
    return (
        final["out_tok"], final["out_frame"], final["out_lp"],
        final["n_out"], final["score"],
    )


def transducer_beam_decode(
    params: dict,
    enc: jnp.ndarray,
    *,
    num_lstm_layers: int,
    durations: tuple[int, ...] = (0, 1, 2, 3, 4),
    blank_id: int = 1024,
    max_symbols: int = 10,
    is_tdt: bool = True,
    joint_prefix: str = "tdt_joint_",
    enc_lengths=None,
    beam_size: int = 4,
    expand_k: int | None = None,
    n_best: int = 1,
    max_out: int | None = None,
) -> list[list[BeamHypothesis]]:
    """Beam-decode a batch; returns per-element n-best hypotheses
    (best first, scores = joint path log-probs)."""
    b, t_max, _ = enc.shape
    if enc_lengths is None:
        enc_lengths = jnp.full((b,), t_max, jnp.int32)
    else:
        enc_lengths = jnp.asarray(enc_lengths, jnp.int32)
    if expand_k is None:
        expand_k = min(beam_size + 1, 8)
    if max_out is None:
        # same capacity rule as the greedy loop: zero-duration emissions can
        # stack up to max_symbols per frame
        max_out = max(8, t_max * max_symbols)

    out_tok, out_frame, out_lp, n_out, score = _beam_loop(
        params, enc, enc_lengths,
        num_lstm_layers=num_lstm_layers, durations=tuple(durations),
        blank_id=blank_id, max_symbols=max_symbols, max_out=max_out,
        is_tdt=is_tdt, joint_prefix=joint_prefix,
        beam_size=beam_size, expand_k=expand_k,
    )
    out_tok = np.asarray(out_tok)
    out_frame = np.asarray(out_frame)
    out_lp = np.asarray(out_lp)
    n_out = np.asarray(n_out)
    score = np.asarray(score)

    results: list[list[BeamHypothesis]] = []
    for i in range(b):
        hyps = [
            BeamHypothesis(
                tokens=[int(t) for t in out_tok[i, j, : n_out[i, j]]],
                score=float(score[i, j]),
                frames=[int(f) for f in out_frame[i, j, : n_out[i, j]]],
                token_logprobs=[float(v) for v in out_lp[i, j, : n_out[i, j]]],
            )
            for j in range(out_tok.shape[1])
            if score[i, j] > _DEAD / 2
        ]
        hyps.sort(key=lambda h: -h.score)
        results.append(hyps[: max(1, n_best)])
    return results


__all__ = ["BeamHypothesis", "transducer_beam_decode"]

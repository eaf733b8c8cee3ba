"""Jitted batched TDT/RNNT greedy decode.

TPU-native redesign of the reference's scalar decode loops (tdt.cpp:36-210,
rnnt.cpp:56-177, eou.cpp:17-98). The reference evaluates one tiny joint per
step with a host `.item()` sync per decision; here the ENTIRE decode is one
`lax.while_loop` on device over the whole batch — every iteration is one
batched prediction-LSTM step + joint matmul (MXU work), and the only
host↔device crossing is the final result fetch (SURVEY §5.8's single sync
point).

Semantics parity (tdt.cpp:66-105):
  * SOS = blank (its embedding row is the start state)
  * blank emission → restore saved LSTM state, t += max(skip, 1)
  * non-blank → emit, feed token back; skip > 0 → t += skip; skip == 0 →
    another symbol on the same frame, capped at max_symbols_per_step
  * timestamps: start = t, end = min(t + max(skip, 1) - 1, len - 1),
    confidence = exp(unboosted label log-prob)
  * RNNT ≡ TDT with durations = (0,): blank advances by 1, non-blank stays.

One documented deviation: when max_symbols consecutive zero-duration
emissions occur on one frame, the reference re-enters its inner loop on the
same frame (tdt.cpp:64-105 can livelock); we force t += 1 there instead.

Batched: each batch element runs the state machine independently in
lockstep; finished elements (t ≥ len) are masked no-ops. Phrase boosting
(phrase_boost.cpp:180-258) rides along as dense trie arrays — see
parakeet_tpu/decode/phrase_boost.py.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

from parakeet_tpu.decode.timestamp import TimestampedToken
from parakeet_tpu.models.rnnt import (
    joint_encoder_projection,
    prediction_step,
    prediction_zero_state,
    rnnt_joint_precomputed,
    tdt_joint_precomputed,
)
from parakeet_tpu.ops.layers import anchor_quantized_weights, linear
from parakeet_tpu.params import Params

_F32 = jnp.float32


@dataclass
class TransducerResult:
    """Host-side decode output for one batch."""

    tokens: list[list[int]]
    timestamped: list[list[TimestampedToken]]
    # carry-over state for streaming (device arrays)
    last_token: jnp.ndarray  # (B,)
    lstm_state: jnp.ndarray  # (L, 2, B, H)
    boost_active: jnp.ndarray | None = None  # (B, N) bool


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_lstm_layers",
        "durations",
        "blank_id",
        "max_symbols",
        "max_out",
        "is_tdt",
        "joint_prefix",
        "boost_score",
        "clamp_end",
        "unroll",
    ),
)
def _decode_loop(
    params: dict,
    enc: jnp.ndarray,  # (B, T, H)
    enc_len: jnp.ndarray,  # (B,)
    init_token: jnp.ndarray,  # (B,)
    init_lstm: jnp.ndarray,  # (L, 2, B, Hp)
    boost_trans,  # (N, V) int32 or None
    boost_active0,  # (B, N) bool or None
    *,
    num_lstm_layers: int,
    durations: tuple[int, ...],
    blank_id: int,
    max_symbols: int,
    max_out: int,
    is_tdt: bool,
    joint_prefix: str,
    boost_score: float,
    clamp_end: bool = True,
    unroll: int = 1,
):
    b, t_max, _ = enc.shape
    root = Params(params)
    pred_p = root.sub("prediction_")
    joint_p = root.sub(joint_prefix)
    dur_arr = jnp.asarray(durations, dtype=jnp.int32)
    batch_ix = jnp.arange(b)
    use_boost = boost_trans is not None

    # Hoist the encoder-side joint projection out of the loop: one large
    # MXU matmul over all frames instead of a matmul per decode iteration
    # (numerically identical; the reference recomputes it per step).
    enc_pre = joint_encoder_projection(joint_p, enc)  # (B, T, joint_h)

    if use_boost:
        boost_reach = (boost_trans >= 0).astype(_F32)  # (N, V)

    state = dict(
        t=jnp.zeros((b,), jnp.int32),
        token=init_token.astype(jnp.int32),
        lstm=init_lstm,
        sym=jnp.zeros((b,), jnp.int32),
        n_out=jnp.zeros((b,), jnp.int32),
        # tok | start | end | bitcast(conf): ONE buffer so each iteration
        # commits its emission with ONE scatter instead of four — the loop
        # is per-iteration-latency-bound (TUNING.md "TDT decode"), so body
        # op count is the cost driver. Unpacked after the loop; outputs are
        # bit-identical (f32 conf round-trips through bitcast exactly).
        out_pack=jnp.zeros((b, max_out, 4), jnp.int32),
        boost_active=boost_active0,
    )

    def cond(s):
        return jnp.any(s["t"] < enc_len)

    def body(s):
        # `unroll` full state-machine steps per while_loop iteration: the
        # loop is SEQUENCING-bound (~60 µs/iter vs ~20 µs of body compute,
        # r3 trace), so fewer, fatter iterations cut wall time. A step is a
        # masked no-op for finished elements (active = t < len gates every
        # state change), so trailing over-steps are exact no-ops and the
        # result is bit-identical to unroll=1 (pinned by the oracle suite).
        for _ in range(unroll):
            s = _step(s)
        return s

    def _step(s):
        t, token, lstm, sym = s["t"], s["token"], s["lstm"], s["sym"]
        active = t < enc_len
        t_idx = jnp.clip(t, 0, t_max - 1)
        enc_pre_t = enc_pre[batch_ix, t_idx]  # (B, joint_h)

        # int8/int4 decoder weights: anchor the dequantize to the loop state
        # so LICM can't hoist it (anchor_quantized_weights docstring); no-op
        # for float weights.
        aroot = anchor_quantized_weights(root, t)
        pred_pa = aroot.sub("prediction_")
        joint_pa = aroot.sub(joint_prefix)

        pred, new_lstm = prediction_step(pred_pa, token, lstm, num_lstm_layers)
        if is_tdt:
            label_lp, dur_lp = tdt_joint_precomputed(joint_pa, enc_pre_t, pred)
            dur_idx = jnp.argmax(dur_lp, axis=-1).astype(jnp.int32)
            skip = dur_arr[jnp.clip(dur_idx, 0, len(durations) - 1)]
        else:
            label_lp = rnnt_joint_precomputed(joint_pa, enc_pre_t, pred)
            skip = jnp.zeros((b,), jnp.int32)

        if use_boost:
            # boosted token set = union of children of active trie nodes
            mask = (s["boost_active"].astype(_F32) @ boost_reach) > 0  # (B, V)
            if mask.shape[-1] < label_lp.shape[-1]:
                # vocab dim padded for TP sharding (parallel/mesh.py): pad
                # lanes carry -1e9 logits, never boosted/selected
                mask = jnp.pad(
                    mask, ((0, 0), (0, label_lp.shape[-1] - mask.shape[-1]))
                )
            select_lp = label_lp + boost_score * mask.astype(_F32)
        else:
            select_lp = label_lp

        tok_id = jnp.argmax(select_lp, axis=-1).astype(jnp.int32)
        raw_lp = label_lp[batch_ix, tok_id]  # unboosted → confidence

        is_blank = tok_id == blank_id
        emit = active & ~is_blank
        zero_dur = emit & (skip == 0)
        forced = zero_dur & (sym + 1 >= max_symbols)  # anti-livelock (see module doc)

        adv_blank = jnp.maximum(skip, 1)
        new_t = jnp.where(
            is_blank, t + adv_blank, jnp.where(skip > 0, t + skip, jnp.where(forced, t + 1, t))
        )
        new_t = jnp.where(active, new_t, t)
        new_sym = jnp.where(zero_dur & ~forced, sym + 1, 0)

        new_token = jnp.where(emit, tok_id, token)
        keep = emit.astype(lstm.dtype)[None, None, :, None]  # broadcast over (L,2,B,H)
        merged_lstm = new_lstm * keep + lstm * (1 - keep)

        # write the emission record: one packed (B, 4) row, one scatter
        idx = jnp.clip(s["n_out"], 0, max_out - 1)
        end_frame = t + jnp.maximum(skip, 1) - 1
        if clamp_end:
            # offline decode clamps to seq_len-1 (tdt.cpp:176-178); the
            # streaming chunk decode does not (eou.cpp:81-84)
            end_frame = jnp.minimum(end_frame, enc_len - 1)

        conf_bits = jax.lax.bitcast_convert_type(jnp.exp(raw_lp).astype(_F32), jnp.int32)
        row = jnp.stack([tok_id, t, end_frame, conf_bits], axis=-1)  # (B, 4)
        cur = s["out_pack"][batch_ix, idx]
        out_pack = s["out_pack"].at[batch_ix, idx].set(
            jnp.where(emit[:, None], row, cur)
        )

        new_s = dict(
            t=new_t,
            token=new_token,
            lstm=merged_lstm,
            sym=new_sym,
            n_out=s["n_out"] + emit.astype(jnp.int32),
            out_pack=out_pack,
            boost_active=s["boost_active"],
        )

        if use_boost:
            # advance trie on actual emission; root always active
            next_node = boost_trans.T[tok_id]  # (B, N): node n → child via tok
            valid = s["boost_active"] & (next_node >= 0)  # (B, N)
            n_nodes = boost_trans.shape[0]
            onehot = jax.nn.one_hot(jnp.clip(next_node, 0), n_nodes, dtype=_F32)  # (B,N,N)
            advanced = jnp.einsum("bn,bnm->bm", valid.astype(_F32), onehot) > 0
            advanced = advanced.at[:, 0].set(True)
            new_s["boost_active"] = jnp.where(emit[:, None], advanced, s["boost_active"])

        return new_s

    final = jax.lax.while_loop(cond, body, state)
    pack = final["out_pack"]
    return (
        pack[:, :, 0],
        pack[:, :, 1],
        pack[:, :, 2],
        jax.lax.bitcast_convert_type(pack[:, :, 3], _F32),
        final["n_out"],
        final["token"],
        final["lstm"],
        final["boost_active"],
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_lstm_layers",
        "durations",
        "blank_id",
        "max_symbols",
        "max_out",
        "is_tdt",
        "joint_prefix",
        "boost_score",
        "clamp_end",
        "window",
    ),
)
def _decode_loop_lookahead(
    params: dict,
    enc: jnp.ndarray,  # (B, T, H)
    enc_len: jnp.ndarray,  # (B,)
    init_token: jnp.ndarray,  # (B,)
    init_lstm: jnp.ndarray,  # (L, 2, B, Hp)
    boost_trans,  # (N, V) int32 or None
    boost_active0,  # (B, N) bool or None
    *,
    num_lstm_layers: int,
    durations: tuple[int, ...],
    blank_id: int,
    max_symbols: int,
    max_out: int,
    is_tdt: bool,
    joint_prefix: str,
    boost_score: float,
    clamp_end: bool = True,
    window: int = 8,
):
    """K-frame lookahead variant of `_decode_loop` (bit-identical outputs).

    The per-step loop is straggler-bound: every iteration is one tiny LSTM
    step + one single-frame joint, and the while_loop runs until the slowest
    batch element has visited all its frames. Here each iteration instead
    evaluates the joint over a `window`-frame lookahead (one slightly larger
    matmul — the streamed weights per iteration are unchanged, so the
    HBM-bound iteration cost is ~flat) and then chases through blank frames
    inside the window with statically-unrolled integer ops. Blank stretches
    advance `window` frames per iteration instead of one, roughly halving
    iteration count on speech-like emission densities.

    Correctness argument: between two emissions the prediction-LSTM inputs
    (last_token, lstm_state) are unchanged — the reference recomputes the
    same prediction output every step and restores state on blank
    (tdt.cpp:66-105) — so evaluating the joint for several upcoming frames
    against one prediction output is numerically identical to the per-step
    schedule. Each iteration commits at most ONE emission per element (an
    emission changes the prediction input, which requires a fresh LSTM step
    next iteration). Verified bit-identical against `_decode_loop` and the
    scalar oracle in tests/test_decode.py.
    """
    b, t_max, _ = enc.shape
    k = window
    root = Params(params)
    pred_p = root.sub("prediction_")
    joint_p = root.sub(joint_prefix)
    dur_arr = jnp.asarray(durations, dtype=jnp.int32)
    batch_ix = jnp.arange(b)
    use_boost = boost_trans is not None
    label_head = "label_proj_" if is_tdt else "out_proj_"

    enc_pre = joint_encoder_projection(joint_p, enc)  # (B, T, joint_h)

    if use_boost:
        boost_reach = (boost_trans >= 0).astype(_F32)  # (N, V)

    state = dict(
        t=jnp.zeros((b,), jnp.int32),
        token=init_token.astype(jnp.int32),
        lstm=init_lstm,
        sym=jnp.zeros((b,), jnp.int32),
        n_out=jnp.zeros((b,), jnp.int32),
        out_tok=jnp.zeros((b, max_out), jnp.int32),
        out_start=jnp.zeros((b, max_out), jnp.int32),
        out_end=jnp.zeros((b, max_out), jnp.int32),
        out_conf=jnp.zeros((b, max_out), _F32),
        boost_active=boost_active0,
    )

    def cond(s):
        return jnp.any(s["t"] < enc_len)

    def body(s):
        t, token, lstm, sym = s["t"], s["token"], s["lstm"], s["sym"]

        # Anchor quantized decoder weights to the loop state (see
        # anchor_quantized_weights); no-op for float weights.
        aroot = anchor_quantized_weights(root, t)
        pred_pa = aroot.sub("prediction_")
        joint_pa = aroot.sub(joint_prefix)

        # One prediction step per iteration, committed only on emission
        # (blank steps restore state, tdt.cpp:70 — i.e. never commit).
        pred, cand_lstm = prediction_step(pred_pa, token, lstm, num_lstm_layers)
        pred_pre = linear(joint_pa.sub("pred_proj_"), pred)  # (B, joint_h)

        # Joint over the K-frame lookahead window at per-element offsets.
        win_ix = jnp.clip(t[:, None] + jnp.arange(k)[None, :], 0, t_max - 1)  # (B, K)
        enc_w = jnp.take_along_axis(enc_pre, win_ix[:, :, None], axis=1)  # (B, K, J)
        hidden = jax.nn.relu(enc_w + pred_pre[:, None, :])
        label_lp = jax.nn.log_softmax(
            linear(joint_pa.sub(label_head), hidden).astype(_F32), axis=-1
        )  # (B, K, V)
        if is_tdt:
            dur_lp = jax.nn.log_softmax(
                linear(joint_pa.sub("duration_proj_"), hidden).astype(_F32), axis=-1
            )
            dur_idx = jnp.argmax(dur_lp, axis=-1).astype(jnp.int32)
            skip_w = dur_arr[jnp.clip(dur_idx, 0, len(durations) - 1)]  # (B, K)
        else:
            skip_w = jnp.zeros((b, k), jnp.int32)

        if use_boost:
            mask = (s["boost_active"].astype(_F32) @ boost_reach) > 0  # (B, V)
            select_lp = label_lp + boost_score * mask.astype(_F32)[:, None, :]
        else:
            select_lp = label_lp
        tok_w = jnp.argmax(select_lp, axis=-1).astype(jnp.int32)  # (B, K)
        lp_w = jnp.take_along_axis(label_lp, tok_w[:, :, None], axis=-1)[..., 0]  # unboosted
        blank_w = tok_w == blank_id

        # Chase through blanks inside the window (statically unrolled: each
        # blank advances off by max(skip,1) ≥ 1, so K steps always exit).
        off = jnp.zeros((b,), jnp.int32)
        found = jnp.zeros((b,), bool)
        e_off = jnp.zeros((b,), jnp.int32)
        for _ in range(k):
            scanning = (off < k) & (t + off < enc_len) & ~found
            oix = jnp.clip(off, 0, k - 1)[:, None]
            cur_blank = jnp.take_along_axis(blank_w, oix, axis=1)[:, 0]
            cur_skip = jnp.take_along_axis(skip_w, oix, axis=1)[:, 0]
            emit_now = scanning & ~cur_blank
            found = found | emit_now
            e_off = jnp.where(emit_now, off, e_off)
            off = jnp.where(scanning & cur_blank, off + jnp.maximum(cur_skip, 1), off)

        eix = jnp.clip(e_off, 0, k - 1)[:, None]
        e_tok = jnp.take_along_axis(tok_w, eix, axis=1)[:, 0]
        e_skip = jnp.take_along_axis(skip_w, eix, axis=1)[:, 0]
        e_lp = jnp.take_along_axis(lp_w, eix, axis=1)[:, 0]
        emitted = found
        e_t = t + e_off  # emission frame

        # Emission effects: sym counts consecutive zero-duration emissions on
        # one frame; any frame advance (incl. blanks chased before the
        # emission, i.e. e_off > 0) resets it.
        zero_dur = emitted & (e_skip == 0)
        pre_sym = jnp.where(e_off == 0, sym, 0)
        forced = zero_dur & (pre_sym + 1 >= max_symbols)  # anti-livelock (module doc)
        new_sym = jnp.where(zero_dur & ~forced, pre_sym + 1, 0)

        adv_emit = jnp.where(e_skip > 0, e_skip, jnp.where(forced, 1, 0))
        new_t = jnp.where(emitted, e_t + adv_emit, t + off)
        new_token = jnp.where(emitted, e_tok, token)
        keep = emitted.astype(lstm.dtype)[None, None, :, None]
        merged_lstm = cand_lstm * keep + lstm * (1 - keep)

        idx = jnp.clip(s["n_out"], 0, max_out - 1)
        end_frame = e_t + jnp.maximum(e_skip, 1) - 1
        if clamp_end:
            end_frame = jnp.minimum(end_frame, enc_len - 1)

        def wr(buf, val):
            cur = buf[batch_ix, idx]
            return buf.at[batch_ix, idx].set(jnp.where(emitted, val, cur))

        new_s = dict(
            t=new_t,
            token=new_token,
            lstm=merged_lstm,
            sym=new_sym,
            n_out=s["n_out"] + emitted.astype(jnp.int32),
            out_tok=wr(s["out_tok"], e_tok),
            out_start=wr(s["out_start"], e_t),
            out_end=wr(s["out_end"], end_frame),
            out_conf=wr(s["out_conf"], jnp.exp(e_lp)),
            boost_active=s["boost_active"],
        )

        if use_boost:
            next_node = boost_trans.T[e_tok]  # (B, N)
            valid = s["boost_active"] & (next_node >= 0)
            n_nodes = boost_trans.shape[0]
            onehot = jax.nn.one_hot(jnp.clip(next_node, 0), n_nodes, dtype=_F32)
            advanced = jnp.einsum("bn,bnm->bm", valid.astype(_F32), onehot) > 0
            advanced = advanced.at[:, 0].set(True)
            new_s["boost_active"] = jnp.where(emitted[:, None], advanced, s["boost_active"])

        return new_s

    final = jax.lax.while_loop(cond, body, state)
    return (
        final["out_tok"],
        final["out_start"],
        final["out_end"],
        final["out_conf"],
        final["n_out"],
        final["token"],
        final["lstm"],
        final["boost_active"],
    )


@jax.jit
def _pack_outputs(out_tok, out_start, out_end, out_conf, n_out):
    """Concatenate decode outputs into one (B, 4*max_out+1) int32 array so
    the host needs a single fetch; f32 confidences are bitcast to int32."""
    conf_bits = jax.lax.bitcast_convert_type(out_conf.astype(jnp.float32), jnp.int32)
    return jnp.concatenate(
        [out_tok.astype(jnp.int32), out_start.astype(jnp.int32),
         out_end.astype(jnp.int32), conf_bits,
         n_out.astype(jnp.int32)[:, None]], axis=1,
    )


def transducer_greedy_decode(
    params: dict,
    enc: jnp.ndarray,
    *,
    pred_hidden: int,
    num_lstm_layers: int,
    durations: tuple[int, ...] = (0, 1, 2, 3, 4),
    blank_id: int = 1024,
    max_symbols: int = 10,
    is_tdt: bool = True,
    joint_prefix: str = "tdt_joint_",
    enc_lengths=None,
    init_token=None,
    init_lstm=None,
    boost=None,  # (trans (N,V) int32, active0 (B,N) bool, boost_score)
    frame_offset: int = 0,
    max_out: int | None = None,
    clamp_end: bool = True,
    impl: str = "step",
    window: int = 8,
    unroll: int = 1,
) -> TransducerResult:
    """Run the jitted decode and unpack to host lists.

    frame_offset shifts reported timestamps (streaming chunks, eou.cpp:80-84).
    impl: "step" (default — one joint eval per while-iteration) or
    "lookahead" (K-frame joint window per iteration; see
    _decode_loop_lookahead). Both produce bit-identical results. Measured
    (TUNING.md "TDT decode"): the step loop is latency-bound and essentially
    flat in iteration count on this TPU; lookahead wins only ~5-8% on
    blank-dominant audio and loses up to 2x at dense emission rates, so
    step is the default and lookahead is opt-in for silence-heavy streams.
    """
    b, t_max, _ = enc.shape
    if enc_lengths is None:
        enc_lengths = jnp.full((b,), t_max, jnp.int32)
    else:
        enc_lengths = jnp.asarray(enc_lengths, jnp.int32)
    if init_token is None:
        init_token = jnp.full((b,), blank_id, jnp.int32)
    if init_lstm is None:
        init_lstm = prediction_zero_state(num_lstm_layers, b, pred_hidden)
    if max_out is None:
        max_out = max(8, t_max * max_symbols)

    if boost is not None:
        trans, active0, boost_score = boost
    else:
        trans, active0, boost_score = None, None, 0.0

    if impl == "lookahead":
        loop_fn = functools.partial(_decode_loop_lookahead, window=max(1, min(window, t_max)))
    elif impl == "step":
        # unroll: full state-machine steps per while_loop iteration (see
        # _decode_loop body — bit-identical, fewer sequencing-bound iters)
        loop_fn = functools.partial(_decode_loop, unroll=max(1, int(unroll)))
    else:
        raise ValueError(f"unknown decode impl {impl!r} (want 'lookahead' or 'step')")

    out_tok, out_start, out_end, out_conf, n_out, last_token, lstm, boost_active = loop_fn(
        params,
        enc,
        enc_lengths,
        init_token,
        init_lstm,
        trans,
        active0,
        num_lstm_layers=num_lstm_layers,
        durations=durations,
        blank_id=blank_id,
        max_symbols=max_symbols,
        max_out=max_out,
        is_tdt=is_tdt,
        joint_prefix=joint_prefix,
        boost_score=float(boost_score),
        clamp_end=clamp_end,
    )

    # ONE device→host fetch for all five outputs: on relay-attached TPUs
    # every fetch pays a full round trip (~25 ms here — TUNING.md), and
    # sequential per-array np.asarray calls made decode latency-bound for
    # streaming steps. Pack into a single int32 buffer on device
    # (confidence f32 rides as bitcast), fetch once, unpack with views.
    m = out_tok.shape[1]
    packed = np.asarray(_pack_outputs(out_tok, out_start, out_end, out_conf, n_out))
    out_tok = packed[:, :m]
    out_start = packed[:, m : 2 * m]
    out_end = packed[:, 2 * m : 3 * m]
    out_conf = np.ascontiguousarray(packed[:, 3 * m : 4 * m]).view(np.float32)
    n_out = packed[:, 4 * m]

    tokens: list[list[int]] = []
    timestamped: list[list[TimestampedToken]] = []
    for i in range(b):
        n = int(n_out[i])
        tokens.append(out_tok[i, :n].tolist())
        timestamped.append(
            [
                TimestampedToken(
                    int(out_tok[i, j]),
                    int(out_start[i, j]) + frame_offset,
                    int(out_end[i, j]) + frame_offset,
                    float(out_conf[i, j]),
                )
                for j in range(n)
            ]
        )
    return TransducerResult(tokens, timestamped, last_token, lstm, boost_active)


__all__ = ["transducer_greedy_decode", "TransducerResult"]

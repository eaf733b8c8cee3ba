"""Transducer beam search tests.

Three pillars:
  * beam_size=1 must be IDENTICAL to the greedy loop (tokens + emission
    frames) — the beam is a strict generalization of decode/transducer.py,
    whose semantics are pinned to tdt.cpp:36-210 by the greedy oracles.
  * a scalar Python oracle replays the expansion-synchronous algorithm
    (per-hypothesis batch-1 LSTM steps, numpy top-k with flat-index
    tie-breaking exactly like lax.top_k) and must agree with the jitted
    (batch × beam) loop on tokens, frames, and path scores.
  * n-best contract: descending scores, n_best cap, per-element lists.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from parakeet_tpu import config as C
from parakeet_tpu import params as P
from parakeet_tpu.decode.beam_transducer import transducer_beam_decode
from parakeet_tpu.decode.transducer import transducer_greedy_decode
from parakeet_tpu.models.rnnt import (
    joint_encoder_projection,
    prediction_step,
    prediction_zero_state,
    rnnt_joint_precomputed,
    tdt_joint_precomputed,
)
from parakeet_tpu.params import Params

VOCAB, ENC_H, PRED_H, NDUR = 13, 8, 16, 5
DURATIONS = (0, 1, 2, 3, 4)
BLANK = VOCAB - 1
_DEAD = -1.0e30


def small_model(seed, is_tdt=True, lstm_layers=1):
    pred_cfg = C.PredictionConfig(vocab_size=VOCAB, pred_hidden=PRED_H, num_lstm_layers=lstm_layers)
    joint_cfg = C.JointConfig(
        encoder_hidden=ENC_H, pred_hidden=PRED_H, joint_hidden=12, vocab_size=VOCAB
    )
    spec = P.prediction_spec(pred_cfg, "prediction_")
    if is_tdt:
        spec.update(P.tdt_joint_spec(joint_cfg, NDUR, "tdt_joint_"))
    else:
        spec.update(P.rnnt_joint_spec(joint_cfg, "joint_"))
    return P.init_params(spec, seed=seed)


def beam_oracle(
    params, enc_1, length, *, durations, blank, max_symbols, lstm_layers,
    is_tdt, joint_prefix, beam_size, expand_k,
):
    """Scalar replay of the expansion-synchronous beam for ONE utterance.

    Mirrors _beam_loop's body step by step with Python loops: every
    iteration expands each hypothesis independently (batch-1 LSTM step),
    builds the full (K, M) candidate matrix including the _DEAD fillers,
    and selects the global top K with lax.top_k's tie order (descending
    score, then ascending flat index).
    """
    k, m = beam_size, expand_k
    root = Params(params)
    pred_p = root.sub("prediction_")
    joint_p = root.sub(joint_prefix)
    t_max = enc_1.shape[0]
    enc_pre = np.asarray(joint_encoder_projection(joint_p, jnp.asarray(enc_1[None])))[0]
    dur = np.asarray(durations, np.int32)

    def new_hyp(score):
        return dict(
            t=0, token=blank, sym=0, score=np.float32(score),
            lstm=prediction_zero_state(lstm_layers, 1, PRED_H),
            toks=[], frames=[], lps=[],
        )

    hyps = [new_hyp(0.0 if j == 0 else _DEAD) for j in range(k)]

    def live(h):
        return h["t"] < length and h["score"] > _DEAD / 2

    while any(live(h) for h in hyps):
        cand_score = np.full((k, m), _DEAD, np.float32)
        cand_tok = np.zeros((k, m), np.int32)
        expansions = []
        for j, h in enumerate(hyps):
            t_idx = min(max(h["t"], 0), t_max - 1)
            pred, new_lstm = prediction_step(
                pred_p, jnp.asarray([h["token"]]), h["lstm"], lstm_layers
            )
            enc_t = jnp.asarray(enc_pre[t_idx][None])
            if is_tdt:
                label_lp, dur_lp = tdt_joint_precomputed(joint_p, enc_t, pred)
                dlp = np.asarray(dur_lp)[0]
                dur_idx = int(np.argmax(dlp))
                skip = int(dur[min(dur_idx, len(durations) - 1)])
                dur_bonus = np.float32(dlp[dur_idx])
            else:
                label_lp = rnnt_joint_precomputed(joint_p, enc_t, pred)
                skip, dur_bonus = 0, np.float32(0.0)
            lp = np.asarray(label_lp)[0]
            top = np.argsort(-lp, kind="stable")[:m]  # lax.top_k tie order
            expansions.append(dict(new_lstm=new_lstm, skip=skip, top=top, lp=lp))
            if live(h):
                cand_score[j, :] = h["score"] + lp[top].astype(np.float32) + dur_bonus
                cand_tok[j, :] = top
            else:
                cand_score[j, 0] = h["score"]

        flat = cand_score.reshape(-1)
        order = np.argsort(-flat, kind="stable")[:k]
        new_hyps = []
        for rank, flat_ix in enumerate(order):
            j, i = int(flat_ix) // m, int(flat_ix) % m
            h, e = hyps[j], expansions[j]
            expanded = live(h)
            nh = dict(
                t=h["t"], token=h["token"], sym=h["sym"],
                score=np.float32(flat[flat_ix]), lstm=h["lstm"],
                toks=list(h["toks"]), frames=list(h["frames"]),
                lps=list(h["lps"]),
            )
            if expanded:
                tok = int(cand_tok[j, i])
                skip = e["skip"]
                if tok == blank:
                    nh["t"] = h["t"] + max(skip, 1)
                    nh["sym"] = 0
                else:
                    nh["toks"].append(tok)
                    nh["frames"].append(h["t"])
                    nh["lps"].append(float(e["lp"][tok]))
                    nh["token"] = tok
                    nh["lstm"] = e["new_lstm"]
                    if skip > 0:
                        nh["t"] = h["t"] + skip
                        nh["sym"] = 0
                    elif h["sym"] + 1 >= max_symbols:  # forced anti-livelock
                        nh["t"] = h["t"] + 1
                        nh["sym"] = 0
                    else:
                        nh["sym"] = h["sym"] + 1
            new_hyps.append(nh)
        hyps = new_hyps

    out = [h for h in hyps if h["score"] > _DEAD / 2]
    out.sort(key=lambda h: -h["score"])
    return out


@pytest.mark.parametrize("seed", [0, 3, 7])
def test_beam1_equals_greedy_tdt(seed):
    params = small_model(seed, is_tdt=True)
    rng = np.random.RandomState(seed + 50)
    b, t_len = 3, 25
    enc = jnp.asarray(rng.randn(b, t_len, ENC_H).astype(np.float32))
    lengths = [t_len, t_len - 5, t_len - 11]
    kw = dict(
        num_lstm_layers=1, durations=DURATIONS, blank_id=BLANK,
        max_symbols=10, is_tdt=True, joint_prefix="tdt_joint_",
        enc_lengths=lengths,
    )
    greedy = transducer_greedy_decode(params, enc, pred_hidden=PRED_H, **kw)
    beam = transducer_beam_decode(params, enc, beam_size=1, **kw)
    for i in range(b):
        best = beam[i][0]
        assert best.tokens == greedy.tokens[i], f"batch {i}"
        assert best.frames == [t.start_frame for t in greedy.timestamped[i]]


def test_beam1_equals_greedy_rnnt():
    params = small_model(seed=2, is_tdt=False)
    rng = np.random.RandomState(52)
    enc = jnp.asarray(rng.randn(2, 18, ENC_H).astype(np.float32))
    kw = dict(
        num_lstm_layers=1, durations=(0,), blank_id=BLANK,
        max_symbols=10, is_tdt=False, joint_prefix="joint_",
    )
    greedy = transducer_greedy_decode(params, enc, pred_hidden=PRED_H, **kw)
    beam = transducer_beam_decode(params, enc, beam_size=1, **kw)
    for i in range(2):
        assert beam[i][0].tokens == greedy.tokens[i]


@pytest.mark.parametrize("seed,beam_size,expand_k", [(0, 2, 3), (1, 4, 5), (4, 3, 3)])
def test_beam_matches_scalar_oracle_tdt(seed, beam_size, expand_k):
    params = small_model(seed, is_tdt=True)
    rng = np.random.RandomState(seed + 77)
    t_len = 15
    enc = rng.randn(1, t_len, ENC_H).astype(np.float32)
    kw = dict(
        durations=DURATIONS, blank=BLANK, max_symbols=10, lstm_layers=1,
        is_tdt=True, joint_prefix="tdt_joint_",
    )
    expect = beam_oracle(
        params, enc[0], t_len, beam_size=beam_size, expand_k=expand_k, **kw
    )
    got = transducer_beam_decode(
        params, jnp.asarray(enc), num_lstm_layers=1, durations=DURATIONS,
        blank_id=BLANK, max_symbols=10, is_tdt=True, joint_prefix="tdt_joint_",
        beam_size=beam_size, expand_k=expand_k, n_best=beam_size,
    )[0]
    assert len(got) == len(expect)
    for g, e in zip(got, expect):
        assert g.tokens == e["toks"]
        assert g.frames == e["frames"]
        np.testing.assert_allclose(g.score, e["score"], rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(g.token_logprobs, e["lps"], rtol=1e-4, atol=1e-5)


def test_beam_matches_scalar_oracle_rnnt():
    params = small_model(seed=6, is_tdt=False)
    rng = np.random.RandomState(66)
    t_len = 12
    enc = rng.randn(1, t_len, ENC_H).astype(np.float32)
    expect = beam_oracle(
        params, enc[0], t_len, durations=(0,), blank=BLANK, max_symbols=10,
        lstm_layers=1, is_tdt=False, joint_prefix="joint_",
        beam_size=3, expand_k=4,
    )
    got = transducer_beam_decode(
        params, jnp.asarray(enc), num_lstm_layers=1, durations=(0,),
        blank_id=BLANK, max_symbols=10, is_tdt=False, joint_prefix="joint_",
        beam_size=3, expand_k=4, n_best=3,
    )[0]
    for g, e in zip(got, expect):
        assert g.tokens == e["toks"]
        np.testing.assert_allclose(g.score, e["score"], rtol=1e-4, atol=1e-4)


def test_beam_oracle_respects_lengths():
    """Padded batch: each element's beam must stop at its own length —
    verified by running the scalar oracle per element on the trimmed input."""
    params = small_model(seed=9, is_tdt=True)
    rng = np.random.RandomState(99)
    b, t_len = 3, 20
    enc = rng.randn(b, t_len, ENC_H).astype(np.float32)
    lengths = [20, 13, 6]
    got = transducer_beam_decode(
        params, jnp.asarray(enc), num_lstm_layers=1, durations=DURATIONS,
        blank_id=BLANK, max_symbols=10, is_tdt=True, joint_prefix="tdt_joint_",
        enc_lengths=lengths, beam_size=2, expand_k=3, n_best=2,
    )
    for i in range(b):
        expect = beam_oracle(
            params, enc[i], lengths[i], durations=DURATIONS, blank=BLANK,
            max_symbols=10, lstm_layers=1, is_tdt=True,
            joint_prefix="tdt_joint_", beam_size=2, expand_k=3,
        )
        for g, e in zip(got[i], expect):
            assert g.tokens == e["toks"], f"batch {i}"
            assert g.frames == e["frames"], f"batch {i}"


def test_nbest_contract():
    params = small_model(seed=12, is_tdt=True)
    rng = np.random.RandomState(120)
    enc = jnp.asarray(rng.randn(2, 16, ENC_H).astype(np.float32))
    res = transducer_beam_decode(
        params, enc, num_lstm_layers=1, durations=DURATIONS, blank_id=BLANK,
        max_symbols=10, is_tdt=True, joint_prefix="tdt_joint_",
        beam_size=4, n_best=2,
    )
    assert len(res) == 2
    for hyps in res:
        assert 1 <= len(hyps) <= 2
        scores = [h.score for h in hyps]
        assert scores == sorted(scores, reverse=True)
        for h in hyps:
            assert len(h.tokens) == len(h.frames)
            assert all(0 <= t < VOCAB for t in h.tokens)


def test_two_lstm_layers():
    params = small_model(seed=8, is_tdt=True, lstm_layers=2)
    rng = np.random.RandomState(88)
    t_len = 12
    enc = rng.randn(1, t_len, ENC_H).astype(np.float32)
    expect = beam_oracle(
        params, enc[0], t_len, durations=DURATIONS, blank=BLANK,
        max_symbols=10, lstm_layers=2, is_tdt=True, joint_prefix="tdt_joint_",
        beam_size=2, expand_k=3,
    )
    got = transducer_beam_decode(
        params, jnp.asarray(enc), num_lstm_layers=2, durations=DURATIONS,
        blank_id=BLANK, max_symbols=10, is_tdt=True, joint_prefix="tdt_joint_",
        beam_size=2, expand_k=3, n_best=2,
    )[0]
    for g, e in zip(got, expect):
        assert g.tokens == e["toks"]

"""Decode tests: CTC synthetic log-probs (reference test_all.cpp:759-872),
jitted transducer loop vs a scalar oracle that follows tdt.cpp:36-210 /
rnnt.cpp:56-177 step by step, trie mechanics (:1280-1365) and boosted
decode properties (:1369-1449)."""

import numpy as np
import jax.numpy as jnp
import pytest

from parakeet_tpu import config as C
from parakeet_tpu import params as P
from parakeet_tpu.decode.phrase_boost import (
    ContextTrie,
    ctc_greedy_decode_boosted,
)
from parakeet_tpu.decode.transducer import transducer_greedy_decode
from parakeet_tpu.models.ctc import ctc_greedy_decode, ctc_greedy_decode_with_timestamps
from parakeet_tpu.models.rnnt import (
    prediction_step,
    prediction_zero_state,
    rnnt_joint,
    tdt_joint,
)
from parakeet_tpu.params import Params
from parakeet_tpu.text.tokenizer import Tokenizer

BLANK = 9  # vocab 10 for CTC tests


def lp_frames(winners, vocab=10, win=0.0, lose=-10.0):
    """Hand-built log-prob frames where `winners[t]` wins argmax."""
    t = len(winners)
    lp = np.full((1, t, vocab), lose, np.float32)
    for i, w in enumerate(winners):
        lp[0, i, w] = win
    return lp


def test_ctc_all_blank():
    assert ctc_greedy_decode(lp_frames([BLANK] * 5), BLANK) == [[]]


def test_ctc_collapse_repeats():
    lp = lp_frames([3, 3, BLANK, 3, 5, 5, BLANK, BLANK, 7])
    assert ctc_greedy_decode(lp, BLANK) == [[3, 3, 5, 7]]


def test_ctc_batch_and_lengths():
    lp = np.concatenate([lp_frames([1, 1, 2, BLANK]), lp_frames([4, BLANK, 5, 5])])
    assert ctc_greedy_decode(lp, BLANK) == [[1, 2], [4, 5]]
    # Length-limited decode ignores pad frames
    assert ctc_greedy_decode(lp, BLANK, lengths=[2, 1]) == [[1], [4]]


def test_ctc_timestamps():
    lp = lp_frames([BLANK, 3, 3, BLANK, 5, BLANK])
    toks = ctc_greedy_decode_with_timestamps(lp, BLANK)[0]
    assert [(t.token_id, t.start_frame, t.end_frame) for t in toks] == [
        (3, 1, 2),
        (5, 4, 5),  # last token's end = T-1 (ctc.cpp:120-123)
    ]
    assert all(abs(t.confidence - 1.0) < 1e-6 for t in toks)


def test_ctc_timestamp_confidence():
    lp = lp_frames([2], win=-0.5)
    toks = ctc_greedy_decode_with_timestamps(lp, BLANK)[0]
    assert abs(toks[0].confidence - np.exp(-0.5)) < 1e-5


# ─── Transducer vs scalar oracle ────────────────────────────────────────────


VOCAB, ENC_H, PRED_H, NDUR = 13, 8, 16, 5
DURATIONS = (0, 1, 2, 3, 4)
TBLANK = VOCAB - 1


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


def oracle_decode(
    params, enc, durations, blank, max_symbols, lstm_layers, is_tdt, joint_prefix,
    trie=None, boost_score=0.0, vocab=VOCAB,
):
    """Scalar reference algorithm (tdt.cpp:36-210), one utterance."""
    root = Params(params)
    pred_p = root.sub("prediction_")
    joint_p = root.sub(joint_prefix)
    t_len = enc.shape[0]
    lstm = prediction_zero_state(lstm_layers, 1, PRED_H)
    token = blank
    t = 0
    out = []
    active = {0}
    while t < t_len:
        advanced = False
        for _sym in range(max_symbols):
            saved = lstm
            pred, lstm = prediction_step(pred_p, jnp.asarray([token]), lstm, lstm_layers)
            if is_tdt:
                label_lp, dur_lp = tdt_joint(joint_p, jnp.asarray(enc[t][None]), pred)
                dur_idx = int(np.argmax(np.asarray(dur_lp)[0]))
                skip = durations[dur_idx] if dur_idx < len(durations) else 1
            else:
                label_lp = rnnt_joint(joint_p, jnp.asarray(enc[t][None]), pred)
                skip = 0
            lp = np.asarray(label_lp)[0]
            if trie is not None:
                boosted = trie.get_boosted_tokens(active)
                sel = lp + boost_score * np.isin(np.arange(vocab), list(boosted))
            else:
                sel = lp
            tok = int(np.argmax(sel))
            if tok == blank:
                lstm = saved
                t += max(skip, 1) if is_tdt else 1
                advanced = True
                break
            conf = float(np.exp(lp[tok]))
            end = min(t + max(skip, 1) - 1, t_len - 1)
            out.append((tok, t, end, conf))
            if trie is not None:
                active = trie.advance(active, tok)
            token = tok
            if is_tdt and skip > 0:
                t += skip
                advanced = True
                break
        if not advanced:
            t += 1  # matches our documented anti-livelock deviation
    return out


def run_both(seed, is_tdt, lstm_layers=1, trie=None, boost_score=0.0, t_len=25, b=3, impl="lookahead"):
    joint_prefix = "tdt_joint_" if is_tdt else "joint_"
    params = small_model(seed, is_tdt, lstm_layers)
    rng = np.random.RandomState(seed + 100)
    enc = rng.randn(b, t_len, ENC_H).astype(np.float32)
    lengths = [t_len, t_len - 5, t_len - 11][:b]

    boost = None
    if trie is not None:
        boost = trie.device_boost(VOCAB, b, boost_score)

    res = transducer_greedy_decode(
        params,
        jnp.asarray(enc),
        pred_hidden=PRED_H,
        num_lstm_layers=lstm_layers,
        durations=DURATIONS if is_tdt else (0,),
        blank_id=TBLANK,
        max_symbols=10,
        is_tdt=is_tdt,
        joint_prefix=joint_prefix,
        enc_lengths=lengths,
        boost=boost,
        impl=impl,
    )

    for i in range(b):
        expect = oracle_decode(
            params, enc[i, : lengths[i]], DURATIONS, TBLANK, 10, lstm_layers,
            is_tdt, joint_prefix, trie=trie, boost_score=boost_score,
        )
        got = [
            (tt.token_id, tt.start_frame, tt.end_frame, tt.confidence)
            for tt in res.timestamped[i]
        ]
        assert res.tokens[i] == [e[0] for e in expect], f"batch {i} tokens"
        assert [g[:3] for g in got] == [e[:3] for e in expect], f"batch {i} spans"
        np.testing.assert_allclose(
            [g[3] for g in got], [e[3] for e in expect], rtol=1e-4, atol=1e-5
        )


import pytest as _pytest


@_pytest.mark.parametrize("seed", [0, 6, 7])
def test_tdt_decode_matches_oracle(seed):
    run_both(seed=seed, is_tdt=True)


def test_tdt_decode_two_lstm_layers():
    run_both(seed=1, is_tdt=True, lstm_layers=2, t_len=15, b=2)


def test_rnnt_decode_matches_oracle():
    run_both(seed=2, is_tdt=False)


def test_tdt_boosted_matches_oracle():
    trie = ContextTrie()
    trie.insert([3, 4])
    trie.insert([3, 7, 2])
    trie.insert([5])
    run_both(seed=3, is_tdt=True, trie=trie, boost_score=4.0, t_len=20, b=2)


@_pytest.mark.parametrize("seed", [0, 6, 7])
def test_tdt_decode_step_impl_matches_oracle(seed):
    run_both(seed=seed, is_tdt=True, impl="step")


@_pytest.mark.parametrize("window", [1, 2, 3, 8, 64])
def test_lookahead_windows_match_step_impl(window):
    """The K-frame lookahead loop must be bit-identical to the per-step loop
    for any window size (incl. window > T) — tokens, spans, confidences,
    and carried streaming state."""
    params = small_model(seed=11, is_tdt=True)
    rng = np.random.RandomState(123)
    b, t_len = 4, 30
    enc = jnp.asarray(rng.randn(b, t_len, ENC_H).astype(np.float32))
    lengths = [30, 25, 13, 1]
    kw = dict(
        pred_hidden=PRED_H, num_lstm_layers=1, durations=DURATIONS,
        blank_id=TBLANK, max_symbols=10, is_tdt=True,
        joint_prefix="tdt_joint_", enc_lengths=lengths,
    )
    ref = transducer_greedy_decode(params, enc, impl="step", **kw)
    got = transducer_greedy_decode(params, enc, impl="lookahead", window=window, **kw)
    assert got.tokens == ref.tokens
    for i in range(b):
        assert [
            (t.token_id, t.start_frame, t.end_frame, t.confidence) for t in got.timestamped[i]
        ] == [(t.token_id, t.start_frame, t.end_frame, t.confidence) for t in ref.timestamped[i]]
    np.testing.assert_array_equal(np.asarray(got.last_token), np.asarray(ref.last_token))
    np.testing.assert_array_equal(np.asarray(got.lstm_state), np.asarray(ref.lstm_state))


def test_lookahead_boosted_matches_step_impl():
    trie = ContextTrie()
    trie.insert([3, 4])
    trie.insert([5])
    params = small_model(seed=13, is_tdt=True)
    rng = np.random.RandomState(131)
    b, t_len = 2, 20
    enc = jnp.asarray(rng.randn(b, t_len, ENC_H).astype(np.float32))
    kw = dict(
        pred_hidden=PRED_H, num_lstm_layers=1, durations=DURATIONS,
        blank_id=TBLANK, max_symbols=10, is_tdt=True, joint_prefix="tdt_joint_",
        boost=trie.device_boost(VOCAB, b, 4.0),
    )
    ref = transducer_greedy_decode(params, enc, impl="step", **kw)
    got = transducer_greedy_decode(params, enc, impl="lookahead", **kw)
    assert got.tokens == ref.tokens
    np.testing.assert_array_equal(np.asarray(got.boost_active), np.asarray(ref.boost_active))


def test_lookahead_rnnt_matches_step_impl():
    params = small_model(seed=14, is_tdt=False)
    rng = np.random.RandomState(141)
    enc = jnp.asarray(rng.randn(3, 18, ENC_H).astype(np.float32))
    kw = dict(
        pred_hidden=PRED_H, num_lstm_layers=1, durations=(0,),
        blank_id=TBLANK, max_symbols=10, is_tdt=False, joint_prefix="joint_",
    )
    ref = transducer_greedy_decode(params, enc, impl="step", **kw)
    got = transducer_greedy_decode(params, enc, impl="lookahead", **kw)
    assert got.tokens == ref.tokens


def test_streaming_chunk_continuation():
    """Two chunk calls with carried state == oracle applied chunk-wise
    (eou.cpp:17-98: t resets per chunk, frame_offset accumulates)."""
    params = small_model(seed=5, is_tdt=True)
    rng = np.random.RandomState(55)
    enc = rng.randn(1, 20, ENC_H).astype(np.float32)

    full = transducer_greedy_decode(
        params, jnp.asarray(enc[:, :10]), pred_hidden=PRED_H, num_lstm_layers=1,
        durations=DURATIONS, blank_id=TBLANK, is_tdt=True, joint_prefix="tdt_joint_",
        clamp_end=False,
    )
    cont = transducer_greedy_decode(
        params, jnp.asarray(enc[:, 10:]), pred_hidden=PRED_H, num_lstm_layers=1,
        durations=DURATIONS, blank_id=TBLANK, is_tdt=True, joint_prefix="tdt_joint_",
        init_token=full.last_token, init_lstm=full.lstm_state, frame_offset=10,
        clamp_end=False,
    )

    # chunk-wise oracle
    root = Params(params)
    toks_all = []
    lstm = prediction_zero_state(1, 1, PRED_H)
    token = TBLANK
    for chunk, offset in ((enc[0, :10], 0), (enc[0, 10:], 10)):
        t = 0
        while t < chunk.shape[0]:
            advanced = False
            for _ in range(10):
                saved = lstm
                pred, lstm = prediction_step(root.sub("prediction_"), jnp.asarray([token]), lstm, 1)
                label_lp, dur_lp = tdt_joint(root.sub("tdt_joint_"), jnp.asarray(chunk[t][None]), pred)
                tok = int(np.argmax(np.asarray(label_lp)[0]))
                skip = DURATIONS[int(np.argmax(np.asarray(dur_lp)[0]))]
                if tok == TBLANK:
                    lstm = saved
                    t += max(skip, 1)
                    advanced = True
                    break
                toks_all.append((tok, offset + t, offset + t + max(skip, 1) - 1))
                token = tok
                if skip > 0:
                    t += skip
                    advanced = True
                    break
            if not advanced:
                t += 1

    got = [
        (tt.token_id, tt.start_frame, tt.end_frame)
        for tt in full.timestamped[0] + cont.timestamped[0]
    ]
    assert got == toks_all


# ─── Trie mechanics (reference test_all.cpp:1280-1365) ──────────────────────


def test_trie_mechanics():
    trie = ContextTrie()
    assert trie.empty()
    trie.insert([1, 2, 3])
    trie.insert([1, 5])
    assert not trie.empty()
    assert trie.get_boosted_tokens({0}) == {1}
    s = trie.advance({0}, 1)
    assert 0 in s  # root always active
    assert trie.get_boosted_tokens(s) == {1, 2, 5}
    s2 = trie.advance(s, 2)
    assert trie.get_boosted_tokens(s2) == {1, 3}
    # non-matching token resets to root only
    s3 = trie.advance(s2, 9)
    assert s3 == {0}


def test_trie_build_from_tokenizer():
    tok = Tokenizer()
    tok.load_pieces(["▁hello", "▁wor", "ld"])
    trie = ContextTrie()
    trie.build(["hello world", ""], tok)
    # "hello world" → pieces [▁hello, ▁wor, ld] → one path 0→1→2
    assert trie.get_boosted_tokens({0}) == {0}
    s = trie.advance({0}, 0)  # root stays active → its children stay boosted
    assert trie.get_boosted_tokens(s) == {0, 1}
    s = trie.advance(s, 1)
    assert trie.get_boosted_tokens(s) == {0, 2}


def test_trie_dense_arrays_match_sets():
    trie = ContextTrie()
    trie.insert([2, 3])
    trie.insert([2, 4, 1])
    trans = trie.to_arrays(vocab_size=6)
    assert trans.shape == (trie.num_nodes, 6)
    # dense reach from root == set API
    assert set(np.nonzero(trans[0] >= 0)[0].tolist()) == trie.get_boosted_tokens({0})


# ─── Boosted CTC properties (reference test_all.cpp:1369-1449) ──────────────


def test_boosted_ctc_empty_trie_equals_unboosted():
    rng = np.random.RandomState(9)
    lp = np.log(
        rng.dirichlet(np.ones(10), size=(1, 12)).astype(np.float32)
    )
    trie = ContextTrie()
    assert ctc_greedy_decode_boosted(lp, trie, 5.0, BLANK) == ctc_greedy_decode(lp, BLANK)


def test_boost_flips_near_tie():
    # Token 4 nearly wins at frame 1; boosting [4] must flip it.
    lp = lp_frames([2, 3, BLANK])
    lp[0, 1, 4] = -0.5  # close second behind 3 at 0.0
    trie = ContextTrie()
    trie.insert([4])
    un = ctc_greedy_decode(lp, BLANK)[0]
    boosted = ctc_greedy_decode_boosted(lp, trie, 5.0, BLANK)[0]
    assert un == [2, 3]
    assert boosted == [2, 4]


def test_boosted_ctc_optimized_equals_bruteforce():
    """The candidate-column device reduction must equal brute-force boosting
    over the full (T, V) matrix (randomized check, incl. tie handling)."""
    rng = np.random.RandomState(17)
    vocab, t_len = 10, 40
    lp = np.log(rng.dirichlet(np.ones(vocab), size=(2, t_len)).astype(np.float32))
    trie = ContextTrie()
    trie.insert([2, 5])
    trie.insert([7])
    trie.insert([2, 3, 1])
    boost = 1.5

    got = ctc_greedy_decode_boosted(lp, trie, boost, BLANK)

    # brute force: add boost to reachable tokens on the full matrix
    def brute(seq):
        trans = trie.to_arrays(vocab)
        reach = trans >= 0
        active = np.zeros(trans.shape[0], bool); active[0] = True
        prev, toks = -1, []
        for t in range(t_len):
            mask = reach[active].any(axis=0)
            vals = seq[t] + boost * mask
            best = int(np.argmax(vals))
            if best != BLANK and best != prev:
                toks.append(best)
                nxt = trans[active, best]
                active = np.zeros(trans.shape[0], bool); active[0] = True
                active[nxt[nxt >= 0]] = True
            prev = best
        return toks

    assert got == [brute(lp[0]), brute(lp[1])]


def test_unroll_bit_identical():
    """unroll>1 (multiple state-machine steps per while_loop iteration) must
    be bit-identical to unroll=1 — masked trailing steps are exact no-ops."""
    import jax.numpy as jnp

    from parakeet_tpu import config as C
    from parakeet_tpu import params as P
    from parakeet_tpu.decode.transducer import transducer_greedy_decode

    vocab, ph, jh, enc_h = 13, 8, 8, 16
    spec = {}
    spec.update(P.prediction_spec(C.PredictionConfig(vocab_size=vocab, pred_hidden=ph,
                                                     num_lstm_layers=2)))
    spec.update(P.tdt_joint_spec(
        C.JointConfig(encoder_hidden=enc_h, pred_hidden=ph, joint_hidden=jh,
                      vocab_size=vocab), 5))
    params = P.init_params(spec, seed=17)
    enc = jnp.asarray(np.random.RandomState(2).randn(3, 29, enc_h).astype(np.float32))
    lens = [29, 13, 22]

    kw = dict(pred_hidden=ph, num_lstm_layers=2, durations=(0, 1, 2, 3, 4),
              blank_id=vocab - 1, is_tdt=True, joint_prefix="tdt_joint_",
              enc_lengths=lens)
    ref = transducer_greedy_decode(params, enc, **kw)
    for n in (2, 4):
        got = transducer_greedy_decode(params, enc, **kw, unroll=n)
        assert got.tokens == ref.tokens, f"unroll={n}"
        for a, b in zip(got.timestamped, ref.timestamped):
            assert [(t.token_id, t.start_frame, t.end_frame, t.confidence) for t in a] == \
                   [(t.token_id, t.start_frame, t.end_frame, t.confidence) for t in b]
        np.testing.assert_array_equal(np.asarray(got.last_token), np.asarray(ref.last_token))
        np.testing.assert_array_equal(np.asarray(got.lstm_state), np.asarray(ref.lstm_state))

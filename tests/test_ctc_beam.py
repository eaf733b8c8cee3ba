"""CTC prefix beam search vs exhaustive alignment enumeration."""

from __future__ import annotations

import itertools
import math

import numpy as np
import pytest

from parakeet_tpu.decode.ctc_beam import ctc_beam_search
from parakeet_tpu.models.ctc import ctc_greedy_decode


def exhaustive_posteriors(lp: np.ndarray, blank: int) -> dict[tuple, float]:
    """Exact p(label sequence) by summing every alignment's probability."""
    t_len, v = lp.shape
    post: dict[tuple, float] = {}
    for path in itertools.product(range(v), repeat=t_len):
        # CTC collapse: merge repeats, drop blanks
        out, prev = [], None
        for s in path:
            if s != prev and s != blank:
                out.append(s)
            prev = s
        p = float(sum(lp[t, s] for t, s in enumerate(path)))
        key = tuple(out)
        post[key] = np.logaddexp(post[key], p) if key in post else p
    return post


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_beam_matches_exhaustive_argmax_and_score(seed):
    rng = np.random.RandomState(seed)
    t_len, v, blank = 4, 4, 3
    x = rng.randn(t_len, v) * 2
    lp = x - np.log(np.exp(x).sum(-1, keepdims=True))

    post = exhaustive_posteriors(lp, blank)
    want_seq, want_score = max(post.items(), key=lambda kv: kv[1])

    # exact mode: beam wide enough to hold every prefix, no pruning
    hyps = ctc_beam_search(lp, blank, beam_size=4096, token_top_k=v,
                           prune_logp=-1e9, n_best=5)
    assert tuple(hyps[0].tokens) == want_seq
    assert abs(hyps[0].score - want_score) < 1e-9
    # n-best ordering matches the exhaustive ranking too
    ranked = sorted(post.items(), key=lambda kv: -kv[1])
    for h, (seq, score) in zip(hyps, ranked):
        assert tuple(h.tokens) == seq and abs(h.score - score) < 1e-9


def test_beam_beats_or_matches_greedy_score():
    """On peaked distributions beam == greedy; on a crafted ambiguous one
    the beam finds a higher-posterior sequence than frame-wise argmax."""
    blank = 2
    # classic case: argmax path is blank-ish but mass concentrates on "a"
    lp = np.log(np.array([
        [0.45, 0.05, 0.50],
        [0.45, 0.05, 0.50],
    ]))
    post = exhaustive_posteriors(lp, blank)
    want_seq = max(post.items(), key=lambda kv: kv[1])[0]
    hyp = ctc_beam_search(lp, blank, beam_size=64, token_top_k=3)[0]
    assert tuple(hyp.tokens) == want_seq == (0,)
    # greedy collapses the per-frame argmax (blank, blank) → empty
    ids = ctc_greedy_decode(np.asarray(lp, np.float32)[None], blank_id=blank)
    assert list(ids[0]) == []


def test_beam_timestamps_first_emission_frame():
    blank = 3
    # token 0 emitted around frame 1, token 1 around frame 3
    lp = np.log(np.array([
        [0.01, 0.01, 0.01, 0.97],
        [0.97, 0.01, 0.01, 0.01],
        [0.01, 0.01, 0.01, 0.97],
        [0.01, 0.97, 0.01, 0.01],
    ]))
    hyp = ctc_beam_search(lp, blank, beam_size=8, token_top_k=4)[0]
    assert hyp.tokens == [0, 1]
    assert hyp.frames == [1, 3]


def test_beam_handles_peaked_long_input():
    rng = np.random.RandomState(9)
    t_len, v, blank = 50, 32, 31
    x = rng.randn(t_len, v)
    x[np.arange(t_len), rng.randint(0, v, t_len)] += 8  # peaked frames
    lp = x - np.log(np.exp(x).sum(-1, keepdims=True))
    hyps = ctc_beam_search(lp, blank, beam_size=8, token_top_k=8, n_best=3)
    assert len(hyps) == 3
    assert hyps[0].score >= hyps[1].score >= hyps[2].score
    assert len(hyps[0].frames) == len(hyps[0].tokens)


def test_facade_beam_search(tmp_path):
    """Transcriber(beam_size=N) routes CTC through the prefix beam search
    and rejects unsupported combinations."""
    from parakeet_tpu import config as C
    from parakeet_tpu.transcribe import Decoder, Transcriber

    cfg = C.TDTCTCConfig(
        encoder=C.EncoderConfig(mel_bins=80, subsampling_channels=16, hidden_size=32,
                                num_layers=2, num_heads=4, ffn_intermediate=64),
        prediction=C.PredictionConfig(vocab_size=21, pred_hidden=16, num_lstm_layers=1),
        joint=C.JointConfig(encoder_hidden=32, pred_hidden=16, joint_hidden=16,
                            vocab_size=21),
        ctc_vocab_size=21,
    )
    vocab = tmp_path / "v.txt"
    vocab.write_text("\n".join(f"▁g{i}" for i in range(21)) + "\n")
    tr = Transcriber(None, str(vocab), cfg, seed=42)
    t = np.arange(12000) / 16000.0
    audio = (0.4 * np.sin(2 * np.pi * 523.25 * t) * np.exp(-t)).astype(np.float32)

    greedy = tr.transcribe(audio, Decoder.CTC)
    # beam_size=1 ≈ greedy path structure; wide beam must score ≥ greedy
    res = tr.transcribe(audio, Decoder.CTC, beam_size=16)
    assert isinstance(res.token_ids, list)
    ts = tr.transcribe(audio, Decoder.CTC, timestamps=True, beam_size=16)
    assert ts.token_ids == res.token_ids
    for tok in ts.timestamped_tokens:
        assert 0 <= tok.start_frame <= tok.end_frame
        assert 0.0 <= tok.confidence <= 1.0

    with pytest.raises(ValueError, match="greedy"):
        tr.transcribe(audio, Decoder.CTC, beam_size=8, boost_phrases=["g1"])
    assert isinstance(greedy.token_ids, list)

    # TDT routes beam_size through the device-side transducer beam:
    # beam_size=1 is exactly the greedy decode
    tdt_greedy = tr.transcribe(audio, Decoder.TDT)
    tdt_beam1 = tr.transcribe(audio, Decoder.TDT, beam_size=1)
    assert tdt_beam1.token_ids == tdt_greedy.token_ids
    tdt_ts = tr.transcribe(audio, Decoder.TDT, timestamps=True, beam_size=4)
    for tok in tdt_ts.timestamped_tokens:
        assert 0 <= tok.start_frame <= tok.end_frame
        assert 0.0 <= tok.confidence <= 1.0
    with pytest.raises(ValueError, match="greedy"):
        tr.transcribe(audio, Decoder.TDT, beam_size=4, boost_phrases=["g1"])

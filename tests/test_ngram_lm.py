"""ARPA n-gram LM + shallow fusion tests (reference Tier-1 roadmap item:
"N-gram LM shallow fusion — load ARPA language models, score partial
hypotheses during beam search", /root/reference/README.md)."""

import math

import numpy as np
import pytest

from parakeet_tpu.decode.ctc_beam import ctc_beam_search
from parakeet_tpu.text.ngram_lm import BOS, NgramLM, rescore_nbest

LN10 = math.log(10.0)

ARPA_BIGRAM = """\
\\data\\
ngram 1=5
ngram 2=3

\\1-grams:
-1.0 <unk>
-0.9 <s> -0.30
-0.5 a -0.20
-0.7 b -0.10
-1.5 c

\\2-grams:
-0.1 <s> a
-0.4 a b
-0.6 b a

\\end\\
"""


def test_arpa_parse_and_exact_ngram():
    lm = NgramLM.from_arpa(ARPA_BIGRAM)
    assert lm.order == 2
    # exact bigram hit: p(a | <s>) = 10^-0.1
    np.testing.assert_allclose(lm.score((BOS,), "a"), -0.1 * LN10, rtol=1e-12)
    np.testing.assert_allclose(lm.score(("a",), "b"), -0.4 * LN10, rtol=1e-12)


def test_backoff_math():
    lm = NgramLM.from_arpa(ARPA_BIGRAM)
    # (a, c) has no bigram: score = bow(a) + unigram(c) = -0.2 + -1.5 (log10)
    np.testing.assert_allclose(lm.score(("a",), "c"), (-0.2 - 1.5) * LN10, rtol=1e-12)
    # context with no backoff weight entry ('c') backs off with bow 0
    np.testing.assert_allclose(lm.score(("c",), "a"), -0.5 * LN10, rtol=1e-12)
    # empty context → unigram directly
    np.testing.assert_allclose(lm.score((), "b"), -0.7 * LN10, rtol=1e-12)


def test_unk_mapping():
    lm = NgramLM.from_arpa(ARPA_BIGRAM)
    # OOV token scores as <unk>'s unigram through the backoff of 'a'
    np.testing.assert_allclose(lm.score(("a",), "zzz"), (-0.2 - 1.0) * LN10, rtol=1e-12)
    # OOV in the CONTEXT also normalizes to <unk>
    np.testing.assert_allclose(lm.score(("zzz",), "a"), lm.score(("<unk>",), "a"), rtol=1e-12)


def test_score_sequence_and_state():
    lm = NgramLM.from_arpa(ARPA_BIGRAM)
    # <s> a b: p(a|<s>) + p(b|a) = -0.1 + -0.4
    np.testing.assert_allclose(
        lm.score_sequence(["a", "b"], bos=True), (-0.1 - 0.4) * LN10, rtol=1e-12
    )
    state = lm.start_state()
    assert state == (BOS,)
    state, lp1 = lm.advance(state, "a")
    assert state == ("a",)  # bigram keeps last token only
    state, lp2 = lm.advance(state, "b")
    np.testing.assert_allclose(lp1 + lp2, (-0.1 - 0.4) * LN10, rtol=1e-12)


def test_trigram_backoff_chain():
    arpa = """\
\\data\\
ngram 1=3
ngram 2=2
ngram 3=1

\\1-grams:
-0.8 x -0.15
-0.9 y -0.25
-1.1 z

\\2-grams:
-0.3 x y -0.05
-0.5 y z

\\3-grams:
-0.2 x y z

\\end\\
"""
    lm = NgramLM.from_arpa(arpa)
    assert lm.order == 3
    # exact trigram
    np.testing.assert_allclose(lm.score(("x", "y"), "z"), -0.2 * LN10, rtol=1e-12)
    # (y, x) → z: no trigram, no (x,z) bigram: bow(y x)=0 (absent) →
    # backoff to (x,) ctx: no (x z) bigram → bow(x) + unigram(z)
    np.testing.assert_allclose(
        lm.score(("y", "x"), "z"), (-0.15 - 1.1) * LN10, rtol=1e-12
    )
    # (x, y) → y: no trigram (x y y): bow(x y) = -0.05, then (y y) no
    # bigram: bow(y) = -0.25 + unigram(y) = -0.9
    np.testing.assert_allclose(
        lm.score(("x", "y"), "y"), (-0.05 - 0.25 - 0.9) * LN10, rtol=1e-12
    )


def test_malformed_arpa_rejected():
    with pytest.raises(ValueError, match="ARPA"):
        NgramLM.from_arpa("just some text\nwith lines\n")
    with pytest.raises(ValueError, match="malformed"):
        NgramLM.from_arpa("\\1-grams:\n-0.5 a b c d\n\\end\\\n")


# ─── Shallow fusion in the CTC prefix beam ───────────────────────────────────


def _near_tie_logprobs(vocab=6, blank=5):
    """Frames where token 1 then {2 vs 3} near-tie; acoustics favor 2."""
    lp = np.full((3, vocab), -8.0, np.float32)
    lp[0, 1] = -0.1
    lp[1, 2] = -0.50   # acoustic winner
    lp[1, 3] = -0.55   # close second
    lp[2, blank] = -0.05
    return lp - np.log(np.exp(lp).sum(-1, keepdims=True))


def _lm_prefers(path_tokens):
    """Bigram LM over pieces p0..p5 strongly preferring the given id path."""
    pieces = [f"p{i}" for i in range(6)]
    lines = ["\\data\\", "ngram 1=7", "ngram 2=%d" % (len(path_tokens)), "", "\\1-grams:", "-2.0 <unk>", "-1.0 <s> -0.5"]
    for p in pieces:
        lines.append(f"-2.0 {p} -0.5")
    lines.append("")
    lines.append("\\2-grams:")
    prev = "<s>"
    for t in path_tokens:
        lines.append(f"-0.05 {prev} p{t}")
        prev = f"p{t}"
    lines += ["", "\\end\\", ""]
    lm = NgramLM.from_arpa("\n".join(lines))
    return lm.bind(pieces)


def test_fusion_flips_near_tie():
    lp = _near_tie_logprobs()
    un = ctc_beam_search(lp, 5, beam_size=8)[0]
    assert un.tokens == [1, 2]
    lm = _lm_prefers([1, 3])
    fused = ctc_beam_search(lp, 5, beam_size=8, lm=lm, lm_weight=0.8)[0]
    assert fused.tokens == [1, 3]


def test_zero_weight_equals_unfused():
    rng = np.random.RandomState(5)
    lp = np.log(rng.dirichlet(np.ones(6), size=20).astype(np.float64))
    lm = _lm_prefers([1, 3])
    a = ctc_beam_search(lp, 5, beam_size=8, n_best=4)
    b = ctc_beam_search(lp, 5, beam_size=8, n_best=4, lm=lm, lm_weight=0.0)
    assert [h.tokens for h in a] == [h.tokens for h in b]
    np.testing.assert_allclose([h.score for h in a], [h.score for h in b])


def test_length_bonus_counteracts_lm_shrinkage():
    """A strong LM shrinks output; the insertion bonus must recover longer
    hypotheses' rank."""
    lp = _near_tie_logprobs()
    lm = _lm_prefers([1, 3])
    short_biased = ctc_beam_search(lp, 5, beam_size=8, lm=lm, lm_weight=5.0)
    boosted = ctc_beam_search(
        lp, 5, beam_size=8, lm=lm, lm_weight=5.0, length_bonus=6.0, n_best=2
    )
    assert len(boosted[0].tokens) >= len(short_biased[0].tokens)


def test_rescore_nbest():
    from dataclasses import dataclass

    @dataclass
    class H:
        tokens: list
        score: float

    lm = _lm_prefers([1, 3])
    hyps = [H([1, 2], -1.0), H([1, 3], -1.3)]  # acoustics prefer [1,2]
    out = rescore_nbest(hyps, lm, lm_weight=2.0)
    assert out[0].tokens == [1, 3]  # LM flips the order
    assert [h.tokens for h in rescore_nbest(hyps, lm, 0.0)] == [[1, 2], [1, 3]]


# ─── Facade integration ──────────────────────────────────────────────────────


def test_facade_lm_fusion(tmp_path):
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
    pieces = [f"▁g{i}" for i in range(21)]
    vocab.write_text("\n".join(pieces) + "\n")
    arpa = tmp_path / "lm.arpa"
    arpa.write_text(
        "\\data\\\nngram 1=%d\n\n\\1-grams:\n-1.0 <unk>\n"
        % (len(pieces) + 1)
        + "\n".join(f"-1.0 {p}" for p in pieces)
        + "\n\n\\end\\\n"
    )
    tr = Transcriber(None, str(vocab), cfg, seed=42)
    t = np.arange(12000) / 16000.0
    audio = (0.4 * np.sin(2 * np.pi * 523.25 * t) * np.exp(-t)).astype(np.float32)

    lm = NgramLM.from_arpa(str(arpa)).bind(tr.tokenizer.pieces)
    # uniform unigram LM: fusion must not change the argmax structure
    base = tr.transcribe(audio, Decoder.CTC, beam_size=8)
    fused = tr.transcribe(audio, Decoder.CTC, beam_size=8, lm=lm, lm_weight=0.3)
    assert fused.token_ids == base.token_ids
    # transducer n-best rescoring path runs end-to-end
    tdt = tr.transcribe(audio, Decoder.TDT, beam_size=4, lm=lm, lm_weight=0.3)
    assert isinstance(tdt.token_ids, list)

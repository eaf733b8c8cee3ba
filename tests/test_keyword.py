"""Hotword / keyword-spotting tests (reference Tier-3 roadmap item:
'Hotword / wake word detection — "Hey Parakeet" trigger phrase')."""

import numpy as np
import pytest

from parakeet_tpu.decode.keyword import HotwordDetector, keyword_log_odds

BLANK = 9
V = 10


def frames(winners, win=0.0, lose=-12.0):
    lp = np.full((len(winners), V), lose, np.float32)
    for i, w in enumerate(winners):
        lp[i, w] = win
    return lp


def test_keyword_present_scores_zero():
    # pre-garbage, keyword [2, 5] cleanly emitted, post-garbage
    lp = frames([BLANK, 1, 2, 5, BLANK, 7])
    assert keyword_log_odds(lp, [2, 5], BLANK) == pytest.approx(0.0, abs=1e-9)


def test_keyword_with_repeats_and_blanks():
    # token 2 held two frames, blank between tokens — still a perfect path
    lp = frames([2, 2, BLANK, 5, BLANK])
    assert keyword_log_odds(lp, [2, 5], BLANK) == pytest.approx(0.0, abs=1e-9)


def test_keyword_absent_scores_low():
    lp = frames([BLANK, 1, 3, 7, BLANK])
    score = keyword_log_odds(lp, [2, 5], BLANK)
    assert score <= -20.0  # two forced off-argmax frames at -12 each


def test_partial_keyword_scores_between():
    lp = frames([BLANK, 2, 7, BLANK])  # first token present, second absent
    full = keyword_log_odds(lp, [2, 5], BLANK)
    assert -20.0 < full <= -10.0


def test_equal_tokens_require_separating_blank():
    # keyword [3, 3]: legal only with a blank between the two emissions
    ok = frames([3, BLANK, 3])
    assert keyword_log_odds(ok, [3, 3], BLANK) == pytest.approx(0.0, abs=1e-9)
    bad = frames([3, 3])  # no blank → no legal alignment in 2 frames
    assert keyword_log_odds(bad, [3, 3], BLANK) == float("-inf")


def test_order_matters():
    lp = frames([5, BLANK, 2])  # reversed order
    assert keyword_log_odds(lp, [2, 5], BLANK) <= -20.0


def test_empty_and_invalid_keyword():
    lp = frames([BLANK, 2])
    assert keyword_log_odds(lp, [], BLANK) == 0.0
    with pytest.raises(ValueError):
        keyword_log_odds(lp, [BLANK], BLANK)
    with pytest.raises(ValueError):
        keyword_log_odds(lp, [99], BLANK)


def test_detector_facade(tmp_path):
    from parakeet_tpu import config as C
    from parakeet_tpu.transcribe import Transcriber

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

    det = HotwordDetector(tr, "g1 g2", window_s=1.0, hop_s=0.25, threshold=-8.0)
    assert det.keyword == tr.tokenizer.encode("g1 g2")

    rng = np.random.RandomState(0)
    fired = []
    for _ in range(8):  # 8 × 0.25 s chunks
        out = det.feed((0.1 * rng.randn(4000)).astype(np.float32))
        assert out is None or isinstance(out, float)
        fired.append(out)
    # scoring itself must be finite and reproducible on a fixed window
    win = (0.1 * rng.randn(16000)).astype(np.float32)
    s1, s2 = det.score_window(win), det.score_window(win)
    assert np.isfinite(s1) and s1 == s2 and s1 <= 1e-9

    det.reset()
    assert det._buf.size == 0
    with pytest.raises(ValueError, match="tokenizes to nothing"):
        HotwordDetector(tr, "")


def test_detector_rearms_after_trigger(monkeypatch):
    """One spoken phrase fires ONCE: a trigger clears the rolling buffer so
    the same audio can't re-fire on every following hop (review finding)."""

    class _FakeTok:
        def encode(self, s):
            return [1, 2]

    class _FakeTr:
        has_ctc = True
        tokenizer = _FakeTok()

        class _audio_cfg:  # noqa: N801 — mimic attribute access
            sample_rate = 16000

    det = HotwordDetector.__new__(HotwordDetector)
    det.tr = _FakeTr()
    det.keyword = [1, 2]
    det.threshold = -8.0
    det._sr = 16000
    det._window = 16000
    det._hop = 4000
    det.reset()

    # score high (trigger) the first time the window is evaluated, then low
    scores = iter([-1.0, -100.0, -100.0, -100.0])
    monkeypatch.setattr(det, "score_window", lambda buf: next(scores))

    chunk = np.zeros(4000, np.float32)
    assert det.feed(chunk) == -1.0      # fires
    assert det._buf.size == 0           # buffer cleared: rearmed
    assert det.feed(chunk) is None      # same audio epoch: no re-fire
    assert det.feed(chunk) is None

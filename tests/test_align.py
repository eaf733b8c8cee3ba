"""CTC forced-alignment tests (decode/align.py + Transcriber.align).

Oracle strategy mirrors the repo's decoder tests: exhaustive
path-enumeration ground truth on tiny shapes, planted-alignment
exactness, property checks on random log-probs, and a facade e2e.
"""

import itertools

import numpy as np
import pytest

from parakeet_tpu.decode.align import ctc_forced_align


def _softmax_log(rng, t, v):
    x = rng.randn(t, v).astype(np.float32)
    x = x - np.log(np.sum(np.exp(x), axis=1, keepdims=True))
    return x


def _collapse(path, blank):
    out = []
    prev = -1
    for p in path:
        if p != blank and p != prev:
            out.append(p)
        prev = p
    return out


def _brute_force(lp, tokens, blank):
    """Max-probability frame path collapsing to `tokens`, by enumeration."""
    t, v = lp.shape
    best, best_score = None, -np.inf
    for path in itertools.product(range(v), repeat=t):
        if _collapse(path, blank) != list(tokens):
            continue
        score = sum(lp[i, p] for i, p in enumerate(path))
        if score > best_score:
            best, best_score = path, score
    assert best is not None
    # token spans: runs of each emitted (non-blank, non-repeat) label
    spans = []
    i = 0
    prev = -1
    while i < t:
        if best[i] != blank and best[i] != prev:
            j = i
            while j + 1 < t and best[j + 1] == best[i]:
                j += 1
            spans.append((best[i], i, j))
            i = j + 1
            prev = best[j]
        else:
            prev = best[i]
            i += 1
    return spans, best_score


@pytest.mark.parametrize("seed", range(5))
def test_matches_brute_force(seed):
    rng = np.random.RandomState(seed)
    t, v, blank = 6, 3, 2
    lp = _softmax_log(rng, t, v)
    # both distinct and repeated-label transcripts
    for tokens in ([0], [1, 0], [0, 0], [1, 1], [0, 1, 0]):
        spans, score = _brute_force(lp, tokens, blank)
        got = ctc_forced_align(lp, tokens, blank)
        assert [(g.token_id, g.start_frame, g.end_frame) for g in got] == spans, tokens
        got_score = sum(
            lp[f, g.token_id] for g in got
            for f in range(g.start_frame, g.end_frame + 1)
        )
        # add the blank frames the viterbi path spent
        label_frames = {f for g in got for f in range(g.start_frame, g.end_frame + 1)}
        got_score += sum(lp[f, blank] for f in range(t) if f not in label_frames)
        np.testing.assert_allclose(got_score, score, rtol=1e-5)


def test_planted_alignment_recovered():
    """Near-one-hot log-probs along a chosen path → exact recovery."""
    t, v, blank = 12, 5, 4
    plan = [blank, 1, 1, blank, 2, 2, 2, blank, blank, 3, blank, blank]
    lp = np.full((t, v), -20.0, np.float32)
    for i, lab in enumerate(plan):
        lp[i, lab] = -0.01
    got = ctc_forced_align(lp, [1, 2, 3], blank)
    assert [(g.token_id, g.start_frame, g.end_frame) for g in got] == [
        (1, 1, 2), (2, 4, 6), (3, 9, 9)]
    for g in got:
        assert 0.9 < g.confidence <= 1.0


def test_properties_random():
    rng = np.random.RandomState(11)
    lp = _softmax_log(rng, 50, 8)
    tokens = [3, 5, 5, 1, 3]
    got = ctc_forced_align(lp, tokens, 7)
    assert [g.token_id for g in got] == tokens
    # ordered, non-overlapping spans inside [0, T)
    last_end = -1
    for g in got:
        assert 0 <= g.start_frame <= g.end_frame < 50
        assert g.start_frame > last_end
        last_end = g.end_frame
        assert 0.0 < g.confidence <= 1.0
    # repeated labels (5, 5) must be separated by at least one frame
    assert got[2].start_frame > got[1].end_frame + 1


def test_length_clips_padded_frames():
    rng = np.random.RandomState(3)
    lp = _softmax_log(rng, 30, 6)
    ref = ctc_forced_align(lp[:20], [1, 2], 5)
    got = ctc_forced_align(lp, [1, 2], 5, length=20)
    assert [(g.start_frame, g.end_frame) for g in got] == \
        [(g.start_frame, g.end_frame) for g in ref]
    assert all(g.end_frame < 20 for g in got)


def test_infeasible_raises():
    rng = np.random.RandomState(0)
    lp = _softmax_log(rng, 3, 4)
    # a repeat needs 3 frames minimum: exactly 3 aligns, 2 raises
    assert len(ctc_forced_align(lp, [1, 1], 3)) == 2
    with pytest.raises(ValueError, match="frames"):
        ctc_forced_align(lp[:2], [1, 1], 3)
    with pytest.raises(ValueError, match="non-empty"):
        ctc_forced_align(lp, [], 3)
    with pytest.raises(ValueError, match="blank"):
        ctc_forced_align(lp, [3], 3)
    with pytest.raises(ValueError, match="range"):
        ctc_forced_align(lp, [9], 3)


def test_facade_align(tmp_path):
    from parakeet_tpu import config as C
    from parakeet_tpu.transcribe import Transcriber

    vocab = tmp_path / "vocab.txt"
    vocab.write_text("\n".join(["<unk>", "▁a", "▁b", "a", "b"]) + "\n")
    cfg = C.TDTCTCConfig(
        encoder=C.EncoderConfig(mel_bins=80, subsampling_channels=16,
                                hidden_size=32, num_layers=2, num_heads=4,
                                ffn_intermediate=64),
        prediction=C.PredictionConfig(vocab_size=6, pred_hidden=16,
                                      num_lstm_layers=1),
        joint=C.JointConfig(encoder_hidden=32, pred_hidden=16, joint_hidden=16,
                            vocab_size=6),
        ctc_vocab_size=6,
    )
    tr = Transcriber(None, str(vocab), cfg, seed=7)
    t = np.arange(24000) / 16000.0
    audio = (0.4 * np.sin(2 * np.pi * 523.25 * t)).astype(np.float32)

    res = tr.align(audio, "a b ab")
    assert res.token_ids == tr.tokenizer.encode("a b ab")
    assert res.text  # decoded back through the vocab
    assert len(res.timestamped_tokens) == len(res.token_ids)
    last_end = -1
    for g in res.timestamped_tokens:
        assert g.start_frame > last_end
        last_end = g.end_frame
    assert res.word_timestamps and res.word_timestamps[0].start >= 0.0

    with pytest.raises(ValueError, match="too short|cannot emit|frames"):
        tr.align(audio[:2000], "a b ab a b ab a b ab")

    with pytest.raises(ValueError, match="CTC|vocab"):
        # no vocab → tokenizer not loaded
        Transcriber(None, None, cfg, seed=7).align(audio, "a b")

    # align_batch pads to one device call; per-clip results must equal the
    # single-clip path (padded frames are masked by lengths)
    audio2 = audio[:19200]
    batched = tr.align_batch([audio, audio2], ["a b ab", "b a"])
    singles = [tr.align(audio, "a b ab"), tr.align(audio2, "b a")]
    for got, want in zip(batched, singles):
        assert got.token_ids == want.token_ids
        assert [(g.start_frame, g.end_frame) for g in got.timestamped_tokens] == \
            [(g.start_frame, g.end_frame) for g in want.timestamped_tokens]

    with pytest.raises(ValueError, match="sources vs"):
        tr.align_batch([audio], ["a", "b"])


def test_stitch_frame_ownership_contiguous():
    from parakeet_tpu.decode.align import stitch_frame_ownership

    # 3 full windows: 75 frames each, hop 50 (overlap 25)
    starts = [0, 50, 100]
    lens = [75, 75, 60]  # last window clipped by audio end
    ranges = stitch_frame_ownership(starts, lens, 25)
    abs_cover = []
    for a, (lo, hi) in zip(starts, ranges):
        abs_cover.extend(range(a + lo, a + hi))
    # gapless, duplicate-free, spans frame 0 .. last window end
    assert abs_cover == list(range(0, 160))
    # first window owns from 0; boundaries sit mid-overlap (50 + 13)
    assert ranges[0] == (0, 63)

    # sliver fully shadowed by the previous window owns nothing
    ranges2 = stitch_frame_ownership([0, 50], [75, 5], 25)
    assert ranges2[1][0] >= ranges2[1][1]

    with pytest.raises(ValueError, match="one start"):
        stitch_frame_ownership([0, 1], [5], 2)


def test_align_long_facade(tmp_path):
    from parakeet_tpu import config as C
    from parakeet_tpu.transcribe import Transcriber

    vocab = tmp_path / "vocab.txt"
    vocab.write_text("\n".join(["<unk>", "▁a", "▁b", "a", "b"]) + "\n")
    cfg = C.TDTCTCConfig(
        encoder=C.EncoderConfig(mel_bins=80, subsampling_channels=16,
                                hidden_size=32, num_layers=2, num_heads=4,
                                ffn_intermediate=64),
        prediction=C.PredictionConfig(vocab_size=6, pred_hidden=16,
                                      num_lstm_layers=1),
        joint=C.JointConfig(encoder_hidden=32, pred_hidden=16, joint_hidden=16,
                            vocab_size=6),
        ctc_vocab_size=6,
    )
    tr = Transcriber(None, str(vocab), cfg, seed=7)
    t = np.arange(4 * 16000) / 16000.0
    audio = (0.4 * np.sin(2 * np.pi * 330 * t)).astype(np.float32)

    # short-circuit: audio shorter than the window == plain align
    short = tr.align_long(audio[:16000], "a b", window_s=2.0, overlap_s=0.5)
    plain = tr.align(audio[:16000], "a b")
    assert [(g.start_frame, g.end_frame) for g in short.timestamped_tokens] == \
        [(g.start_frame, g.end_frame) for g in plain.timestamped_tokens]

    # long path: 4 s through 1 s windows with 0.32 s overlap
    res = tr.align_long(audio, "a b ab a", window_s=1.0, overlap_s=0.32)
    toks = tr.tokenizer.encode("a b ab a")
    assert res.token_ids == toks
    total_frames = (4 * 16000) // 1280 + 2
    last_end = -1
    for g in res.timestamped_tokens:
        assert last_end < g.start_frame <= g.end_frame < total_frames
        last_end = g.end_frame
    # deterministic
    res2 = tr.align_long(audio, "a b ab a", window_s=1.0, overlap_s=0.32)
    assert [(g.start_frame, g.end_frame) for g in res2.timestamped_tokens] == \
        [(g.start_frame, g.end_frame) for g in res.timestamped_tokens]


def test_diarized_align(tmp_path):
    """Speaker-attributed forced alignment: known transcript + Sortformer
    segments → DiarizedResult with per-word speakers, no decoding."""
    from parakeet_tpu.capi import _tiny_diarized_configs
    from parakeet_tpu.diarize import DiarizedTranscriber

    vocab = tmp_path / "vocab.txt"
    vocab.write_text("\n".join(["<unk>", "▁a", "▁b", "a", "b"]) + "\n")
    asr_cfg, sf_cfg = _tiny_diarized_configs()
    dt = DiarizedTranscriber(None, None, str(vocab), asr_cfg, sf_cfg)
    t = np.arange(24000) / 16000.0
    audio = (0.4 * np.sin(2 * np.pi * 330 * t)).astype(np.float32)

    res = dt.align(audio, "a b ab")
    assert res.text
    assert len(res.words) == len(res.word_timestamps) == 3
    for w in res.words:
        assert w.speaker_id >= -1
        assert w.end >= w.start

    # long-form path delegates to align_long
    res_l = dt.align(audio, "a b ab", window_s=1.0, overlap_s=0.3)
    assert len(res_l.words) == 3

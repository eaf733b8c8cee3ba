"""Long-form windowed transcription tests."""

import numpy as np
import pytest

from parakeet_tpu import config as C
from parakeet_tpu.transcribe import Decoder, Transcriber


@pytest.fixture(scope="module")
def tiny():
    cfg = C.TDTCTCConfig(
        encoder=C.EncoderConfig(mel_bins=80, subsampling_channels=8, hidden_size=16,
                                num_layers=1, num_heads=2, ffn_intermediate=32),
        prediction=C.PredictionConfig(vocab_size=9, pred_hidden=8, num_lstm_layers=1),
        joint=C.JointConfig(encoder_hidden=16, pred_hidden=8, joint_hidden=8, vocab_size=9),
        ctc_vocab_size=9,
    )
    return Transcriber(None, None, cfg, seed=7)


def test_short_input_falls_through(tiny):
    audio = np.random.RandomState(0).randn(8000).astype(np.float32) * 0.1
    a = tiny.transcribe_long(audio, Decoder.CTC, window_s=2.0, overlap_s=0.5)
    b = tiny.transcribe(audio, Decoder.CTC, timestamps=True)
    assert a.token_ids == b.token_ids


def test_long_input_windows_merge(tiny):
    # 5 s audio, 2 s windows with 1 s overlap → 4+ windows
    audio = np.random.RandomState(1).randn(5 * 16000).astype(np.float32) * 0.1
    res = tiny.transcribe_long(audio, Decoder.CTC, window_s=2.0, overlap_s=1.0)
    assert res.timestamped_tokens, "long-form decode produced no tokens"
    starts = [t.start_frame for t in res.timestamped_tokens]
    assert starts == sorted(starts), "merged tokens must be time-ordered"
    # tokens span (roughly) the whole clip, not just the first window
    assert starts[-1] * 0.08 > 2.5
    # no duplicated (start_frame, token) pairs from overlap double-counting
    pairs = [(t.start_frame, t.token_id) for t in res.timestamped_tokens]
    assert len(pairs) == len(set(pairs))


def test_longform_matches_flat_outside_boundaries(tiny):
    """Away from window seams, windowed decode == whole-clip decode (CTC is
    frame-local up to encoder context)."""
    audio = np.random.RandomState(2).randn(4 * 16000).astype(np.float32) * 0.1
    flat = tiny.transcribe(audio, Decoder.CTC, timestamps=True)
    windowed = tiny.transcribe_long(audio, Decoder.CTC, window_s=2.0, overlap_s=1.0)
    flat_set = {(t.start_frame, t.token_id) for t in flat.timestamped_tokens}
    win_set = {(t.start_frame, t.token_id) for t in windowed.timestamped_tokens}
    # majority agreement (seams may differ)
    inter = len(flat_set & win_set)
    assert inter >= 0.5 * max(1, len(flat_set))


def test_pad_to_multiple_bucketing(tiny):
    """Bucketed padding must not change decode results (pad frames masked)."""
    from parakeet_tpu.transcribe import TranscribeOptions, Decoder
    import numpy as np

    audio = np.random.RandomState(4).randn(20000).astype(np.float32) * 0.1
    exact = tiny.transcribe_batch([audio], TranscribeOptions(Decoder.CTC))[0]
    bucketed = tiny.transcribe_batch(
        [audio], TranscribeOptions(Decoder.CTC), pad_to_multiple=200
    )[0]
    assert bucketed.token_ids == exact.token_ids


def test_word_straddling_ownership_boundary(tmp_path):
    """A word whose tokens straddle the overlap-ownership seam must come out
    intact exactly once, even when the two windows' decodes disagree about
    it (VERDICT r1 weak #8). Ownership is word-level: the window owning the
    word's START contributes all its tokens."""
    from parakeet_tpu.decode.timestamp import TimestampedToken
    from parakeet_tpu.transcribe import TranscribeResult

    vocab = tmp_path / "vocab.txt"
    vocab.write_text("▁por\ntrait\n▁hello\nf3\nf4\nf5\nf6\nf7\nf8\n")
    cfg = C.TDTCTCConfig(
        encoder=C.EncoderConfig(mel_bins=80, subsampling_channels=8, hidden_size=16,
                                num_layers=1, num_heads=2, ffn_intermediate=32),
        prediction=C.PredictionConfig(vocab_size=9, pred_hidden=8, num_lstm_layers=1),
        joint=C.JointConfig(encoder_hidden=16, pred_hidden=8, joint_hidden=8, vocab_size=9),
        ctc_vocab_size=9,
    )
    tr = Transcriber(None, str(vocab), cfg, seed=7)

    # 3 s audio, 2 s windows, 1 s overlap → two windows; seam at 1.5 s.
    # Window 0 decodes the straddling word as [▁por@1.36s, trait@1.60s];
    # window 1 heard only a partial [▁por] there (disagreement) plus a
    # later word it owns. Token-level ownership would emit "por hello"
    # (trait lost: ≥1.5 s belongs to window 1, which has no token there).
    win0 = [TimestampedToken(0, 17, 18, 0.9), TimestampedToken(1, 20, 21, 0.8)]
    win1 = [TimestampedToken(0, 5, 6, 0.7), TimestampedToken(2, 23, 24, 0.95)]
    calls = []

    def fake_batch(sources, opts=None, **kw):
        # transcribe_long batches ALL windows into ONE device call
        calls.append([len(s) for s in sources])
        per_window = [win0, win1]
        return [TranscribeResult(timestamped_tokens=per_window[i])
                for i in range(len(sources))]

    # transcribe_long decodes windows through the dense path (never the
    # auto-routing facade — a 60 s window must not re-window itself)
    tr._transcribe_batch_dense = fake_batch
    audio = np.zeros(3 * 16000, np.float32)
    res = tr.transcribe_long(audio, Decoder.CTC, window_s=2.0, overlap_s=1.0)

    assert calls == [[32000, 32000]]  # one batched call, both windows
    got = [(t.token_id, t.start_frame) for t in res.timestamped_tokens]
    assert got == [(0, 17), (1, 20), (2, 35)], got  # word intact, once
    assert res.text == "portrait hello"


def test_sentences_mode_through_facade(tmp_path):
    """timestamp_mode=SENTENCES plumbs through Transcriber.transcribe
    (reference exposes the mode enum publicly; timestamp.hpp)."""
    from parakeet_tpu.decode.timestamp import TimestampMode, group_timestamps

    vocab = tmp_path / "vocab.txt"
    vocab.write_text("▁a.\n▁b\nc?\n▁d\nf4\nf5\nf6\nf7\nf8\n")
    cfg = C.TDTCTCConfig(
        encoder=C.EncoderConfig(mel_bins=80, subsampling_channels=8, hidden_size=16,
                                num_layers=1, num_heads=2, ffn_intermediate=32),
        prediction=C.PredictionConfig(vocab_size=9, pred_hidden=8, num_lstm_layers=1),
        joint=C.JointConfig(encoder_hidden=16, pred_hidden=8, joint_hidden=8, vocab_size=9),
        ctc_vocab_size=9,
    )
    tr = Transcriber(None, str(vocab), cfg, seed=3)
    audio = np.random.RandomState(5).randn(16000).astype(np.float32) * 0.1

    words = tr.transcribe(audio, Decoder.CTC, timestamps=True)
    sents = tr.transcribe(
        audio, Decoder.CTC, timestamps=True, timestamp_mode=TimestampMode.SENTENCES
    )
    assert sents.token_ids == words.token_ids
    expect = group_timestamps(
        words.timestamped_tokens, tr.tokenizer.pieces, TimestampMode.SENTENCES
    )
    assert [(w.word, w.start, w.end) for w in sents.word_timestamps] == [
        (w.word, w.start, w.end) for w in expect
    ]
    if any(w.word.rstrip().endswith((".", "?", "!")) for w in words.word_timestamps):
        assert len(sents.word_timestamps) <= len(words.word_timestamps)


def test_transcribe_long_validates_overlap(tiny):
    audio = np.zeros(16000, np.float32)
    with pytest.raises(ValueError, match="overlap_s"):
        tiny.transcribe_long(audio, window_s=2.0, overlap_s=2.0)
    with pytest.raises(ValueError, match="overlap_s"):
        tiny.transcribe_long(audio, window_s=2.0, overlap_s=5.0)
    with pytest.raises(ValueError, match="overlap_s"):
        tiny.transcribe_long(audio, window_s=2.0, overlap_s=-1.0)


def test_transcribe_batch_empty_and_stereo_and_int16(tiny):
    """Facade input hygiene (review findings): empty batch returns [],
    (frames, channels) arrays downmix, int16 arrays scale."""
    assert tiny.transcribe_batch([]) == []

    rng = np.random.RandomState(5)
    mono = (0.1 * rng.randn(8000)).astype(np.float32)
    ref = tiny.transcribe(mono, Decoder.CTC)
    stereo = np.stack([mono, mono], axis=1)
    assert tiny.transcribe(stereo, Decoder.CTC).token_ids == ref.token_ids
    i16 = (mono * 32768.0).clip(-32768, 32767).astype(np.int16)
    got = tiny.transcribe(i16, Decoder.CTC)
    # int16 quantization is tiny; transcripts should match on this clip
    assert got.token_ids == ref.token_ids


def test_ctc_on_tdt_only_model_raises_cleanly():
    """Every facade entry point (incl. transcribe_features, which used to
    bypass the guard and AttributeError) rejects CTC on a CTC-less model
    BEFORE any device work."""
    from parakeet_tpu.transcribe import TDTTranscriber, TranscribeOptions

    cfg = C.TDTConfig(
        encoder=C.EncoderConfig(mel_bins=80, subsampling_channels=8, hidden_size=16,
                                num_layers=1, num_heads=2, ffn_intermediate=32),
        prediction=C.PredictionConfig(vocab_size=9, pred_hidden=8, num_lstm_layers=1),
        joint=C.JointConfig(encoder_hidden=16, pred_hidden=8, joint_hidden=8, vocab_size=9),
    )
    tr = TDTTranscriber(None, None, cfg, seed=1)
    feats = np.zeros((1, 64, 80), np.float32)
    with pytest.raises(ValueError, match="no CTC head"):
        tr.transcribe_features(feats, TranscribeOptions(Decoder.CTC))
    with pytest.raises(ValueError, match="no CTC head"):
        tr.transcribe(np.zeros(8000, np.float32), Decoder.CTC)


def test_progress_callbacks_offline(tiny):
    """TranscribeOptions.on_progress fires load/preprocess/decode in order
    with correct (done, total), and identical results vs no callback."""
    from parakeet_tpu.transcribe import TranscribeOptions

    clips = [np.random.RandomState(s).randn(8000).astype(np.float32) * 0.1
             for s in range(3)]
    events = []
    opts = TranscribeOptions(Decoder.CTC,
                             on_progress=lambda st, d, t: events.append((st, d, t)))
    res = tiny.transcribe_batch(clips, opts)
    plain = tiny.transcribe_batch(clips, TranscribeOptions(Decoder.CTC))
    assert [r.token_ids for r in res] == [r.token_ids for r in plain]
    assert events[:3] == [("load", 1, 3), ("load", 2, 3), ("load", 3, 3)]
    assert ("preprocess", 1, 1) in events
    assert events[-1] == ("decode", 1, 1)


def test_progress_callback_exception_propagates(tiny):
    from parakeet_tpu.transcribe import TranscribeOptions

    def boom(stage, done, total):
        raise RuntimeError("callback boom")

    with pytest.raises(RuntimeError, match="callback boom"):
        tiny.transcribe_batch(
            [np.zeros(4000, np.float32)], TranscribeOptions(on_progress=boom)
        )


def test_transcribe_long_window_progress(tiny):
    """on_progress sub-batches windows and reports ('window', done, total);
    results identical to the single-batched path."""
    audio = np.random.RandomState(3).randn(5 * 16000).astype(np.float32) * 0.1
    flat = tiny.transcribe_long(audio, Decoder.CTC, window_s=2.0, overlap_s=1.0)
    events = []
    prog = tiny.transcribe_long(
        audio, Decoder.CTC, window_s=2.0, overlap_s=1.0,
        on_progress=lambda st, d, t: events.append((st, d, t)), progress_batch=2,
    )
    assert prog.token_ids == flat.token_ids
    wins = [e for e in events if e[0] == "window"]
    assert len(wins) >= 2
    total = wins[0][2]
    assert [w[1] for w in wins] == sorted(w[1] for w in wins)
    assert wins[-1] == ("window", total, total)


def test_long_batch_matches_per_clip(tiny):
    """transcribe_long_batch == transcribe_long per clip (same windows, same
    merge), with ALL clips' windows batched into one dense device call."""
    rng = np.random.RandomState(11)
    clips = [
        (rng.randn(5 * 16000) * 0.1).astype(np.float32),
        (rng.randn(int(3.5 * 16000)) * 0.1).astype(np.float32),
        (rng.randn(8000) * 0.1).astype(np.float32),  # shorter than a window
    ]
    singles = [
        tiny.transcribe_long(c, Decoder.CTC, window_s=2.0, overlap_s=1.0)
        for c in clips
    ]
    calls = []
    real = tiny._transcribe_batch_dense

    def counting(sources, opts=None, **kw):
        calls.append(len(sources))
        return real(sources, opts, **kw)

    tiny._transcribe_batch_dense = counting
    try:
        batched = tiny.transcribe_long_batch(
            clips, Decoder.CTC, window_s=2.0, overlap_s=1.0
        )
    finally:
        tiny._transcribe_batch_dense = real
    assert len(calls) == 1, "windows must batch ACROSS clips into one call"
    for s, b in zip(singles, batched):
        assert [(t.token_id, t.start_frame) for t in s.timestamped_tokens] == [
            (t.token_id, t.start_frame) for t in b.timestamped_tokens
        ]


def test_long_batch_max_batch_subbatches(tiny):
    rng = np.random.RandomState(12)
    clips = [(rng.randn(4 * 16000) * 0.1).astype(np.float32) for _ in range(2)]
    ref = tiny.transcribe_long_batch(clips, Decoder.CTC, window_s=2.0, overlap_s=1.0)
    sub = tiny.transcribe_long_batch(
        clips, Decoder.CTC, window_s=2.0, overlap_s=1.0, max_batch=2
    )
    assert [r.token_ids for r in ref] == [r.token_ids for r in sub]


def test_auto_routing_mixed_batch_and_opt_out():
    """Facade default long_audio='window': clips past long_threshold_s route
    through windowed decode, short clips stay dense, order preserved;
    long_audio='dense' opts out; beam decodes never route."""
    from parakeet_tpu.transcribe import TranscribeOptions

    cfg = C.TDTCTCConfig(
        encoder=C.EncoderConfig(mel_bins=80, subsampling_channels=8, hidden_size=16,
                                num_layers=1, num_heads=2, ffn_intermediate=32),
        prediction=C.PredictionConfig(vocab_size=9, pred_hidden=8, num_lstm_layers=1),
        joint=C.JointConfig(encoder_hidden=16, pred_hidden=8, joint_hidden=8, vocab_size=9),
        ctc_vocab_size=9,
    )
    tr = Transcriber(None, None, cfg, seed=7, long_threshold_s=2.5,
                     long_window_s=2.0, long_overlap_s=1.0)
    rng = np.random.RandomState(13)
    short = (rng.randn(16000) * 0.1).astype(np.float32)
    long_clip = (rng.randn(5 * 16000) * 0.1).astype(np.float32)

    routed = tr.transcribe_batch([short, long_clip], TranscribeOptions(Decoder.CTC))
    direct_long = tr.transcribe_long(long_clip, Decoder.CTC,
                                     window_s=2.0, overlap_s=1.0)
    assert routed[1].token_ids == direct_long.token_ids
    assert routed[1].timestamped_tokens  # windowed results carry timestamps

    dense = Transcriber(None, None, cfg, seed=7, long_audio="dense")
    dense_res = dense.transcribe_batch([short, long_clip],
                                       TranscribeOptions(Decoder.CTC))
    assert routed[0].token_ids == dense_res[0].token_ids  # short clip: same path
    # the 5 s clip decoded densely vs windowed may differ at seams — the
    # point here is just that dense mode does NOT window (single dense call)
    calls = []
    real = dense._transcribe_batch_dense
    dense._transcribe_batch_dense = lambda s, o=None, **k: (
        calls.append(len(s)) or real(s, o, **k)
    )
    try:
        dense.transcribe_batch([long_clip], TranscribeOptions(Decoder.CTC))
    finally:
        dense._transcribe_batch_dense = real
    assert calls == [1]

    # beam decodes bypass routing (windowed path is greedy-only)
    def boom(*a, **k):
        raise AssertionError("beam decode must not route through windowing")

    tr.transcribe_long_batch = boom
    res_beam = tr.transcribe_batch(
        [long_clip], TranscribeOptions(Decoder.CTC, beam_size=2)
    )
    assert res_beam[0].token_ids is not None
    with pytest.raises(ValueError, match="long_audio"):
        Transcriber(None, None, cfg, seed=7, long_audio="auto")


def test_transcribe_long_explicit_window_not_rerouted():
    """A clip that fits in ONE explicit transcribe_long window must decode
    DENSELY even when it exceeds the facade's auto-routing threshold —
    regression: the <=1-window branch used to call self.transcribe(),
    which re-entered transcribe_batch auto-windowing and silently replaced
    the caller's 6 s window with the facade's 2 s/1 s geometry."""
    cfg = C.TDTCTCConfig(
        encoder=C.EncoderConfig(mel_bins=80, subsampling_channels=8, hidden_size=16,
                                num_layers=1, num_heads=2, ffn_intermediate=32),
        prediction=C.PredictionConfig(vocab_size=9, pred_hidden=8, num_lstm_layers=1),
        joint=C.JointConfig(encoder_hidden=16, pred_hidden=8, joint_hidden=8, vocab_size=9),
        ctc_vocab_size=9,
    )
    tr = Transcriber(None, None, cfg, seed=7, long_threshold_s=2.5,
                     long_window_s=2.0, long_overlap_s=1.0)
    audio = (np.random.RandomState(4).randn(4 * 16000) * 0.1).astype(np.float32)

    def boom(*a, **k):
        raise AssertionError(
            "transcribe_long with a window >= clip must not re-window"
        )

    orig = tr.transcribe_long_batch
    tr.transcribe_long_batch = boom
    try:
        res = tr.transcribe_long(audio, Decoder.CTC, window_s=6.0, overlap_s=1.0)
    finally:
        tr.transcribe_long_batch = orig

    dense = Transcriber(None, None, cfg, seed=7, long_audio="dense")
    ref = dense.transcribe(audio, Decoder.CTC, timestamps=True)
    assert res.token_ids == ref.token_ids
    assert res.timestamped_tokens

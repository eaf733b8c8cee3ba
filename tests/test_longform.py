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

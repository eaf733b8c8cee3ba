"""Energy VAD tests (reference Tier-2 roadmap: "VAD — skip silent regions,
reduce compute"). Synthetic tone/silence layouts with known boundaries."""

import numpy as np
import pytest

from parakeet_tpu.audio.vad import VadConfig, speech_ratio, vad_segments

SR = 16000


def _tone(dur_s, freq=440.0, amp=0.3):
    t = np.arange(int(dur_s * SR)) / SR
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def _noise(dur_s, amp=0.001, seed=0):
    return (amp * np.random.RandomState(seed).randn(int(dur_s * SR))).astype(np.float32)


def test_silence_only():
    assert vad_segments(_noise(2.0), SR) == []
    assert vad_segments(np.zeros(SR, np.float32), SR) == []
    assert vad_segments(np.zeros(0, np.float32), SR) == []


def test_speech_only():
    segs = vad_segments(_tone(2.0), SR)
    assert len(segs) == 1
    lo, hi = segs[0]
    assert lo == 0 and hi == 2 * SR  # padding clamps to the signal


def test_speech_island_boundaries():
    """silence(1s) + tone(1s) + silence(1s): one segment covering the tone
    with ≤ pad+frame slack on each side."""
    cfg = VadConfig()
    x = np.concatenate([_noise(1.0), _tone(1.0), _noise(1.0, seed=1)])
    segs = vad_segments(x, SR, cfg)
    assert len(segs) == 1
    lo, hi = segs[0]
    slack = int((cfg.pad_ms + cfg.frame_ms) * SR / 1000)
    assert SR - slack <= lo <= SR
    assert 2 * SR <= hi <= 2 * SR + slack


def test_gap_bridging_and_separation():
    """Gaps shorter than max_gap_ms merge; much longer gaps split."""
    cfg = VadConfig(max_gap_ms=300.0, pad_ms=50.0)
    short_gap = np.concatenate([_tone(0.5), _noise(0.2), _tone(0.5, freq=550)])
    assert len(vad_segments(short_gap, SR, cfg)) == 1
    long_gap = np.concatenate([_tone(0.5), _noise(2.0), _tone(0.5, freq=550)])
    assert len(vad_segments(long_gap, SR, cfg)) == 2


def test_short_island_dropped():
    cfg = VadConfig(min_speech_ms=120.0, max_gap_ms=100.0)
    x = np.concatenate([_noise(1.0), _tone(0.05), _noise(1.0, seed=1)])
    assert vad_segments(x, SR, cfg) == []


def test_speech_ratio():
    x = np.concatenate([_tone(1.0), _noise(1.0)])
    r = speech_ratio(x, SR)
    assert 0.4 < r < 0.7  # ~half the signal, plus padding


def test_transcribe_vad_absolute_timestamps():
    """transcribe_vad's word spans must be in ABSOLUTE time: a leading
    second of silence shifts every span by ~1 s relative to transcribing
    the trimmed speech alone."""
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
    tr = Transcriber(None, None, cfg, seed=42)
    speech = _tone(1.0, freq=523.25, amp=0.4)
    padded = np.concatenate([_noise(1.0), speech, _noise(1.0, seed=1)])

    res = tr.transcribe_vad(padded, Decoder.CTC)
    segs = vad_segments(padded, SR)
    assert len(segs) == 1
    lo = segs[0][0]
    base = tr.transcribe(padded[segs[0][0]:segs[0][1]], Decoder.CTC, timestamps=True)
    assert res.token_ids == base.token_ids
    frame_off = int(round(lo / SR / 0.08))
    got = [(t.token_id, t.start_frame, t.end_frame) for t in res.timestamped_tokens]
    want = [
        (t.token_id, t.start_frame + frame_off, t.end_frame + frame_off)
        for t in base.timestamped_tokens
    ]
    assert got == want


def test_transcribe_vad_empty_on_silence():
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
    tr = Transcriber(None, None, cfg, seed=42)
    res = tr.transcribe_vad(_noise(1.5))
    assert res.token_ids == [] and res.text == ""

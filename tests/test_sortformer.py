"""Sortformer + diarization tests (strategy from reference
test_all.cpp:299-341 (AOSC), :1045-1177 (alignment edge cases))."""

import numpy as np
import jax.numpy as jnp
import pytest

from parakeet_tpu import config as C
from parakeet_tpu import params as P
from parakeet_tpu.decode.timestamp import WordTimestamp
from parakeet_tpu.diarize import DiarizedTranscriber, diarize_transcription
from parakeet_tpu.models.sortformer import (
    AOSCCache,
    DiarizationSegment,
    Sortformer,
    probs_to_segments,
    sortformer_forward,
)


def tiny_sf_config():
    return C.SortformerConfig(
        nest_encoder=C.StreamingEncoderConfig(
            mel_bins=128, subsampling_channels=8, hidden_size=24, num_layers=2,
            num_heads=2, ffn_intermediate=32, conv_kernel_size=5,
            att_context_left=6, att_context_right=0, subsampling_activation="relu",
            xscaling=True,
        ),
        encoder_hidden=24,
        transformer_hidden=12,
        transformer=C.TransformerConfig(
            hidden_size=12, num_layers=2, num_heads=2, ffn_intermediate=24,
            pre_ln=False, has_final_norm=False,
        ),
        max_speakers=4,
    )


@pytest.fixture(scope="module")
def sf():
    cfg = tiny_sf_config()
    params = P.init_params(P.sortformer_spec(cfg), seed=21)
    return Sortformer(None, cfg, params=params)


def test_forward_shape_and_range(sf):
    feats = jnp.asarray(np.random.RandomState(1).randn(1, 32, 128).astype(np.float32))
    probs = np.asarray(sf.forward(feats))
    assert probs.shape == (1, 4, 4)  # 32 mel → 4 enc frames, 4 speakers
    assert (probs >= 0).all() and (probs <= 1).all()


def test_probs_to_segments():
    probs = np.zeros((10, 4), np.float32)
    probs[2:5, 0] = 0.9  # spk0 frames 2-4
    probs[0:2, 2] = 0.8  # spk2 frames 0-1
    probs[8:10, 0] = 0.7  # spk0 frames 8-9 (runs to end)
    segs = probs_to_segments(probs, 0.5)
    assert [(s.speaker_id, round(s.start, 2), round(s.end, 2)) for s in segs] == [
        (2, 0.0, 0.08),
        (0, 0.16, 0.32),
        (0, 0.64, 0.72),  # run reaching T-1 closes at T-1 (sortformer.cpp:99-103)
    ]


def test_aosc_arrival_order():
    aosc = AOSCCache(4)
    probs = np.zeros((6, 4), np.float32)
    probs[1, 2] = 0.9  # speaker 2 appears first
    probs[3, 0] = 0.8  # then speaker 0
    aosc.update(probs)
    assert aosc.speaker_order() == [2, 0]
    # re-update does not duplicate
    aosc.update(probs)
    assert aosc.speaker_order() == [2, 0]
    aosc.reset()
    assert aosc.speaker_order() == []


# ─── diarize_transcription edge cases (test_all.cpp:1045-1177) ───────────────


def W(word, start, end, conf=1.0):
    return WordTimestamp(word, start, end, conf)


def S(spk, start, end):
    return DiarizationSegment(spk, start, end)


def test_alignment_basic():
    words = [W("hi", 0.0, 0.5), W("there", 0.6, 1.0)]
    segs = [S(0, 0.0, 0.55), S(1, 0.55, 1.2)]
    out = diarize_transcription(words, segs)
    assert [w.speaker_id for w in out] == [0, 1]


def test_alignment_gap_gets_minus_one():
    out = diarize_transcription([W("lost", 2.0, 2.5)], [S(0, 0.0, 1.0)])
    assert out[0].speaker_id == -1


def test_alignment_dominant_overlap():
    # word 0.0-1.0; spk0 covers 0.0-0.3, spk1 covers 0.3-1.0 → spk1 wins
    out = diarize_transcription([W("w", 0.0, 1.0)], [S(0, 0.0, 0.3), S(1, 0.3, 1.0)])
    assert out[0].speaker_id == 1


def test_alignment_accumulates_across_segments():
    # spk0 total overlap 0.6 across two segments beats spk1's single 0.4
    out = diarize_transcription(
        [W("w", 0.0, 1.0)],
        [S(0, 0.0, 0.3), S(1, 0.3, 0.7), S(0, 0.7, 1.0)],
    )
    assert out[0].speaker_id == 0


def test_alignment_preserves_time_and_confidence():
    out = diarize_transcription([W("w", 0.25, 0.75, 0.42)], [S(3, 0.0, 1.0)])
    assert out[0].start == 0.25 and out[0].end == 0.75
    assert abs(out[0].confidence - 0.42) < 1e-6
    assert out[0].speaker_id == 3
    assert out[0].word == "w"


def test_streaming_diarize_chunk(sf):
    aosc = AOSCCache(4)
    sf.reset_stream()
    rng = np.random.RandomState(6)
    segs1 = sf.diarize_chunk(rng.randn(1, 16, 128).astype(np.float32), aosc)
    segs2 = sf.diarize_chunk(rng.randn(1, 16, 128).astype(np.float32), aosc)
    assert isinstance(segs1, list) and isinstance(segs2, list)


def test_diarized_transcriber_e2e(tmp_path):
    """Full DiarizedTranscriber pipeline with tiny random models."""
    asr_cfg = C.TDTCTCConfig(
        encoder=C.EncoderConfig(mel_bins=80, subsampling_channels=8, hidden_size=16,
                                num_layers=1, num_heads=2, ffn_intermediate=32),
        prediction=C.PredictionConfig(vocab_size=9, pred_hidden=8, num_lstm_layers=1),
        joint=C.JointConfig(encoder_hidden=16, pred_hidden=8, joint_hidden=8, vocab_size=9),
        ctc_vocab_size=9,
    )
    vocab = tmp_path / "v.txt"
    vocab.write_text("\n".join(f"▁s{i}" for i in range(9)) + "\n")

    dt = DiarizedTranscriber(
        None, None, str(vocab), asr_cfg, tiny_sf_config(),
    )
    audio = (np.random.RandomState(8).randn(8000) * 0.1).astype(np.float32)
    res = dt.transcribe(audio)
    assert isinstance(res.text, str)
    assert len(res.words) == len(res.word_timestamps)
    for w in res.words:
        assert w.speaker_id >= -1
        assert w.end >= w.start


# ─── Speaker embeddings (reference Tier-3 roadmap item) ─────────────────────


def test_speaker_embeddings_weighted_mean_math():
    from parakeet_tpu.models.sortformer import speaker_embeddings

    rng = np.random.RandomState(3)
    hidden = rng.randn(6, 4).astype(np.float32)
    probs = np.zeros((6, 3), np.float32)
    probs[:, 0] = [0.9, 0.8, 0.1, 0.0, 0.0, 0.7]  # speaker 0: frames 0,1,5
    probs[:, 1] = 0.2  # never active
    probs[:, 2] = [0.0, 0.0, 0.6, 0.0, 0.0, 0.0]  # 1 frame < min_frames

    emb, active = speaker_embeddings(hidden, probs, activity_threshold=0.5)
    assert active == [True, False, False]
    w = np.array([0.9, 0.8, 0.7], np.float32)
    manual = (hidden[[0, 1, 5]] * w[:, None]).sum(0) / w.sum()
    manual /= np.linalg.norm(manual)
    np.testing.assert_allclose(emb[0], manual, rtol=1e-6)
    np.testing.assert_allclose(np.linalg.norm(emb[0]), 1.0, rtol=1e-6)
    assert np.all(emb[1] == 0) and np.all(emb[2] == 0)


def test_extract_embeddings_consistent_with_forward(sf):
    from parakeet_tpu.models.sortformer import sortformer_states

    rng = np.random.RandomState(17)
    feats = rng.randn(1, 64, 128).astype(np.float32)
    emb, active = sf.extract_embeddings(feats)
    assert emb.shape == (sf.config.max_speakers, sf.config.transformer_hidden)
    assert len(active) == sf.config.max_speakers
    # probs from the states path must equal the plain forward exactly
    _, probs = sortformer_states(sf.params, jnp.asarray(feats), cfg=sf.config)
    np.testing.assert_array_equal(np.asarray(probs), np.asarray(sf.forward(feats)))
    # deterministic
    emb2, active2 = sf.extract_embeddings(feats)
    np.testing.assert_array_equal(emb, emb2)
    assert active == active2
    for i, a in enumerate(active):
        if a:
            np.testing.assert_allclose(np.linalg.norm(emb[i]), 1.0, rtol=1e-5)

"""Neural LM (transformer) rescoring tests — reference roadmap README.md:514
("Neural LM rescoring") as a real, trainable capability."""

import numpy as np
import pytest

from parakeet_tpu.text.neural_lm import (
    NeuralLM,
    NeuralLMConfig,
    lm_log_probs,
    train_neural_lm,
)


CFG = NeuralLMConfig(vocab_size=12, hidden=32, num_layers=1, num_heads=2,
                     ffn_intermediate=64, max_len=32)


def test_log_probs_normalized():
    import jax.numpy as jnp

    lm = NeuralLM.random(CFG, seed=1)
    ids = jnp.asarray(np.array([[CFG.bos, 1, 2, 3]], np.int32))
    lp = np.asarray(lm_log_probs(lm.params, CFG, ids))
    assert lp.shape == (1, 4, CFG.vocab_size + 2)
    np.testing.assert_allclose(np.exp(lp).sum(-1), 1.0, rtol=1e-5)


def test_score_sequence_matches_advance_chain():
    lm = NeuralLM.random(CFG, seed=2)
    seq = [3, 1, 4, 1, 5]
    total = 0.0
    state = lm.start_state()
    for tok in seq:
        state, lp = lm.advance(state, tok)
        total += lp
    assert abs(total - lm.score_sequence(seq)) < 1e-4
    # batch path agrees with the scalar path
    a, b = lm.score_batch([seq, seq[:2]])
    assert abs(a - total) < 1e-4
    assert abs(b - lm.score_sequence(seq[:2])) < 1e-4


def test_trained_lm_rescores_expected_direction(tmp_path):
    """Train on a deterministic grammar (1 2 3 1 2 3 …): the trained LM must
    re-rank an n-best list to prefer the grammatical hypothesis over an
    equal-ASR-score scrambled one — the VERDICT's acceptance bar."""
    from dataclasses import dataclass

    from parakeet_tpu.text.ngram_lm import rescore_nbest

    rng = np.random.RandomState(0)
    seqs = []
    for _ in range(64):
        n = rng.randint(2, 9)
        seqs.append(([1, 2, 3] * 5)[:n])
    lm = train_neural_lm(seqs, CFG, steps=150, batch_size=16, seed=3)
    assert np.isfinite(lm.final_loss)

    grammatical = [1, 2, 3, 1, 2]
    scrambled = [2, 1, 1, 3, 2]
    assert lm.score_sequence(grammatical) > lm.score_sequence(scrambled) + 1.0

    @dataclass
    class Hyp:
        tokens: list
        score: float

    nbest = [Hyp(scrambled, -5.0), Hyp(grammatical, -5.1)]  # ASR prefers scrambled
    rescored = rescore_nbest(nbest, lm, lm_weight=0.5)
    assert rescored[0].tokens == grammatical

    # persistence round-trip preserves scores exactly
    p = tmp_path / "lm.safetensors"
    lm.save(p)
    lm2 = NeuralLM.load(p)
    assert lm2.cfg == lm.cfg
    assert abs(lm2.score_sequence(grammatical) - lm.score_sequence(grammatical)) < 1e-6


def test_neural_lm_in_transducer_beam_facade():
    """TranscribeOptions(lm=NeuralLM, beam_size>0) runs end-to-end through
    the facade (transducer beam n-best rescoring path)."""
    from parakeet_tpu import config as C
    from parakeet_tpu.transcribe import Decoder, Transcriber, TranscribeOptions

    cfg = C.TDTCTCConfig(
        encoder=C.EncoderConfig(mel_bins=80, subsampling_channels=8, hidden_size=16,
                                num_layers=1, num_heads=2, ffn_intermediate=32),
        prediction=C.PredictionConfig(vocab_size=12, pred_hidden=8, num_lstm_layers=1),
        joint=C.JointConfig(encoder_hidden=16, pred_hidden=8, joint_hidden=8, vocab_size=12),
        ctc_vocab_size=12,
    )
    tr = Transcriber(None, None, cfg, seed=11)
    lm = NeuralLM.random(CFG, seed=4)
    audio = np.random.RandomState(5).randn(8000).astype(np.float32) * 0.1
    res = tr.transcribe(audio, Decoder.TDT, beam_size=2, lm=lm, lm_weight=0.3)
    assert isinstance(res.token_ids, list)
    # CTC shallow-fusion path exercises start_state/advance
    res_c = tr.transcribe(audio, Decoder.CTC, beam_size=2, lm=lm, lm_weight=0.3)
    assert isinstance(res_c.token_ids, list)

"""Frozen-golden regression tests.

No real model weights exist in this environment, so these pin the FULL
pipeline's outputs for deterministic seed-0 random weights + deterministic
audio. Any numerics/semantics regression (frontend, encoder, decode loop,
detokenization) changes these values. The expected values were captured
from implementations that passed the cross-framework (torch) and
scalar-oracle equivalence tests.
"""

import numpy as np
import pytest

from parakeet_tpu import config as C
from parakeet_tpu.transcribe import Decoder, Transcriber


@pytest.fixture(scope="module")
def golden_transcriber(tmp_path_factory):
    cfg = C.TDTCTCConfig(
        encoder=C.EncoderConfig(mel_bins=80, subsampling_channels=16, hidden_size=32,
                                num_layers=2, num_heads=4, ffn_intermediate=64),
        prediction=C.PredictionConfig(vocab_size=21, pred_hidden=16, num_lstm_layers=1),
        joint=C.JointConfig(encoder_hidden=32, pred_hidden=16, joint_hidden=16, vocab_size=21),
        ctc_vocab_size=21,
    )
    vocab = tmp_path_factory.mktemp("g") / "v.txt"
    vocab.write_text("\n".join(f"▁g{i}" for i in range(21)) + "\n")
    return Transcriber(None, str(vocab), cfg, seed=42)


def _audio():
    t = np.arange(12000) / 16000.0
    return (0.4 * np.sin(2 * np.pi * 523.25 * t) * np.exp(-t)).astype(np.float32)


def test_golden_pipeline_deterministic(golden_transcriber):
    a = golden_transcriber.transcribe(_audio(), Decoder.CTC)
    b = golden_transcriber.transcribe(_audio(), Decoder.CTC)
    assert a.token_ids == b.token_ids
    assert a.text == b.text


def test_golden_values_pinned(golden_transcriber):
    """Pin actual outputs. If this fails after an intentional numerics
    change, re-capture by running with PRINT_GOLDEN=1."""
    import os

    ctc = golden_transcriber.transcribe(_audio(), Decoder.CTC)
    tdt = golden_transcriber.transcribe(_audio(), Decoder.TDT, timestamps=True)
    got = {
        "ctc": ctc.token_ids,
        "tdt": tdt.token_ids,
        "tdt_spans": [(t.start_frame, t.end_frame) for t in tdt.timestamped_tokens],
        "tdt_conf": [round(t.confidence, 4) for t in tdt.timestamped_tokens],
    }
    if os.environ.get("PRINT_GOLDEN"):
        print("GOLDEN:", got)

    # captured 2026-08-16 (seed-42 tiny model, CPU f32, Precision.HIGHEST)
    expected = GOLDEN
    assert got["ctc"] == expected["ctc"]
    assert got["tdt"] == expected["tdt"]
    assert got["tdt_spans"] == expected["tdt_spans"]
    np.testing.assert_allclose(got["tdt_conf"], expected["tdt_conf"], atol=2e-3)


GOLDEN: dict = {
    "ctc": [19, 17],
    "tdt": [13, 18, 13],
    "tdt_spans": [(0, 2), (3, 5), (9, 9)],
    "tdt_conf": [0.2708, 0.1557, 0.169],
}

"""Asset-gated golden integration tests (reference test_all.cpp tier 2:
substring-level checks on the LibriSpeech 'portrait' clip). These skip
unless real model assets are present under models/ — exactly the
reference's GTEST_SKIP pattern (test_all.cpp:17-39, 878-885)."""

import pytest

from tests.conftest import asset, require_assets


@pytest.fixture(scope="module")
def transcriber():
    weights, vocab, _ = require_assets("model.safetensors", "vocab.txt", "2086-149220-0033.wav")
    from parakeet_tpu.transcribe import Transcriber

    return Transcriber(str(weights), str(vocab))


@pytest.fixture(scope="module")
def clip():
    return str(asset("2086-149220-0033.wav"))


def test_ctc_transcript_contains_portrait(transcriber, clip):
    from parakeet_tpu.transcribe import Decoder

    res = transcriber.transcribe(clip, Decoder.CTC)
    assert "portrait" in res.text.lower()


def test_tdt_transcript_contains_portrait(transcriber, clip):
    from parakeet_tpu.transcribe import Decoder

    res = transcriber.transcribe(clip, Decoder.TDT)
    assert "portrait" in res.text.lower()


def test_ctc_vs_tdt_cross_check(transcriber, clip):
    """CTC and TDT should mostly agree (test_all.cpp:951-963)."""
    from parakeet_tpu.metrics import word_error_rate
    from parakeet_tpu.transcribe import Decoder

    ctc = transcriber.transcribe(clip, Decoder.CTC).text
    tdt = transcriber.transcribe(clip, Decoder.TDT).text
    assert word_error_rate(ctc, tdt).wer < 0.2


def test_timestamps_monotonic_and_bounded(transcriber, clip):
    from parakeet_tpu.audio.io import get_audio_duration
    from parakeet_tpu.transcribe import Decoder

    res = transcriber.transcribe(clip, Decoder.TDT, timestamps=True)
    words = res.word_timestamps
    assert words
    dur = get_audio_duration(clip)
    last = -1.0
    for w in words:
        assert w.start >= last - 1e-6
        assert w.end >= w.start
        assert w.end <= dur + 1.0
        assert 0.0 <= w.confidence <= 1.0
        last = w.start


def test_token_ids_invariant_to_timestamps(transcriber, clip):
    """Decoding with/without timestamps must yield identical token ids
    (test_all.cpp:965-981)."""
    from parakeet_tpu.transcribe import Decoder

    plain = transcriber.transcribe(clip, Decoder.TDT)
    with_ts = transcriber.transcribe(clip, Decoder.TDT, timestamps=True)
    assert plain.token_ids == with_ts.token_ids


def test_boosted_transcript(transcriber, clip):
    """Boosting must keep 'portrait' and can pull in 'phoebe'
    (test_all.cpp:1467-1482)."""
    from parakeet_tpu.transcribe import Decoder

    res = transcriber.transcribe(
        clip, Decoder.TDT, boost_phrases=["portrait", "Phoebe"], boost_score=5.0
    )
    assert "portrait" in res.text.lower()


def test_diarized_e2e():
    weights, vocab, wav, sf = require_assets(
        "model.safetensors", "vocab.txt", "2086-149220-0033.wav", "sortformer.safetensors"
    )
    from parakeet_tpu.diarize import DiarizedTranscriber

    dt = DiarizedTranscriber(str(weights), str(sf), str(vocab))
    res = dt.transcribe(str(wav))
    assert res.words
    last = -1.0
    for w in res.words:
        assert w.start >= last - 1e-6
        assert w.speaker_id >= -1
        last = w.start


def test_reference_dump_parity_bridge():
    """When the C++ reference's debug dumps are present alongside the
    assets, run the cross-implementation parity bridge end-to-end (SURVEY
    §4 tier 3 — the primary acceptance test once real artifacts exist)."""
    weights, _, clip_path = require_assets(
        "model.safetensors", "vocab.txt", "2086-149220-0033.wav"
    )
    dump = asset("debug_features_cpp.bin")
    if not dump.exists():
        pytest.skip("no reference debug dumps under models/")

    import importlib.util
    from pathlib import Path

    spec = importlib.util.spec_from_file_location(
        "dump_stages", Path(__file__).resolve().parent.parent / "scripts" / "dump_stages.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    stages = mod.compute_stages(str(clip_path), str(weights))
    ref_flat = mod.load_ref_dump(dump)
    assert stages["features"].size == ref_flat.size, (
        f"feature dump size mismatch: ours {stages['features'].shape}, ref {ref_flat.size}"
    )
    import numpy as np

    diff = np.abs(stages["features"].astype(np.float64).ravel() - ref_flat)
    assert diff.max() < 1e-3, f"mel features diverge from the C++ dump: max {diff.max():.2e}"

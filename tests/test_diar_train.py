"""Diarization training data pipeline (RTTM → arrival-ordered frame
targets → DiarizationDataLoader) and the parakeet-train-diar CLI."""

from __future__ import annotations

import json

import numpy as np
import pytest

from parakeet_tpu.audio.io import write_wav
from parakeet_tpu.config import AudioConfig
from parakeet_tpu.data import (
    DiarizationDataLoader,
    DiarizationDataset,
    read_rttm,
    rttm_to_targets,
)
from parakeet_tpu.models.encoder import subsample_length
from parakeet_tpu.train_diar_cli import build_argparser, main


def test_read_rttm_parses_speaker_lines(tmp_path):
    p = tmp_path / "a.rttm"
    p.write_text(
        "SPEAKER rec 1 0.50 1.25 <NA> <NA> alice <NA> <NA>\n"
        "NON-SPEECH rec 1 2.00 0.30 <NA> <NA> <NA> <NA> <NA>\n"
        "SPEAKER rec 1 1.00 0.75 <NA> <NA> bob <NA> <NA>\n"
    )
    segs = read_rttm(p)
    assert segs == [("alice", 0.50, 1.25), ("bob", 1.00, 0.75)]


def test_read_rttm_rejects_malformed(tmp_path):
    p = tmp_path / "bad.rttm"
    p.write_text("SPEAKER rec 1 0.5\n")
    with pytest.raises(ValueError, match=">=8 fields"):
        read_rttm(p)
    p.write_text("SPEAKER rec 1 0.5 -1.0 <NA> <NA> s <NA>\n")
    with pytest.raises(ValueError, match="negative duration"):
        read_rttm(p)


def test_rttm_to_targets_arrival_order():
    # bob speaks first → channel 0; alice second → channel 1
    segs = [("alice", 2.0, 1.0), ("bob", 0.0, 1.0), ("alice", 4.0, 0.5)]
    tgt = rttm_to_targets(segs, num_frames=100, frame_seconds=0.08, max_speakers=4)
    assert tgt.shape == (100, 4)
    # bob: 0.0-1.0 s → frames 0-12 (0.08 s frames)
    assert tgt[:12, 0].all() and not tgt[13:, 0].any()
    # alice: 2.0-3.0 s → frames 25-37, and 4.0-4.5 s → 50-56
    assert tgt[25:37, 1].all() and tgt[50:56, 1].all()
    assert not tgt[:, 2:].any()


def test_rttm_to_targets_overflow_speakers_dropped_by_arrival():
    segs = [(f"s{i}", float(i), 0.5) for i in range(6)]
    tgt = rttm_to_targets(segs, num_frames=200, frame_seconds=0.05, max_speakers=4)
    # first four arrivals kept, s4/s5 dropped
    assert tgt.sum() == pytest.approx(4 * 10)


def write_diar_corpus(tmp_path, n=4):
    rng = np.random.RandomState(0)
    lines = []
    for i in range(n):
        dur = 0.4 + 0.1 * i
        wav = tmp_path / f"c{i}.wav"
        write_wav(wav, 0.1 * rng.randn(int(16000 * dur)).astype(np.float32))
        rttm = tmp_path / f"c{i}.rttm"
        rttm.write_text(
            f"SPEAKER c{i} 1 0.00 {dur / 2:.2f} <NA> <NA> spk_a <NA> <NA>\n"
            f"SPEAKER c{i} 1 {dur / 2:.2f} {dur / 2:.2f} <NA> <NA> spk_b <NA> <NA>\n"
        )
        lines.append(json.dumps({"audio_filepath": wav.name, "rttm_filepath": rttm.name}))
    m = tmp_path / "diar.jsonl"
    m.write_text("\n".join(lines) + "\n")
    return m


def test_diarization_loader_batch_schema(tmp_path):
    m = write_diar_corpus(tmp_path)
    ds = DiarizationDataset(m)
    loader = DiarizationDataLoader(
        ds, batch_size=2,
        audio_config=AudioConfig(n_mels=128, normalize=False),
        max_speakers=4, frame_multiple=32, shuffle=False,
    )
    batches = list(loader)
    assert len(batches) == 2
    b = batches[0]
    assert b["features"].shape[2] == 128
    assert b["features"].shape[1] % 32 == 0
    assert b["targets"].shape == (
        2, subsample_length(b["features"].shape[1]), 4
    )
    assert b["mel_lengths"].shape == (2,)
    # both synthetic speakers active somewhere, arrival-ordered channels
    assert b["targets"][..., 0].sum() > 0 and b["targets"][..., 1].sum() > 0
    assert not b["targets"][..., 2:].any()
    # no activity beyond each clip's valid encoder frames
    for r in range(2):
        valid = subsample_length(int(b["mel_lengths"][r]))
        assert not b["targets"][r, valid:].any()


def test_diarization_dataset_requires_rttm(tmp_path):
    m = tmp_path / "bad.jsonl"
    m.write_text(json.dumps({"audio_filepath": "x.wav"}) + "\n")
    with pytest.raises(ValueError, match="rttm_filepath"):
        DiarizationDataset(m)


def test_argparser_defaults():
    args = build_argparser().parse_args(["--manifest", "m.jsonl"])
    assert args.model == "sortformer-117m" and args.sort_weight == 0.5


@pytest.mark.slow
def test_diar_cli_end_to_end(tmp_path, capsys):
    m = write_diar_corpus(tmp_path)
    ck = tmp_path / "ck"
    out = tmp_path / "sf.safetensors"
    base = ["--manifest", str(m), "--model", "tiny", "--batch-size", "2",
            "--data-parallel", "2", "--frame-multiple", "32",
            "--checkpoint-dir", str(ck)]
    rc = main(base + ["--steps", "2", "--checkpoint-every", "1",
                      "--export", str(out), "--log-every", "1"])
    assert rc == 0
    assert (ck / "state.safetensors").exists() and out.exists()

    # exported weights load into a Sortformer
    from parakeet_tpu.models.sortformer import Sortformer
    from parakeet_tpu.train_diar_cli import _preset

    sf = Sortformer(str(out), config=_preset("tiny"))
    probs = sf.forward(np.random.RandomState(1).randn(1, 64, 128).astype(np.float32))
    assert probs.shape[-1] == 4

    capsys.readouterr()
    rc = main(base + ["--steps", "3", "--resume", "--remat", "--accum-steps", "2"])
    assert rc == 0
    assert "# resumed at step 2" in capsys.readouterr().err

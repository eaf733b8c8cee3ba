"""Parity-bridge tests: scripts/dump_stages.py --compare-ref must read the
C++ reference's debug dump format (headerless little-endian f32,
compare_features.py:62-78 / compare_encoder.py:74-113, NCHW conv stages)
and report per-stage diffs with no manual conversion."""

import importlib.util
import sys
from pathlib import Path

import numpy as np
import pytest

from parakeet_tpu.audio.io import write_wav

REPO = Path(__file__).resolve().parent.parent


@pytest.fixture(scope="module")
def dump_stages():
    spec = importlib.util.spec_from_file_location(
        "dump_stages", REPO / "scripts" / "dump_stages.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def stages(dump_stages, tmp_path_factory):
    wav = tmp_path_factory.mktemp("audio") / "clip.wav"
    rng = np.random.RandomState(7)
    write_wav(wav, (0.1 * rng.randn(4000)).clip(-1, 1).astype(np.float32), 16000)
    return str(wav), dump_stages.compute_stages(str(wav), None)


def _write_ref_dumps(ref_dir: Path, stage_arrays: dict) -> None:
    """Synthesize a reference dump dir from our own stage arrays (already in
    reference layout — compute_stages pre-transposes conv stages to NCHW)."""
    ref_dir.mkdir(exist_ok=True)
    for name, candidates in {
        "features": ("debug_features_cpp.bin",),
        "after_conv1": ("debug_after_conv1.bin",),
        "after_block1": ("debug_after_block1.bin",),
        "after_block2": ("debug_after_block2.bin",),
        "subsampling_out": ("debug_subsampling_out.bin",),
        "layer0": ("debug_after_layer0.bin",),
    }.items():
        stage_arrays[name].astype("<f4").ravel().tofile(ref_dir / candidates[0])


def test_compare_ref_zero_diff(dump_stages, stages, tmp_path, capsys):
    """Our pipeline diffed against dumps synthesized from itself → all zeros,
    exit 0, one report line per registered stage."""
    wav, stage_arrays = stages
    ref_dir = tmp_path / "ref"
    _write_ref_dumps(ref_dir, stage_arrays)

    args = type("A", (), dict(audio=wav, weights=None, compare_ref=str(ref_dir), outdir=None))
    assert dump_stages.compare_ref(args) == 0
    out = capsys.readouterr().out
    for name in dump_stages.REF_STAGE_FILES:
        assert f"{name}: max abs diff" in out, out
    assert "MISMATCH" not in out


def test_compare_ref_reports_real_diff(dump_stages, stages, tmp_path, capsys):
    wav, stage_arrays = stages
    ref_dir = tmp_path / "ref"
    _write_ref_dumps(ref_dir, stage_arrays)
    # perturb one value in the features dump
    feats = stage_arrays["features"].astype("<f4").ravel()
    feats[3] += 0.25
    feats.tofile(ref_dir / "debug_features_cpp.bin")

    args = type("A", (), dict(audio=wav, weights=None, compare_ref=str(ref_dir), outdir=None))
    assert dump_stages.compare_ref(args) == 0  # diffs are reported, not fatal
    out = capsys.readouterr().out
    line = next(l for l in out.splitlines() if l.startswith("features:"))
    # 0.25 → 2.5e-01 up to the frontend's f32 summation noise (~1e-7)
    reported = float(line.split("max abs diff")[1].split()[0])
    assert abs(reported - 0.25) < 1e-5


def test_compare_ref_size_mismatch_fails(dump_stages, stages, tmp_path, capsys):
    wav, stage_arrays = stages
    ref_dir = tmp_path / "ref"
    _write_ref_dumps(ref_dir, stage_arrays)
    np.zeros(17, "<f4").tofile(ref_dir / "debug_after_conv1.bin")

    args = type("A", (), dict(audio=wav, weights=None, compare_ref=str(ref_dir), outdir=None))
    assert dump_stages.compare_ref(args) == 1
    assert "SIZE MISMATCH" in capsys.readouterr().out


def test_compare_ref_accepts_npy_artifacts(dump_stages, stages, tmp_path, capsys):
    """debug_features_py.npy (debug_encoder.py:204) is accepted when the .bin
    is absent."""
    wav, stage_arrays = stages
    ref_dir = tmp_path / "ref"
    ref_dir.mkdir()
    np.save(ref_dir / "debug_features_py.npy", stage_arrays["features"])

    args = type("A", (), dict(audio=wav, weights=None, compare_ref=str(ref_dir), outdir=None))
    assert dump_stages.compare_ref(args) == 0
    out = capsys.readouterr().out
    assert "features: max abs diff 0.0" in out


def test_compare_ref_empty_dir_errors(dump_stages, stages, tmp_path):
    wav, _ = stages
    ref_dir = tmp_path / "empty"
    ref_dir.mkdir()
    args = type("A", (), dict(audio=wav, weights=None, compare_ref=str(ref_dir), outdir=None))
    assert dump_stages.compare_ref(args) == 1

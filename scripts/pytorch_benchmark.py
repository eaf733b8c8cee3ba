#!/usr/bin/env python
"""PyTorch-CPU encoder timing baseline — the analogue of the reference's
`scripts/pytorch_benchmark.py:51-189` (which times the NeMo
preprocessor+encoder on cpu/mps for cross-engine comparison).

Builds the independent torch reference encoder (parakeet_tpu.tools.torch_ref,
same flat safetensors schema as the JAX models) and times it on CPU with
the same methodology as both the reference and our bench.py: synthetic
`randn(batch, secs*100, mel)` features, warmup excluded, mean±std over N
runs, RTF = time / audio-seconds. Optionally times our JAX encoder on CPU
in the same process for a same-host side-by-side.

No NeMo exists in this environment (zero egress), so unlike the reference
script this benchmarks the torch rebuild from our own schema — which is
exactly what compare_encoder.py-style parity requires anyway.

Usage:
  python scripts/pytorch_benchmark.py [--model 110m] [--secs 10] [--batch 1]
      [--runs 5] [--threads N] [--weights model.safetensors] [--jax-cpu]
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402

#: FastConformer-encoder subset of parakeet_tpu.benchmark.MODELS (the torch
#: reference implements the encoder only; sortformer's transformer head is
#: out of scope here)
MODELS = ("110m", "tdt-600m", "rnnt-600m")


def get_encoder_cfg(model: str):
    from parakeet_tpu import config as C
    from parakeet_tpu.benchmark import MODELS as _BENCH_MODELS

    if model not in MODELS:
        raise SystemExit(f"unknown model {model!r}; choose from {MODELS}")
    factory_name, enc_attr = _BENCH_MODELS[model]  # single dispatch table
    return getattr(getattr(C, factory_name)(), enc_attr)


def bench_torch_encoder(params, cfg, feats_np, runs: int = 5, warmup: int = 2):
    """Time torch_ref.torch_encoder on CPU. Returns dict with mean/std ms.
    Callers benchmarking several durations should pre-convert params with
    to_torch_params once (t() passes torch tensors through)."""
    import torch

    from parakeet_tpu.tools.torch_ref import to_torch_params, torch_encoder

    if not all(isinstance(v, torch.Tensor) for v in params.values()):
        params = to_torch_params(params)  # conversion excluded from timing
    x = torch.from_numpy(feats_np)
    with torch.no_grad():
        for _ in range(warmup):
            torch_encoder(params, cfg, x)
        times = []
        for _ in range(runs):
            t0 = time.perf_counter()
            out = torch_encoder(params, cfg, x)
            times.append(time.perf_counter() - t0)
    mean = statistics.mean(times)
    std = statistics.stdev(times) if len(times) > 1 else 0.0
    return {"mean_ms": mean * 1e3, "std_ms": std * 1e3, "out_shape": tuple(out.shape)}


def bench_jax_encoder(params, cfg, feats_np, runs: int = 5, warmup: int = 2):
    """Time our JAX encoder on CPU (fetch-synchronized; CPU backend's
    block_until_ready is honest, unlike the TPU relay — see TUNING.md)."""
    import jax
    import jax.numpy as jnp

    from parakeet_tpu.models.encoder import fastconformer_encode
    from parakeet_tpu.params import Params

    fwd = jax.jit(lambda p, x: fastconformer_encode(Params(p).sub("encoder_"), cfg, x))
    jparams = {k: jnp.asarray(v) for k, v in params.items()}
    x = jnp.asarray(feats_np)
    for _ in range(warmup):
        fwd(jparams, x).block_until_ready()
    times = []
    for _ in range(runs):
        t0 = time.perf_counter()
        out = fwd(jparams, x)
        np.asarray(out[0, 0, 0])  # host fetch
        times.append(time.perf_counter() - t0)
    mean = statistics.mean(times)
    std = statistics.stdev(times) if len(times) > 1 else 0.0
    return {"mean_ms": mean * 1e3, "std_ms": std * 1e3, "out_shape": tuple(out.shape)}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="110m", choices=MODELS)
    ap.add_argument("--secs", type=int, nargs="+", default=[10],
                    help="audio durations to test (reference uses 1 5 10 30 60)")
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument("--warmup", type=int, default=2)
    ap.add_argument("--threads", type=int, default=None, help="torch CPU threads")
    ap.add_argument("--weights", default=None, help="safetensors path (random init if absent)")
    ap.add_argument("--jax-cpu", action="store_true",
                    help="also time our JAX encoder on CPU for a same-host comparison")
    ap.add_argument("--json", action="store_true", help="emit one JSON line per row")
    args = ap.parse_args()

    # This is a CPU benchmark: force the CPU backend unconditionally BEFORE
    # any jax use (the TPU plugin ignores JAX_PLATFORMS env — CLAUDE.md).
    # Without this, load_params would init every weight on the relay TPU
    # and the np.asarray fetch below would pay hundreds of round trips.
    import jax

    jax.config.update("jax_platforms", "cpu")

    import torch

    if args.threads:
        torch.set_num_threads(args.threads)

    from parakeet_tpu import params as P

    cfg = get_encoder_cfg(args.model)
    spec = P.encoder_spec(cfg, "encoder_")
    params = P.load_params(spec, args.weights, warn=lambda m: print(f"# {m}", file=sys.stderr))
    params = {k: np.asarray(v) for k, v in params.items()}
    from parakeet_tpu.tools.torch_ref import to_torch_params

    torch_params = to_torch_params(params)  # once, outside every timed sweep

    print(f"# {args.model}: {cfg.num_layers} layers, d={cfg.hidden_size}, "
          f"{cfg.mel_bins} mel; torch {torch.__version__}, "
          f"{torch.get_num_threads()} threads", file=sys.stderr)

    rows = []
    for secs in args.secs:
        feats = np.random.RandomState(0).randn(
            args.batch, secs * 100, cfg.mel_bins).astype(np.float32)
        r = bench_torch_encoder(torch_params, cfg, feats, runs=args.runs, warmup=args.warmup)
        audio_s = args.batch * secs
        row = {
            "engine": "torch-cpu", "model": args.model, "secs": secs,
            "batch": args.batch, "mean_ms": round(r["mean_ms"], 2),
            "std_ms": round(r["std_ms"], 2),
            "rtf": round(r["mean_ms"] / 1e3 / audio_s, 5),
            "rtfx": round(audio_s / (r["mean_ms"] / 1e3), 1),
        }
        rows.append(row)
        if args.jax_cpu:
            j = bench_jax_encoder(params, cfg, feats, runs=args.runs, warmup=args.warmup)
            rows.append({
                "engine": "jax-cpu", "model": args.model, "secs": secs,
                "batch": args.batch, "mean_ms": round(j["mean_ms"], 2),
                "std_ms": round(j["std_ms"], 2),
                "rtf": round(j["mean_ms"] / 1e3 / audio_s, 5),
                "rtfx": round(audio_s / (j["mean_ms"] / 1e3), 1),
            })

    if args.json:
        for row in rows:
            print(json.dumps(row))
    else:
        print(f"{'engine':<10} {'secs':>5} {'batch':>5} {'mean ms':>10} {'std':>7} "
              f"{'RTF':>8} {'RTFx':>8}")
        for row in rows:
            print(f"{row['engine']:<10} {row['secs']:>5} {row['batch']:>5} "
                  f"{row['mean_ms']:>10.2f} {row['std_ms']:>7.2f} "
                  f"{row['rtf']:>8.5f} {row['rtfx']:>8.1f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

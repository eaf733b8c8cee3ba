#!/usr/bin/env python
"""Streaming latency ladder: per-chunk compute latency (mean + p95) for the
eou-120m transcriber and ALL FOUR Nemotron latency modes {0, 1, 6, 13}
(nemotron.hpp:27-29 — right context of m encoder frames gives an
architectural emission latency of (m+1)·80 ms: 80/160/560/1120 ms), at
B=1 and at the serving-knee batch, bf16 and int4 weights (VERDICT r4 #4).

"Compute fits the budget" means two things, both reported:
  - real-time: p95 step compute <= the step's audio duration (the stream
    cannot fall behind);
  - latency: p95 step compute <= the mode's architectural budget (compute
    must not add a full budget on top of the lookahead the mode already
    spends).
Mode 0 (80 ms) is measured at mel_frames_per_step=8 — an 80 ms cadence is
the only way to deliver an 80 ms promise; the other modes and eou use the
default 16 (160 ms cadence, the production serving step).

Methodology: same honesty rules as bench.py — each step() ends in ONE
host fetch (the packed decode output), which is the only synchronization
the relay honors, so per-step wall times ARE per-chunk latencies as a
serving worker experiences them (dispatch + device compute + fetch).

Run: python scripts/bench_latency.py [--steps 40] [--models eou nemotron]
     [--quantize none int4] [--out LATENCY.json]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

try:
    import parakeet_tpu  # noqa: F401
except ModuleNotFoundError:  # source checkout: scripts/ is sys.path[0]
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402


def bench_one(model: str, latency_frames: int | None, batch: int, steps: int,
              mel_step: int, quantize: str | None, compute_dtype: str) -> dict:
    from parakeet_tpu.config import make_nemotron_600m_config
    from parakeet_tpu.streaming import StreamingBatchTranscriber

    cfg = None
    if model == "nemotron":
        cfg = make_nemotron_600m_config(latency_frames)
    bt = StreamingBatchTranscriber(batch, None, None, cfg, model=model,
                                   mel_frames_per_step=mel_step, seed=0,
                                   frontend="fused", wire_dtype="int16",
                                   quantize=quantize,
                                   compute_dtype=compute_dtype)
    hop = bt._audio_cfg.hop_length
    win = bt._audio_cfg.win_length
    chunk_samples = mel_step * hop + (win - hop)
    step_s = mel_step * hop / bt._audio_cfg.sample_rate  # audio advanced/step
    rng = np.random.RandomState(0)
    audio = (0.05 * rng.randn((steps + 12) * chunk_samples + 16000) * 32768.0)
    audio = audio.clip(-32768, 32767).astype(np.int16)
    for slot in range(batch):
        bt.push(slot, audio[: 4 * chunk_samples])
    pos = 4 * chunk_samples

    for _ in range(3):  # warmup: compile the fused step
        for slot in range(batch):
            bt.push(slot, audio[pos : pos + chunk_samples])
        pos += chunk_samples
        bt.step()

    times = []
    for _ in range(steps):
        for slot in range(batch):
            bt.push(slot, audio[pos : pos + chunk_samples])
        pos += chunk_samples
        t0 = time.perf_counter()
        bt.step()
        times.append(time.perf_counter() - t0)
    times = np.asarray(times) * 1e3  # ms
    budget_ms = (
        (latency_frames + 1) * 80.0 if latency_frames is not None else
        mel_step * 10.0  # eou: its budget IS the chunk cadence
    )
    mean, p95 = float(times.mean()), float(np.percentile(times, 95))
    return {
        "model": model,
        "latency_mode": latency_frames,
        "budget_ms": budget_ms,
        "batch": batch,
        "mel_frames_per_step": mel_step,
        "cadence_ms": round(step_s * 1e3, 1),
        "weights": quantize or compute_dtype,
        "mean_ms": round(mean, 2),
        "p95_ms": round(p95, 2),
        "realtime_ok": bool(p95 <= step_s * 1e3),
        "budget_ok": bool(p95 <= budget_ms),
        "streams_per_chip": round(batch * step_s * 1e3 / mean, 1),
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=40)
    ap.add_argument("--models", nargs="+", default=["eou", "nemotron"],
                    choices=["eou", "nemotron"])
    ap.add_argument("--quantize", nargs="+", default=["none", "int4"],
                    choices=["none", "int4", "int8"])
    ap.add_argument("--compute-dtype", default="bfloat16",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--batches", type=int, nargs="*", default=None,
                    help="override the per-model {1, knee} batch pair")
    ap.add_argument("--out", default=None, help="write all rows as JSON")
    args = ap.parse_args()

    knee = {"eou": 64, "nemotron": 32}  # TUNING.md serving knees
    rows = []
    for model in args.models:
        batches = args.batches or [1, knee[model]]
        modes = [None] if model == "eou" else [0, 1, 6, 13]
        for m in modes:
            mel_step = 8 if m == 0 else 16
            for b in batches:
                for q in args.quantize:
                    rec = bench_one(model, m, b, args.steps, mel_step,
                                    None if q == "none" else q,
                                    args.compute_dtype)
                    rows.append(rec)
                    print(json.dumps(rec), flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump({"rows": rows, "compute_dtype": args.compute_dtype}, f,
                      indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())

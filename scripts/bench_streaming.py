#!/usr/bin/env python
"""Streaming multiplexing throughput: how many concurrent REAL-TIME
streams one chip sustains via StreamingBatchTranscriber.

Methodology (same honesty rules as bench.py — block_until_ready lies on
the axon relay, so we amortize over many steps and synchronize with one
host fetch): fill all B slots with synthetic audio, run N uniform batch
steps (encoder chunk + jitted decode per step), wall-clock / N = cost of
advancing ALL B streams by `mel_frames_per_step` mel frames (= step_s
seconds of audio each). Real-time capacity = B * step_s / step_time;
reported per model at several batch sizes.

Run: python scripts/bench_streaming.py [--model eou|nemotron]
     [--batches 1 8 32 64] [--steps 40]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402


def bench_one(model: str, batch: int, steps: int, mel_step: int = 16) -> dict:
    from parakeet_tpu.streaming import StreamingBatchTranscriber

    bt = StreamingBatchTranscriber(batch, None, None, model=model,
                                   mel_frames_per_step=mel_step, seed=0)
    hop = bt._audio_cfg.hop_length
    step_s = mel_step * hop / bt._audio_cfg.sample_rate  # audio seconds/step
    rng = np.random.RandomState(0)
    # pre-buffer enough mel frames for warmup + timed steps in every slot
    need_samples = (steps + 8) * mel_step * hop + 16000
    for slot in range(batch):
        bt.push(slot, (0.05 * rng.randn(need_samples)).astype(np.float32))

    for _ in range(4):  # warmup: compile encoder chunk + decode loop
        bt.step()
    # synchronize: token lists are host-side already (step fetches), so the
    # wall clock below includes every host<->device round trip per step —
    # exactly what a serving worker pays
    t0 = time.perf_counter()
    for _ in range(steps):
        bt.step()
    dt = (time.perf_counter() - t0) / steps
    streams = batch * step_s / dt
    return {
        "model": model, "batch": batch, "ms_per_step": round(dt * 1e3, 2),
        "audio_s_per_step": step_s,
        "realtime_streams_per_chip": round(streams, 1),
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="eou", choices=["eou", "nemotron"])
    ap.add_argument("--batches", type=int, nargs="+", default=[1, 8, 32, 64])
    ap.add_argument("--steps", type=int, default=40)
    args = ap.parse_args()

    for b in args.batches:
        rec = bench_one(args.model, b, args.steps)
        print(json.dumps(rec), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())

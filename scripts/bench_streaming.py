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


def bench_one(model: str, batch: int, steps: int, mel_step: int = 16,
              wire_dtype: str = "int16", quantize: str | None = None) -> dict:
    from parakeet_tpu.streaming import StreamingBatchTranscriber

    bt = StreamingBatchTranscriber(batch, None, None, model=model,
                                   mel_frames_per_step=mel_step, seed=0,
                                   frontend="fused", wire_dtype=wire_dtype,
                                   quantize=quantize)
    hop = bt._audio_cfg.hop_length
    win = bt._audio_cfg.win_length
    # The streaming frontend's grid-restart-at-consumed semantics (inherited
    # from the reference, audio.cpp:232-235) re-pay the (win-hop) window
    # overlap on every push: exactly mel_step frames come out of
    # mel_step*hop + (win-hop) samples, with zero queue drift. That is the
    # honest audio-seconds-per-step for real-time capacity.
    chunk_samples = mel_step * hop + (win - hop)
    step_s = chunk_samples / bt._audio_cfg.sample_rate
    rng = np.random.RandomState(0)
    audio = (0.05 * rng.randn((steps + 12) * chunk_samples + 16000)).astype(np.float32)
    if wire_dtype == "int16":
        audio = (audio * 32768.0).clip(-32768, 32767).astype(np.int16)
    # small pre-buffer so the queue never runs a slot dry mid-loop
    for slot in range(batch):
        bt.push(slot, audio[: 4 * chunk_samples])
    pos = 4 * chunk_samples

    for _ in range(3):  # warmup: compile encoder chunk + decode loop
        for slot in range(batch):
            bt.push(slot, audio[pos : pos + chunk_samples])
        pos += chunk_samples
        bt.step()
    # The timed loop is the FULL serving step: per-slot raw-audio feed
    # through the mel frontend (one device program per slot — a real cost
    # on relay-attached TPUs) + the fused batched encoder/decode step +
    # the single host fetch. Token lists land host-side each step, so the
    # wall clock includes every host<->device round trip a worker pays.
    t0 = time.perf_counter()
    for _ in range(steps):
        for slot in range(batch):
            bt.push(slot, audio[pos : pos + chunk_samples])
        pos += chunk_samples
        bt.step()
    dt = (time.perf_counter() - t0) / steps
    streams = batch * step_s / dt
    return {
        "model": model, "batch": batch, "ms_per_step": round(dt * 1e3, 2),
        "audio_s_per_step": step_s,
        "realtime_streams_per_chip": round(streams, 1),
        "quantize": quantize,
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="eou", choices=["eou", "nemotron"])
    ap.add_argument("--batches", type=int, nargs="+", default=[1, 8, 32, 64])
    ap.add_argument("--steps", type=int, default=40)
    ap.add_argument("--wire-dtype", default="int16", choices=["float32", "int16"],
                    help="raw-audio upload dtype (int16 = serving config, half the bytes)")
    ap.add_argument("--quantize", default=None, choices=["int8", "int4"],
                    help="weight-only quantized cohort (decode re-reads the "
                         "prediction/joint weights every step — the "
                         "weight-bound path; distinct operating point)")
    args = ap.parse_args()

    for b in args.batches:
        rec = bench_one(args.model, b, args.steps, wire_dtype=args.wire_dtype,
                        quantize=args.quantize)
        print(json.dumps(rec), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())

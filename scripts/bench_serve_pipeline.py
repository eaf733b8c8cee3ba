"""Measure the pipelined TranscriptionService's facade throughput.

A/B: pipeline=False (single worker: load+frontend+device+fetch serialized
per cohort) vs pipeline=True (prepare_batch overlaps the next cohort's
audio load + mel frontend with the current cohort's device work). Feeds N
cohorts of raw waveforms (so "load" is cheap — the overlap being measured
is the frontend + host/RPC latency), reports wall-clock audio-seconds/s.

Run on TPU:  python scripts/bench_serve_pipeline.py --batch 32 --cohorts 8
"""

from __future__ import annotations

import argparse
import sys
import time

try:
    import parakeet_tpu  # noqa: F401
except ModuleNotFoundError:  # source checkout: scripts/ is sys.path[0]
    import pathlib as _pl
    import sys as _sys

    _sys.path.insert(0, str(_pl.Path(__file__).resolve().parent.parent))



def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--cohorts", type=int, default=8)
    ap.add_argument("--secs", type=float, default=10.0)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--device", default=None, choices=[None, "cpu"])
    ap.add_argument("--kernels", default="block4hp")
    args = ap.parse_args()

    if args.device == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from parakeet_tpu.serve import TranscriptionService
    from parakeet_tpu.transcribe import Transcriber

    tr = Transcriber(None, None, compute_dtype=args.dtype, kernels=args.kernels)
    rng = np.random.RandomState(0)
    n = int(args.secs * 16000)
    clips = [(0.1 * rng.randn(n)).astype(np.float32) for _ in range(args.batch)]

    results = {}
    for pipeline in (False, True):
        svc = TranscriptionService(
            tr, max_batch=args.batch, max_wait_ms=1.0, pipeline=pipeline
        )
        # warm-up compile outside timing
        svc.submit(clips[0]).result(timeout=1200)
        [f.result(timeout=1200) for f in [svc.submit(c) for c in clips]]
        t0 = time.perf_counter()
        futs = []
        for _ in range(args.cohorts):
            futs.extend(svc.submit(c) for c in clips)
        for f in futs:
            f.result(timeout=1200)
        dt = time.perf_counter() - t0
        svc.close()
        audio_s = args.cohorts * args.batch * args.secs
        results[pipeline] = audio_s / dt
        print(
            f"pipeline={pipeline}: {dt:.2f} s for {audio_s:.0f} s audio "
            f"→ {audio_s / dt:,.0f}x realtime",
            file=sys.stderr,
        )
    print(f"pipeline speedup: {results[True] / results[False]:.3f}x")
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Operating-point sweep: model × batch × kernel toggles on the real TPU.

Finds the batch knee and kernel config per model (VERDICT r3 #2: the 600m
models were only ever benched at B=16 with the 110m-tuned config). Each
point prints one JSON line; relay noise is handled by min-of-N chained
iterations inside bench_encoder.

Usage:
  python scripts/bench_sweep.py --model tdt-600m --batches 16,32,64,96 \
      --fused-mode block4hp [--fused-subsample] [--secs 10] [--iters 3]
"""

from __future__ import annotations

import argparse
import json
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
    ap.add_argument("--model", default="tdt-600m")
    ap.add_argument("--batches", default="16,32,64")
    ap.add_argument("--secs", type=int, default=10)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--fused-mode", default="block4hp")
    ap.add_argument("--no-fused", action="store_true")
    ap.add_argument("--fused-subsample", action="store_true")
    args = ap.parse_args()

    from parakeet_tpu.benchmark import bench_encoder
    from parakeet_tpu.models.encoder import set_fused_attention, set_fused_subsample

    if not args.no_fused:
        set_fused_attention(args.fused_mode)
    if args.fused_subsample:
        set_fused_subsample(True)

    for b in [int(x) for x in args.batches.split(",")]:
        best = None
        for _ in range(args.passes):
            dt = bench_encoder(args.model, args.secs, b, args.dtype, args.iters)
            best = dt if best is None else min(best, dt)
        row = {
            "model": args.model, "batch": b, "seconds": args.secs,
            "dtype": args.dtype,
            "fused_mode": None if args.no_fused else args.fused_mode,
            "fused_subsample": args.fused_subsample,
            "ms_per_forward": round(best * 1e3, 2),
            "rtfx_per_chip": round(b * args.secs / best, 1),
        }
        print(json.dumps(row), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())

#!/usr/bin/env python
"""XLA flag sweep for the encoder headline (TUNING lever: profile-guided
XLA flag tuning — the last untried encoder lever after round 2).

Runs `bench.py --no-e2e --compiler-options k=v,...` as a subprocess per
candidate option set and records ms/forward.

Why compiler_options and not XLA_FLAGS: probed 2026-08-16 — XLA_FLAGS is
parsed by the LOCAL client XLA build, which does not know the xla_tpu_*
flags (F-level crash: "Unknown flag in XLA_FLAGS"), while
jit(compiler_options=...) is serialized with the computation and honored
by the remote compile helper (a bogus option name or an absurd value like
scoped_vmem=1 KiB makes the helper subprocess fail → options are really
applied, not silently dropped).

Usage: python scripts/bench_xla_flags.py [--batch 128] [--iters 5] [--runs 1]
Writes one JSON line per run to stdout and /tmp/xla_flag_sweep.jsonl.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CONFIGS: list[tuple[str, str]] = [
    # (name, comma-separated k=v compiler options passed to bench.py
    #  --compiler-options; "" = baseline). Probed 2026-08-16: XLA_FLAGS env
    #  is parsed by the LOCAL client build which doesn't know xla_tpu_*
    #  flags (hard crash), but jit(compiler_options=...) reaches the remote
    #  compile helper (invalid names/values fail its subprocess) — so the
    #  sweep rides bench.py --compiler-options.
    ("baseline", ""),
    ("vmem_32m", "xla_tpu_scoped_vmem_limit_kib=32768"),
    ("vmem_64m", "xla_tpu_scoped_vmem_limit_kib=65536"),
    ("vmem_96m", "xla_tpu_scoped_vmem_limit_kib=98304"),
    ("no_dot_sr", "xla_tpu_enable_dot_strength_reduction=false"),
    ("no_rwb", "xla_tpu_rwb_fusion=false"),
    ("no_lhs", "xla_tpu_enable_latency_hiding_scheduler=false"),
    ("mbl_opt", "xla_tpu_memory_bound_loop_optimizer_options=enabled:true"),
    # round 2: raising scoped vmem hurt (more vmem → less MSA prefetch
    # headroom?) — probe the other direction, and combine the two configs
    # that measured mildly positive in round 1
    ("vmem_8m", "xla_tpu_scoped_vmem_limit_kib=8192"),
    ("vmem_16m", "xla_tpu_scoped_vmem_limit_kib=16384"),
    ("combo_mbl_dotsr", "xla_tpu_memory_bound_loop_optimizer_options=enabled:true,"
                        "xla_tpu_enable_dot_strength_reduction=false"),
]


def run_one(name: str, flags: str, args) -> dict:
    cmd = [
        sys.executable, os.path.join(REPO, "bench.py"),
        "--no-e2e", "--batch", str(args.batch), "--iters", str(args.iters),
    ]
    if flags:
        cmd += ["--compiler-options", flags]
    t0 = time.time()
    try:
        proc = subprocess.run(cmd, cwd=REPO, capture_output=True, text=True,
                              timeout=900)
    except subprocess.TimeoutExpired:
        # a pathological flag can hang the remote compile — record it and
        # keep sweeping the remaining configs
        return {"config": name, "flags": flags, "ms_fwd": None, "rtfx": None,
                "rc": None, "timeout": True, "wall_s": round(time.time() - t0, 1)}
    wall = time.time() - t0
    ms = rtfx = None
    m = re.search(r"batch \d+: ([\d.]+) ms/forward, RTFx (\d+)", proc.stderr)
    if m:
        ms, rtfx = float(m.group(1)), int(m.group(2))
    rec = {
        "config": name, "flags": flags, "ms_fwd": ms, "rtfx": rtfx,
        "rc": proc.returncode, "wall_s": round(wall, 1),
    }
    if proc.returncode != 0:
        rec["stderr_tail"] = proc.stderr[-500:]
    return rec


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--runs", type=int, default=1)
    ap.add_argument("--only", default=None, help="comma-separated config names")
    args = ap.parse_args()

    names = set(args.only.split(",")) if args.only else None
    out_path = "/tmp/xla_flag_sweep.jsonl"
    with open(out_path, "a") as f:
        for name, flags in CONFIGS:
            if names and name not in names:
                continue
            for r in range(args.runs):
                rec = run_one(name, flags, args)
                rec["run"] = r
                line = json.dumps(rec)
                print(line, flush=True)
                f.write(line + "\n")
                f.flush()
    return 0


if __name__ == "__main__":
    sys.exit(main())

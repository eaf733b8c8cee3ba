#!/usr/bin/env python
"""XLA flag sweep for the encoder headline (TUNING lever: profile-guided
XLA flag tuning — the last untried encoder lever after round 2).

Runs `bench.py --no-e2e` as a subprocess under each candidate XLA_FLAGS /
LIBTPU_INIT_ARGS setting and records ms/forward. Subprocesses are required
because XLA flags are read once at backend init.

Caveat for this environment: TPU compilation goes through a remote-compile
HTTP relay (see TUNING.md), so the FIRST config to check is whether local
flags propagate at all — config "sanity_tiny_vmem" sets an absurdly small
scoped-VMEM limit; if its timing matches baseline, flags do not reach the
compiler and the whole lever is dead (document and stop).

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
    ("baseline", ""),
    # propagation probe: 4 MiB scoped VMEM should visibly change (or break)
    # compilation if flags reach the compiler at all
    ("sanity_tiny_vmem", "--xla_tpu_scoped_vmem_limit_kib=4096"),
    ("vmem_96m", "--xla_tpu_scoped_vmem_limit_kib=98304"),
    ("no_lhs", "--xla_latency_hiding_scheduler_rerun=0"),
    ("flm_off", "--xla_tpu_enable_flash_loop_mosaic=false"),
    ("aggressive_fusion", "--xla_tpu_enable_aggressive_loop_fusion_layout_opt=true"),
    ("no_rwb", "--xla_tpu_rwb_fusion=false"),
    ("mbl_opt", "--xla_tpu_memory_bound_loop_optimizer_options=enabled:true"),
]


def run_one(name: str, flags: str, args) -> dict:
    env = dict(os.environ)
    if flags:
        env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") + " " + flags).strip()
        env["LIBTPU_INIT_ARGS"] = (env.get("LIBTPU_INIT_ARGS", "") + " " + flags).strip()
    cmd = [
        sys.executable, os.path.join(REPO, "bench.py"),
        "--no-e2e", "--batch", str(args.batch), "--iters", str(args.iters),
    ]
    t0 = time.time()
    proc = subprocess.run(cmd, env=env, cwd=REPO, capture_output=True, text=True,
                          timeout=900)
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

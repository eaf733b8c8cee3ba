"""Summarize a jax.profiler trace: per-op device self-time, grouped.

Usage: python scripts/analyze_trace.py /tmp/prof_dir [--top 40] [--group]

Reads the trace-viewer JSON (plugins/profile/<ts>/*.trace.json.gz) that
jax.profiler.trace writes (works through the axon relay — TUNING.md r3)
and prints device-track op self-times, optionally grouped by a coarse
name bucket (fusion kinds, pallas kernels, convs, dots).
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import re
import sys


def _bucket(name: str) -> str:
    n = name.lower()
    for pat, b in [
        (r"pallas|custom-call", "pallas/custom"),
        (r"^fusion|loop_fusion|input_fusion|output_fusion", "fusion"),
        (r"conv", "conv"),
        (r"dot|gemm|matmul", "dot"),
        (r"dynamic-slice|slice|gather", "slice/gather"),
        (r"scatter", "scatter"),
        (r"copy|transpose|bitcast", "copy/transpose"),
        (r"reduce", "reduce"),
        (r"while|condition|body", "while"),
        (r"infeed|outfeed|send|recv", "io"),
    ]:
        if re.search(pat, n):
            return b
    return "other"


def _xplane_report(path: str, args) -> int:
    """Per-op device self-time from the xplane protobuf — the full data
    (this relay's trace.json.gz render DROPS the main module's device
    line; only the xplane has it — r4 finding)."""
    try:
        from tensorflow.tsl.profiler.protobuf import xplane_pb2
    except Exception as e:  # no TF in some envs — fall back to trace.json
        print(f"xplane proto unavailable ({e}); use the trace.json path",
              file=sys.stderr)
        return 2

    sp = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        sp.ParseFromString(f.read())
    print(f"# {path}")
    for plane in sp.planes:
        if "device" not in plane.name.lower() or not plane.lines:
            continue
        ev_names = dict(plane.event_metadata)
        for line in plane.lines:
            if line.name not in ("XLA Ops", "XLA Modules"):
                continue
            tot = collections.Counter()
            cnt = collections.Counter()
            for e in line.events:
                nm = ev_names[e.metadata_id].name
                if args.like and not re.search(args.like, nm):
                    continue
                tot[nm] += e.duration_ps / 1e9
                cnt[nm] += 1
            total = sum(tot.values())
            print(f"\n## {plane.name} / {line.name}: {total:.2f} ms, "
                  f"{len(line.events)} events")
            if args.group and line.name == "XLA Ops":
                groups = collections.Counter()
                for name, ms in tot.items():
                    groups[_bucket(name)] += ms
                for b, ms in groups.most_common():
                    print(f"{ms:10.2f} ms  {100 * ms / max(total, 1e-9):5.1f}%  {b}")
                print()
            for name, ms in tot.most_common(args.top):
                print(f"{ms:10.2f} ms  x{cnt[name]:<5d} {name[:110]}")
    return 0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--group", action="store_true")
    ap.add_argument("--like", default=None, help="only ops whose name matches")
    args = ap.parse_args()

    xplanes = sorted(
        glob.glob(os.path.join(args.trace_dir, "**", "*.xplane.pb"),
                  recursive=True)
    )
    if xplanes:
        return _xplane_report(xplanes[-1], args)
    files = sorted(
        glob.glob(os.path.join(args.trace_dir, "**", "*.trace.json.gz"),
                  recursive=True)
    )
    if not files:
        print(f"no *.xplane.pb or *.trace.json.gz under {args.trace_dir}",
              file=sys.stderr)
        return 2
    path = files[-1]
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", data if isinstance(data, list) else [])

    # device tracks: pick pids whose process name mentions TPU/device; fall
    # back to every complete event with a duration
    proc_names = {}
    for ev in events:
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            proc_names[ev["pid"]] = ev["args"].get("name", "")
    dev_pids = {p for p, n in proc_names.items()
                if re.search(r"tpu|device|/device:", n, re.I)}

    per_op = collections.Counter()
    per_op_n = collections.Counter()
    total = 0.0
    for ev in events:
        if ev.get("ph") != "X":
            continue
        if dev_pids and ev.get("pid") not in dev_pids:
            continue
        name = ev.get("name", "?")
        if args.like and not re.search(args.like, name):
            continue
        dur = float(ev.get("dur", 0.0)) / 1e3  # us → ms
        per_op[name] += dur
        per_op_n[name] += 1
        total += dur

    print(f"# {path}")
    print(f"# device pids: {sorted(dev_pids) or 'ALL (no device pid found)'}; "
          f"total device op time {total:.2f} ms")
    if args.group:
        groups = collections.Counter()
        for name, ms in per_op.items():
            groups[_bucket(name)] += ms
        for b, ms in groups.most_common():
            print(f"{ms:10.2f} ms  {100 * ms / max(total, 1e-9):5.1f}%  {b}")
        print()
    for name, ms in per_op.most_common(args.top):
        print(f"{ms:10.2f} ms  x{per_op_n[name]:<5d} {name[:110]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

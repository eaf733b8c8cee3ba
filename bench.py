#!/usr/bin/env python
"""Driver benchmark: prints ONE JSON line with the headline metric.

Metric: RTFx per chip for the tdt-ctc-110m ENCODER on batched synthetic 10 s
clips — the reference's own methodology (src/bench.cpp:165-196: features
randn(batch, sec*100, mel), warm-up compile excluded, real-time clock,
RTF = time/audio_sec), extended to a batch (TPU throughput lever).

Timing methodology for this environment: the TPU is reached through a
relay whose `block_until_ready` acks without executing, and every host
fetch pays ~25 ms round-trip. We therefore chain K data-dependent encoder
iterations UNROLLED inside one jitted function (NOT fori_loop — a
pallas_call inside a loop closure crashes this jax version's lowering
cache) and fetch a single scalar — one round-trip amortized over K real
forwards.

vs_baseline compares against the reference's best published number:
110m encoder, 10 s audio, Apple M3 GPU = 27 ms → RTFx 370 (README.md:464).

Run: python bench.py [--batch N] [--dtype bfloat16] [--secs 10] [--iters K]
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--dtype", default="bfloat16", choices=["float32", "bfloat16"])
    ap.add_argument("--secs", type=int, default=10)
    ap.add_argument("--iters", type=int, default=5, help="chained on-device iterations")
    ap.add_argument("--full", action="store_true", help="include CTC head")
    ap.add_argument("--no-fused", action="store_true",
                    help="disable the fused Pallas attention kernel")
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp


    from parakeet_tpu import config as C
    from parakeet_tpu import params as P
    from parakeet_tpu.models.ctc import ctc_log_probs
    from parakeet_tpu.models.encoder import fastconformer_encode
    from parakeet_tpu.params import Params, cast_params

    if not args.no_fused:
        from parakeet_tpu.models.encoder import set_fused_attention

        set_fused_attention(True)

    cfg = C.make_110m_config()
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    spec = P.tdt_ctc_spec(cfg) if args.full else P.encoder_spec(cfg.encoder, "encoder_")
    params = P.init_params(spec, seed=0)
    if args.dtype != "float32":
        params = cast_params(params, dtype)

    mel_frames = args.secs * 100  # 100 frames/s pre-subsampling (bench.cpp)
    k = args.iters

    @jax.jit
    def chained(p, feats):
        # k data-dependent forwards; a single scalar leaves the device.
        # Unrolled python loop (not fori_loop): a pallas_call inside a loop
        # closure trips this jax version's cached lowering.
        acc = jnp.zeros((), jnp.float32)
        for _ in range(k):
            x = feats + (acc * 1e-12).astype(feats.dtype)
            out = fastconformer_encode(Params(p).sub("encoder_"), cfg.encoder, x)
            if args.full:
                out = ctc_log_probs(Params(p).sub("ctc_decoder_"), out)
            acc = jnp.sum(out).astype(jnp.float32)
        return acc

    feats = jnp.asarray(
        np.random.RandomState(0).randn(args.batch, mel_frames, cfg.encoder.mel_bins),
        dtype=dtype,
    )
    t0 = time.perf_counter()
    float(chained(params, feats))  # compile + first run, excluded
    print(f"# compile+warmup: {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    t0 = time.perf_counter()
    float(chained(params, feats))
    dt = time.perf_counter() - t0
    rtfx = args.batch * args.secs * k / dt
    print(f"# batch {args.batch}: {dt / k * 1e3:.2f} ms/forward, RTFx {rtfx:.0f}", file=sys.stderr)

    baseline = 370.0  # reference 110m GPU, 10 s: RTF 0.003 → 370x (README.md:464)
    print(
        json.dumps(
            {
                "metric": f"RTFx per chip (tdt-ctc-110m encoder, batch={args.batch}, {args.secs}s clips, {args.dtype})",
                "value": round(rtfx, 1),
                "unit": "x realtime",
                "vs_baseline": round(rtfx / baseline, 2),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())

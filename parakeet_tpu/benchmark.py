"""`parakeet-bench` — encoder throughput benchmark harness.

Mirrors the reference harness (src/bench.cpp): per model × duration
{1,5,10,30,60}s, synthetic `randn(batch, sec*100, mel)` features, warm-up
compile excluded from timing, real-time clock, RTF + throughput columns,
optional markdown reporter (:76-117). TPU additions: batch sweep and
bfloat16 mode.
"""

from __future__ import annotations

import argparse
import sys
import time


MODELS = {
    "110m": ("make_110m_config", "encoder"),
    "tdt-600m": ("make_tdt_600m_config", "encoder"),
    "rnnt-600m": ("make_rnnt_600m_config", "encoder"),
    "sortformer": ("make_sortformer_117m_config", "nest_encoder"),
}


def bench_encoder(model: str, seconds: int, batch: int, dtype_name: str, iters: int,
                  weights_path: str | None = None):
    import numpy as np
    import jax
    import jax.numpy as jnp

    from parakeet_tpu import config as C
    from parakeet_tpu import params as P
    from parakeet_tpu.models.encoder import fastconformer_encode
    from parakeet_tpu.models.sortformer import sortformer_forward
    from parakeet_tpu.params import Params, cast_params

    if model not in MODELS:
        raise SystemExit(
            f"unknown model {model!r}; choose from {', '.join(MODELS)}"
        )
    factory_name, enc_attr = MODELS[model]
    cfg = getattr(C, factory_name)()
    enc_cfg = getattr(cfg, enc_attr)
    dtype = jnp.bfloat16 if dtype_name == "bfloat16" else jnp.float32

    if model == "sortformer":
        spec = P.sortformer_spec(cfg)
        params = P.load_params(spec, weights_path, seed=0) if weights_path else P.init_params(spec, seed=0)
        fwd = lambda p, x: sortformer_forward(p, x, cfg=cfg)  # full forward (bench.cpp note)
    else:
        spec = P.encoder_spec(enc_cfg, "encoder_")
        params = P.load_params(spec, weights_path, seed=0) if weights_path else P.init_params(spec, seed=0)

        def fwd(p, x):
            return fastconformer_encode(Params(p).sub("encoder_"), enc_cfg, x)

    if dtype_name == "bfloat16":
        params = cast_params(params, dtype)

    # Chain the iterations on device and fetch one scalar: on some remote
    # backends block_until_ready acks before execution (see bench.py).
    # UNROLLED python loop, NOT fori_loop: a pallas_call inside a loop
    # closure trips this jax version's cached lowering (TUNING.md), and the
    # fused Pallas attention may be enabled when this runs.
    @jax.jit
    def chained(p, feats):
        acc = jnp.zeros((), jnp.float32)
        for _ in range(iters):
            out = fwd(p, feats + (acc * 1e-12).astype(feats.dtype))
            acc = jnp.sum(out).astype(jnp.float32)
        return acc

    feats = jnp.asarray(
        np.random.RandomState(0).randn(batch, seconds * 100, enc_cfg.mel_bins), dtype=dtype
    )
    float(chained(params, feats))  # warm-up compile excluded
    t0 = time.perf_counter()
    float(chained(params, feats))
    return (time.perf_counter() - t0) / iters  # seconds per batch forward


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="parakeet-bench")
    ap.add_argument("--models", default="110m", help=f"comma list from {list(MODELS)}")
    ap.add_argument("--durations", default="1,5,10,30,60")
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--dtype", default="float32", choices=["float32", "bfloat16"])
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--markdown", action="store_true")
    ap.add_argument("--device", default=None, choices=[None, "cpu", "tpu"])
    ap.add_argument("--profile", metavar="DIR", default=None,
                    help="capture a jax.profiler trace of the bench into DIR")
    ap.add_argument("--weights", default=None,
                    help="bench with real weights (timing-identical to random init)")
    ap.add_argument("--fused-attention", default=None,
                    choices=["v1", "block", "block2", "block4", "block8", "mega",
                             "blockhp", "block2hp", "block4hp", "block8hp"],
                    help="fused Pallas attention kernel (TUNING.md)")
    ap.add_argument("--conv-layout", default=None, choices=["nhc", "nch", "pallas"])
    ap.add_argument("--fused-subsample", action="store_true",
                    help="fused conv1+dw1+conv2 subsampling kernel")
    ap.add_argument("--fused-ffn", action="store_true")
    args = ap.parse_args(argv)

    if args.device == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")

    from parakeet_tpu.models import encoder as _enc

    if args.fused_attention:
        _enc.set_fused_attention(args.fused_attention)
    if args.conv_layout:
        _enc.set_conv_layout(args.conv_layout)
    if args.fused_subsample:
        _enc.set_fused_subsample(True)
    if args.fused_ffn:
        _enc.set_fused_ffn(True)

    models = [m.strip() for m in args.models.split(",")]
    durations = [int(d) for d in args.durations.split(",")]

    profiler_cm = None
    if args.profile:
        import jax

        try:
            profiler_cm = jax.profiler.trace(args.profile)
            profiler_cm.__enter__()
            print(f"# profiling to {args.profile}", file=sys.stderr)
        except Exception as e:  # profiling may be unsupported on remote relays
            print(f"# profiler unavailable: {e}", file=sys.stderr)
            profiler_cm = None

    rows = []
    try:
        for model in models:
            for sec in durations:
                dt = bench_encoder(model, sec, args.batch, args.dtype, args.iters, args.weights)
                audio_s = args.batch * sec
                rows.append((model, sec, dt * 1e3, dt / audio_s, audio_s / dt))
                print(
                    f"{model:12s} {sec:3d}s batch={args.batch} {args.dtype}: "
                    f"{dt * 1e3:8.1f} ms  RTF {dt / audio_s:.5f}  {audio_s / dt:8.1f}x realtime",
                    file=sys.stderr,
                )
    finally:
        if profiler_cm is not None:
            profiler_cm.__exit__(None, None, None)

    if args.markdown:
        print("| Model | Audio | Time (ms) | RTF | Throughput |")
        print("|-------|-------|-----------|-----|------------|")
        for model, sec, ms, rtf, tput in rows:
            print(f"| {model} | {sec} s | {ms:.1f} | {rtf:.5f} | {tput:.0f}x |")
    return 0


if __name__ == "__main__":
    sys.exit(main())

#!/usr/bin/env python
"""TDT decode throughput A/B: per-step loop vs K-frame lookahead.

Runs the real 110m-sized prediction+joint decode on synthetic encoder
output with a controllable blank rate (random weights emit almost every
frame, which is nothing like speech — we bias the blank logit to hit a
target emission count, default ~35 tokens per 10 s clip, ~NeMo's rate).

Timing follows bench.py: chained data-dependent iterations inside one jit,
single scalar fetch (block_until_ready lies on this relay — see TUNING.md).

Run on TPU:  python scripts/bench_decode.py --batch 64 [--impls step,lookahead:8]
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
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--secs", type=int, default=10)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--target-emissions", type=int, default=35)
    ap.add_argument("--impls", default="step,lookahead:4,lookahead:8,lookahead:16")
    ap.add_argument("--profile", metavar="DIR", default=None,
                    help="capture a jax.profiler trace of the timed runs")
    ap.add_argument("--quantize", default=None,
                    choices=["bfloat16", "int8", "int4", "w8a8"],
                    help="decoder weight dtype: bfloat16 cast, or int8/int4 "
                         "weight-only quantization (activations bf16) — the "
                         "weight-streaming A/B for TUNING.md / VERDICT r3 #5")
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp

    from parakeet_tpu import config as C
    from parakeet_tpu import params as P
    from parakeet_tpu.decode import transducer as TR
    from parakeet_tpu.models.encoder import subsample_length

    cfg = C.make_110m_config()
    spec = P.prediction_spec(cfg.prediction, "prediction_")
    spec.update(P.tdt_joint_spec(cfg.joint, len(cfg.durations), "tdt_joint_"))
    params = P.init_params(spec, seed=0)

    b = args.batch
    t = subsample_length(args.secs * 100)  # 125 for 10 s
    enc_h = cfg.encoder.hidden_size
    blank = cfg.joint.vocab_size - 1
    rng = np.random.RandomState(1)
    enc = jnp.asarray(rng.randn(b, t, enc_h).astype(np.float32))

    kw = dict(
        pred_hidden=cfg.prediction.pred_hidden,
        num_lstm_layers=cfg.prediction.num_lstm_layers,
        durations=cfg.durations,
        blank_id=blank,
        max_symbols=10,
        is_tdt=True,
        joint_prefix="tdt_joint_",
    )

    # Bias the blank logit until the emission count is speech-like.
    key = "tdt_joint_.label_proj_.bias"
    bias = np.asarray(params[key])
    lo, hi = 0.0, 30.0
    for _ in range(12):
        mid = (lo + hi) / 2
        bias2 = bias.copy()
        bias2[blank] += mid
        params[key] = jnp.asarray(bias2)
        res = TR.transducer_greedy_decode(params, enc[:4], **kw, impl="step")
        n = float(np.mean([len(tk) for tk in res.tokens]))
        if n > args.target_emissions:
            lo = mid
        else:
            hi = mid
    print(f"# blank bias {mid:.2f}: mean emissions {n:.1f}/{t} frames", file=sys.stderr)

    if args.quantize:
        from parakeet_tpu.params import cast_params

        params = cast_params(params, jnp.bfloat16)
        enc = enc.astype(jnp.bfloat16)
        if args.quantize in ("int8", "int4", "w8a8"):
            from parakeet_tpu.quantize import quantize_params

            params = quantize_params(
                params, mode="int8" if args.quantize == "w8a8" else args.quantize)
            if args.quantize == "w8a8":
                from parakeet_tpu.ops.layers import set_int8_compute

                set_int8_compute(True)
        print(f"# decoder weights: {args.quantize}", file=sys.stderr)

    static = dict(kw)
    static.pop("pred_hidden")
    max_out = t * 10

    # each impl is a (p, enc) -> scalar single-decode call; the chained
    # wrapper below serializes k of them with a data dependency
    import functools

    def greedy_call(loop, p, e):
        outs = loop(
            p, e,
            jnp.full((b,), t, jnp.int32),
            jnp.full((b,), blank, jnp.int32),
            TR.prediction_zero_state(static["num_lstm_layers"], b, cfg.prediction.pred_hidden),
            None, None,
            max_out=max_out, boost_score=0.0, clamp_end=True, **static,
        )
        return jnp.sum(outs[4]).astype(jnp.float32) + jnp.sum(outs[3])

    def beam_call(beam_size, p, e):
        from parakeet_tpu.decode import beam_transducer as BT

        outs = BT._beam_loop(
            p, e, jnp.full((b,), t, jnp.int32),
            num_lstm_layers=static["num_lstm_layers"],
            durations=tuple(static["durations"]), blank_id=blank,
            max_symbols=10, max_out=max_out, is_tdt=True,
            joint_prefix="tdt_joint_", beam_size=beam_size,
            expand_k=min(beam_size + 1, 8),
        )
        return jnp.sum(outs[3]).astype(jnp.float32) + jnp.sum(outs[4])

    loops = {}
    for item in args.impls.split(","):
        if item == "step":
            loops["step"] = functools.partial(greedy_call, TR._decode_loop)
        elif item.startswith("unroll"):
            n = int(item.split(":")[1]) if ":" in item else 2
            loops[f"unroll:{n}"] = functools.partial(
                greedy_call, functools.partial(TR._decode_loop, unroll=n)
            )
        elif item.startswith("lookahead"):
            w = int(item.split(":")[1]) if ":" in item else 8
            loops[f"lookahead:{w}"] = functools.partial(
                greedy_call, functools.partial(TR._decode_loop_lookahead, window=w)
            )
        elif item.startswith("beam"):
            bs = int(item.split(":")[1]) if ":" in item else 4
            loops[f"beam:{bs}"] = functools.partial(beam_call, bs)

    results = {}
    for name, call in loops.items():
        k = args.iters

        @jax.jit
        def chained(p, e):
            acc = jnp.zeros((), jnp.float32)
            for _ in range(k):
                x = e + (acc * 1e-12)
                acc = call(p, x)
            return acc

        t0 = time.perf_counter()
        float(chained(params, enc))
        print(f"# {name}: compile+warmup {time.perf_counter()-t0:.1f}s", file=sys.stderr)
        prof = None
        if args.profile:
            prof = jax.profiler.trace(args.profile)
            prof.__enter__()
        t0 = time.perf_counter()
        v = float(chained(params, enc))
        dt = (time.perf_counter() - t0) / k
        if prof is not None:
            prof.__exit__(None, None, None)
        rtfx = b * args.secs / dt
        results[name] = dt
        print(f"{name}: {dt*1e3:.2f} ms/decode (B={b}, T={t})  RTFx {rtfx:.0f}  check={v:.1f}")

    if "step" in results:
        for name, dt in results.items():
            if name != "step":
                print(f"{name}: {results['step']/dt:.2f}x vs step")
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Microbenchmark: is int8×int8→int32 on this chip's MXU faster than bf16?

Decides whether a W8A8 (dynamic activation quant) FFN path is worth
building: on TPU generations where the MXU runs int8 at 2× the bf16 rate,
the encoder's FFN GEMMs (76% of bf16 peak, TUNING.md r3) could halve; on
generations where int8 == bf16 rate, W8A8 only adds quantize overhead.

MEASURED (r3, TPU v5 lite, B·T=24192, 512→2048→512 chained ×16):
    bf16                       38.8 ms   41.9 TFLOP/s
    int8 W8A8 (dyn act quant)  36.7 ms   44.2 TFLOP/s   (1.06×)
    int8 pure (no quant work)  34.1 ms   47.6 TFLOP/s   (1.14×)
Verdict: NEGATIVE — XLA's int8 dot lowering on this chip/version does not
reach a 2× MXU rate; the 6-14% is activation-bandwidth savings only, and
the encoder's real FFN GEMMs already run at 76% of bf16 peak inside the
fused layer (TUNING.md r3 trace). A W8A8 encoder path would add quantize
VPU work for ≤1.06×; not built. Weight-only int8 (quantize.py) remains the
useful quantization (checkpoint size + decode weight streaming).

Chains GEMMs through a lax.scan (data dependency defeats CSE/overlap
tricks), times with the honest relay methodology (host fetch of a packed
scalar; min of N passes). FFN shapes from the 110m bench point:
(B·T, D)×(D, 4D) with B=192, T=126, D=512.
"""

from __future__ import annotations

import argparse
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

DIMNUMS = (((1,), (0,)), ((), ()))


def q8_rows(x):
    """Per-row symmetric int8 quantization (dynamic activation quant)."""
    s = jnp.max(jnp.abs(x), axis=1, keepdims=True).astype(jnp.float32) / 127.0
    s = jnp.maximum(s, 1e-12)
    xi = jnp.round(x.astype(jnp.float32) / s).astype(jnp.int8)
    return xi, s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=192 * 126)
    ap.add_argument("--d", type=int, default=512)
    ap.add_argument("--f", type=int, default=2048)
    ap.add_argument("--iters", type=int, default=16, help="chained FFN pairs per pass")
    ap.add_argument("--passes", type=int, default=5)
    args = ap.parse_args()

    dev = jax.devices()[0]
    print(f"# device: {dev.platform} {getattr(dev, 'device_kind', '?')}")

    rows, d, f = args.rows, args.d, args.f
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(rows, d), jnp.bfloat16)
    w1 = jnp.asarray(rng.randn(d, f) * 0.04, jnp.bfloat16)
    w2 = jnp.asarray(rng.randn(f, d) * 0.02, jnp.bfloat16)
    # pre-quantized weights (per-out-channel scales, the quantize.py scheme)
    w1s = (jnp.max(jnp.abs(w1.astype(jnp.float32)), axis=0, keepdims=True) / 127.0)
    w2s = (jnp.max(jnp.abs(w2.astype(jnp.float32)), axis=0, keepdims=True) / 127.0)
    w1q = jnp.round(w1.astype(jnp.float32) / w1s).astype(jnp.int8)
    w2q = jnp.round(w2.astype(jnp.float32) / w2s).astype(jnp.int8)

    @jax.jit
    def run_bf16(x, w1, w2):
        def step(y, _):
            h = lax.dot_general(y, w1, DIMNUMS, preferred_element_type=jnp.float32)
            h = jnp.clip(h * 0.05, -4.0, 4.0).astype(jnp.bfloat16)  # cheap + bounded
            o = lax.dot_general(h, w2, DIMNUMS, preferred_element_type=jnp.float32)
            return jnp.clip(o * 0.05, -4.0, 4.0).astype(jnp.bfloat16), ()
        y, _ = lax.scan(step, x, None, length=args.iters)
        return y.astype(jnp.float32).sum()

    @jax.jit
    def run_int8(x, w1q, w1s, w2q, w2s):
        def step(y, _):
            yi, ys = q8_rows(y)
            h32 = lax.dot_general(yi, w1q, DIMNUMS, preferred_element_type=jnp.int32)
            h = jnp.clip(h32.astype(jnp.float32) * ys * w1s * 0.05, -4.0, 4.0).astype(jnp.bfloat16)
            hi, hs = q8_rows(h)
            o32 = lax.dot_general(hi, w2q, DIMNUMS, preferred_element_type=jnp.int32)
            return jnp.clip(o32.astype(jnp.float32) * hs * w2s * 0.05, -4.0, 4.0).astype(jnp.bfloat16), ()
        y, _ = lax.scan(step, x, None, length=args.iters)
        return y.astype(jnp.float32).sum()

    @jax.jit
    def run_int8_pure(x, w1q, w2q):
        """int8 dots with a cheap int8 re-cast between them — upper bound
        on the MXU int8 rate (no dynamic-quant VPU work)."""
        def step(y, _):
            h32 = lax.dot_general(y, w1q, DIMNUMS, preferred_element_type=jnp.int32)
            h8 = (h32 >> 12).astype(jnp.int8)
            o32 = lax.dot_general(h8, w2q, DIMNUMS, preferred_element_type=jnp.int32)
            return (o32 >> 12).astype(jnp.int8), ()
        y, _ = lax.scan(step, x, None, length=args.iters)
        return y.astype(jnp.int32).sum()

    xq = jnp.round(x.astype(jnp.float32) * 10).astype(jnp.int8)
    flops = 2.0 * rows * d * f * 2 * args.iters

    for name, fn, fargs in [
        ("bf16", run_bf16, (x, w1, w2)),
        ("int8 W8A8 (dyn act quant)", run_int8, (x, w1q, w1s, w2q, w2s)),
        ("int8 pure (no quant work)", run_int8_pure, (xq, w1q, w2q)),
    ]:
        t0 = time.perf_counter()
        float(fn(*fargs))  # compile + warmup, fetch synchronizes
        compile_s = time.perf_counter() - t0
        best = float("inf")
        for _ in range(args.passes):
            t0 = time.perf_counter()
            float(fn(*fargs))
            best = min(best, time.perf_counter() - t0)
        tflops = flops / best / 1e12
        print(f"{name}: {best * 1e3:.2f} ms  {tflops:.1f} TFLOP/s (compile {compile_s:.0f}s)")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""In-situ encoder ablation: time full-encoder variants with one submodule
class skipped across all layers, on the real TPU with the honest chained
methodology (bench.py). The difference full - ablated = that submodule's
true in-situ cost (overlap/fusion included), unlike isolated microbenches.

    python scripts/bench_ablate.py --batch 64 \
        [--skip none,attention,conv,ffn,subsampling,finalnorm]
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
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--fused", action="store_true", help="fused Pallas attention (v1)")
    ap.add_argument("--fused-mode", default=None, choices=["v1", "block", "mega"])
    ap.add_argument("--fused-ffn", action="store_true")
    ap.add_argument("--fused-block2", action="store_true")
    ap.add_argument("--bf16-out", action="store_true",
                    help="bf16 matmul outputs in ops.layers.linear (skip f32 materialization)")
    ap.add_argument("--skip", default="none,attention,conv,ffn,subsampling")
    ap.add_argument("--bf16-precision", default="default", choices=["default", "highest"],
                    help="matmul precision for bf16 operands (A/B the r1 HIGHEST choice)")
    ap.add_argument("--conv-layout", default=None, choices=["nhc", "nch", "pallas"],
                    help="conv-module activation layout A/B")
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp

    from parakeet_tpu import config as C
    from parakeet_tpu import params as P
    from parakeet_tpu.models import encoder as E
    from parakeet_tpu.params import Params, cast_params

    if args.fused_mode == "mega":
        # this harness re-implements the block inline (to support --skip),
        # which bypasses conformer_block's mega path — refuse rather than
        # silently benchmark the wrong thing
        ap.error("--fused-mode mega is only wired through conformer_block; "
                 "use bench.py --fused-mode mega instead")
    if args.fused or args.fused_mode:
        E.set_fused_attention(args.fused_mode or "v1")
    if args.bf16_precision == "highest":
        from parakeet_tpu.ops.layers import set_bf16_precision

        set_bf16_precision(jax.lax.Precision.HIGHEST)
    if args.conv_layout:
        E.set_conv_layout(args.conv_layout)
    if args.fused_ffn:
        E.set_fused_ffn(True)
    if args.fused_block2:
        E.set_fused_block2(True)
    if args.bf16_out:
        from parakeet_tpu.ops.layers import set_bf16_matmul_output

        set_bf16_matmul_output(True)

    cfg = C.make_110m_config().encoder
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    params = P.init_params(P.encoder_spec(cfg, "encoder_"), seed=0)
    if args.dtype == "bfloat16":
        params = cast_params(params, dtype)

    mel_frames = args.secs * 100
    feats = jnp.asarray(
        np.random.RandomState(0).randn(args.batch, mel_frames, cfg.mel_bins), dtype=dtype
    )
    t_sub = E.subsample_length(mel_frames)

    def encode(p, x, skip: str):
        root = Params(p).sub("encoder_")
        if skip == "subsampling":
            # bypass: fold mel → d_model with a cheap slice+pad view so the
            # layer stack sees the same (B, T', d) shape
            h = x[:, : t_sub * 8 : 8, :]
            h = jnp.pad(h, ((0, 0), (0, 0), (0, cfg.hidden_size - h.shape[-1]))).astype(x.dtype)
        else:
            h = E.conv_subsampling(root.sub("subsampling_"), x)
        pos = E.sinusoidal_position_embedding(h.shape[1], cfg.hidden_size)
        layers = root.sub("layers_")
        eps = cfg.layer_norm_eps
        for i in range(cfg.num_layers):
            lp = layers.sub(str(i))
            if skip != "ffn":
                h = E.feed_forward(lp.sub("ffn1_"), h, eps)
            if skip != "attention":
                attn_in = E.layer_norm(lp.sub("attn_").sub("norm_"), h, eps)
                h = h + E.rel_position_attention(lp.sub("attn_"), attn_in, pos, cfg.num_heads)
            if skip != "conv":
                h = E.conv_module(lp.sub("conv_"), h, cfg.conv_kernel_size, eps)
            if skip != "ffn":
                h = E.feed_forward(lp.sub("ffn2_"), h, eps)
            if skip != "finalnorm":
                h = E.layer_norm(lp.sub("final_norm_"), h, eps)
        return h

    results = {}
    for skip in args.skip.split(","):
        k = args.iters

        @jax.jit
        def chained(p, x, skip=skip):
            acc = jnp.zeros((), jnp.float32)
            for _ in range(k):
                out = encode(p, x + (acc * 1e-12).astype(x.dtype), skip)
                acc = jnp.sum(out).astype(jnp.float32)
            return acc

        t0 = time.perf_counter()
        float(chained(params, feats))
        print(f"# {skip}: compile {time.perf_counter()-t0:.0f}s", file=sys.stderr)
        t0 = time.perf_counter()
        float(chained(params, feats))
        dt = (time.perf_counter() - t0) / k
        results[skip] = dt
        print(f"skip={skip}: {dt*1e3:.2f} ms/fwd", flush=True)

    if "none" in results:
        full = results["none"]
        for skip, dt in results.items():
            if skip != "none":
                print(f"{skip} in-situ cost: {(full-dt)*1e3:.2f} ms ({(full-dt)/full*100:.0f}%)")
    return 0


if __name__ == "__main__":
    sys.exit(main())

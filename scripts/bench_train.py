"""Measured training throughput on the real TPU (the reference is
inference-only, so there is no baseline row to beat — this documents what
the training stack adds; TUNING.md carries the numbers).

Times the full jitted train step (forward + backward + adamw) on synthetic
batches with the honest relay methodology: donate-threaded state, one
scalar fetch per timed step, min over passes.

  python scripts/bench_train.py --model 110m --batch 16 --seconds 10
  python scripts/bench_train.py --bf16 --remat
"""

from __future__ import annotations

import argparse
import time

import numpy as np

try:
    import parakeet_tpu  # noqa: F401
except ModuleNotFoundError:  # source checkout: scripts/ is sys.path[0]
    import pathlib as _pl
    import sys as _sys

    _sys.path.insert(0, str(_pl.Path(__file__).resolve().parent.parent))



def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="110m", choices=["110m", "tiny"])
    ap.add_argument("--loss", default="hybrid",
                    choices=["ctc", "tdt", "rnnt", "hybrid"])
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--seconds", type=float, default=10.0,
                    help="audio seconds per clip (mel frames = 100/s)")
    ap.add_argument("--labels", type=int, default=48, help="labels per clip")
    ap.add_argument("--steps", type=int, default=8, help="timed steps")
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--accum-steps", type=int, default=1)
    ap.add_argument("--device", default=None, choices=[None, "cpu"])
    args = ap.parse_args()

    import jax

    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", 8)

    from parakeet_tpu import config as C
    from parakeet_tpu import params as P
    from parakeet_tpu.parallel.mesh import make_mesh
    from parakeet_tpu.train import make_sharded_trainer, synthetic_batch

    if args.model == "110m":
        cfg = C.make_110m_config()
    else:
        cfg = C.TDTCTCConfig(
            encoder=C.EncoderConfig(mel_bins=80, subsampling_channels=8,
                                    hidden_size=16, num_layers=2, num_heads=2,
                                    ffn_intermediate=32),
            prediction=C.PredictionConfig(vocab_size=33, pred_hidden=8,
                                          num_lstm_layers=1),
            joint=C.JointConfig(encoder_hidden=16, pred_hidden=8,
                                joint_hidden=8, vocab_size=33),
            ctc_vocab_size=33,
        )
    params = P.init_params(P.tdt_ctc_spec(cfg), seed=0)
    mel_frames = int(args.seconds * 100)

    mesh, state, step, place = make_sharded_trainer(
        cfg, params, make_mesh(len(jax.devices())), loss=args.loss, sigma=0.05,
        compute_dtype="bfloat16" if args.bf16 else "float32",
        remat=args.remat, accum_steps=args.accum_steps,
    )
    batch = place(synthetic_batch(cfg, args.batch, mel_frames, args.labels))

    p, o = state.params, state.opt_state
    t0 = time.perf_counter()
    p, o, loss = step(p, o, batch)
    loss = float(loss)  # fetch synchronizes through the relay
    compile_s = time.perf_counter() - t0
    print(f"# compile+first step: {compile_s:.1f}s  loss {loss:.3f}")

    best = float("inf")
    for _ in range(args.steps):
        t0 = time.perf_counter()
        p, o, loss = step(p, o, batch)
        loss = float(loss)
        best = min(best, time.perf_counter() - t0)
    audio_s = args.batch * args.seconds
    n_dev = len(jax.devices())  # global batch shards data-parallel over the mesh
    mode = ("bf16" if args.bf16 else "f32") + ("+remat" if args.remat else "")
    if args.accum_steps > 1:
        mode += f"+accum{args.accum_steps}"
    print(
        f"{args.model} {args.loss} train step ({mode}, B={args.batch}, "
        f"{args.seconds:.0f}s clips): {best * 1e3:.1f} ms/step = "
        f"{audio_s / best:.0f}x realtime aggregate "
        f"({audio_s / best / n_dev:.0f}x/chip over {n_dev} devices, "
        f"{1.0 / best:.2f} steps/s)"
    )


if __name__ == "__main__":
    main()

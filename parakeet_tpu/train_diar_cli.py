"""`parakeet-train-diar`: fine-tune Sortformer diarization from RTTM labels.

Companion to `parakeet-train` (ASR): data flows DiarizationDataset (JSONL
manifest of audio_filepath/rttm_filepath) → DiarizationDataLoader (duration
bucketing, 128-mel unnormalized frontend, arrival-ordered frame targets) →
the Sort Loss + PIL train step (train.make_sortformer_train_step, the
arXiv:2409.06656 recipe), with checkpoint/resume and a safetensors export
in the converter schema loadable by Sortformer(weights=…).

Example:
    parakeet-train-diar --manifest diar.jsonl --steps 500 \
        --batch-size 8 --checkpoint-dir ckpt/ --export sortformer.safetensors
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path


def build_argparser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(
        prog="parakeet-train-diar",
        description="Fine-tune Sortformer diarization on TPU.",
    )
    ap.add_argument("--manifest", required=True,
                    help="JSONL manifest (audio_filepath/rttm_filepath)")
    ap.add_argument("--model", default="sortformer-117m",
                    choices=["sortformer-117m", "tiny"],
                    help="'tiny' is a 2-layer smoke-test model")
    ap.add_argument("--init-weights", default=None,
                    help="safetensors to start from (converted NeMo Sortformer); "
                         "default: random init")
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--schedule", default="constant",
                    choices=["constant", "cosine", "noam"])
    ap.add_argument("--warmup-steps", type=int, default=0)
    ap.add_argument("--clip-norm", type=float, default=None,
                    help="global-norm gradient clipping (default: off)")
    ap.add_argument("--bf16", action="store_true",
                    help="run the model in bfloat16; Adam keeps f32 masters")
    ap.add_argument("--sort-weight", type=float, default=0.5,
                    help="Sort Loss weight; (1-w) goes to PIL")
    ap.add_argument("--data-parallel", type=int, default=None,
                    help="data-parallel ways (default: all devices); must divide "
                         "--batch-size")
    ap.add_argument("--remat", action="store_true",
                    help="rematerialize encoder blocks in backward")
    ap.add_argument("--accum-steps", type=int, default=1,
                    help="gradient accumulation chunks (must divide --batch-size)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--frame-multiple", type=int, default=160)
    ap.add_argument("--checkpoint-dir", default=None)
    ap.add_argument("--checkpoint-every", type=int, default=100)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--export", default=None,
                    help="write final weights as safetensors (converter schema)")
    ap.add_argument("--log-every", type=int, default=10)
    ap.add_argument("--device", default=None, choices=["cpu"])
    ap.add_argument("--cpu-devices", type=int, default=8)
    return ap


def _preset(name: str):
    from parakeet_tpu import config as C

    if name == "sortformer-117m":
        return C.make_sortformer_117m_config()
    return C.SortformerConfig(
        nest_encoder=C.StreamingEncoderConfig(
            mel_bins=128, subsampling_channels=8, hidden_size=24, num_layers=2,
            num_heads=2, ffn_intermediate=32, conv_kernel_size=5,
            att_context_left=6, att_context_right=0,
            subsampling_activation="relu", xscaling=True,
        ),
        encoder_hidden=24,
        transformer_hidden=12,
        transformer=C.TransformerConfig(
            hidden_size=12, num_layers=2, num_heads=2, ffn_intermediate=24,
            pre_ln=False, has_final_norm=False,
        ),
        max_speakers=4,
    )


def main(argv=None) -> int:
    args = build_argparser().parse_args(argv)

    import jax

    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", args.cpu_devices)

    import numpy as np

    from parakeet_tpu import params as P
    from parakeet_tpu.checkpoint import load_train_state, save_train_state
    from parakeet_tpu.config import AudioConfig
    from parakeet_tpu.data import DiarizationDataLoader, DiarizationDataset
    from parakeet_tpu.parallel.mesh import make_mesh
    from parakeet_tpu.train import make_sharded_trainer
    from parakeet_tpu.train_loop import place_train_state, run_training

    cfg = _preset(args.model)
    params = (
        P.load_params(P.sortformer_spec(cfg), args.init_weights, strict=False)
        if args.init_weights
        else P.init_params(P.sortformer_spec(cfg), seed=args.seed)
    )

    dataset = DiarizationDataset(args.manifest)
    loader = DiarizationDataLoader(
        dataset,
        batch_size=args.batch_size,
        # Sortformer frontend: 128 unnormalized mels (sortformer.cpp parity)
        audio_config=AudioConfig(n_mels=cfg.nest_encoder.mel_bins, normalize=False),
        max_speakers=cfg.max_speakers,
        frame_multiple=args.frame_multiple,
        seed=args.seed,
    )
    print(f"# {len(dataset)} clips, {len(loader)} batches/epoch", file=sys.stderr)

    dp = args.data_parallel or len(jax.devices())
    if args.batch_size % dp:
        raise SystemExit(
            f"--batch-size {args.batch_size} must be divisible by the data-parallel "
            f"ways ({dp}); pass --data-parallel explicitly to shrink the mesh"
        )
    if args.batch_size % max(args.accum_steps, 1):
        raise SystemExit(f"--accum-steps {args.accum_steps} must divide --batch-size")
    mesh, state, step_fn, place_batch = make_sharded_trainer(
        cfg, params, make_mesh(dp), learning_rate=args.lr, loss="sortformer",
        sort_weight=args.sort_weight, remat=args.remat, accum_steps=args.accum_steps,
        compute_dtype="bfloat16" if args.bf16 else "float32",
        schedule=args.schedule, warmup_steps=args.warmup_steps, decay_steps=args.steps,
        clip_norm=args.clip_norm,
    )

    if args.resume:
        if not args.checkpoint_dir:
            raise SystemExit("--resume needs --checkpoint-dir")
        ck = Path(args.checkpoint_dir)
        if (ck / "state.safetensors").exists():
            p2, o2, s2 = load_train_state(ck, state.opt_state)
            state = place_train_state(mesh, p2, o2, s2, state)
            print(f"# resumed at step {s2}", file=sys.stderr)

    params, opt_state, step = run_training(
        mesh, loader, state, step_fn, place_batch,
        steps=args.steps, log_every=args.log_every,
        checkpoint_dir=args.checkpoint_dir, checkpoint_every=args.checkpoint_every,
    )

    if args.checkpoint_dir:
        save_train_state(args.checkpoint_dir, params, opt_state, step)
        print(f"# checkpoint: {args.checkpoint_dir} (step {step})", file=sys.stderr)
    if args.export:
        from parakeet_tpu.io.safetensors import save_safetensors

        host = {k: np.asarray(v) for k, v in params.items()}
        save_safetensors(host, args.export, metadata={"format": "pt"})
        print(f"# exported: {args.export}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())

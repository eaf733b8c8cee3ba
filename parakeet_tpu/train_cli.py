"""`parakeet-train`: fine-tune a Parakeet stack from a JSONL manifest.

Training is a TPU-native capability beyond the inference-only reference:
data flows ManifestDataset → TrainDataLoader (duration bucketing, shape
quantization, background prefetch) → a mesh-sharded jitted train step
(train.py; CTC / RNNT / TDT lattice / hybrid TDT+CTC losses), with
periodic checkpoint/resume (checkpoint.py) and a final safetensors export
in the reference converter's schema, loadable by Transcriber.

Example:
    parakeet-train --manifest train.jsonl --vocab vocab.txt \
        --model 110m --loss hybrid --batch-size 16 --steps 1000 \
        --checkpoint-dir ckpt/ --export model.safetensors
"""

from __future__ import annotations

import argparse
import sys
from dataclasses import replace
from pathlib import Path


def build_argparser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(
        prog="parakeet-train", description="Fine-tune a Parakeet model on TPU."
    )
    ap.add_argument("--manifest", required=True, help="JSONL manifest (audio_filepath/text)")
    ap.add_argument("--vocab", required=True, help="vocab.txt (tokenizer pieces)")
    ap.add_argument("--model", default="110m",
                    choices=["110m", "tdt-600m", "rnnt-600m", "tiny"],
                    help="model preset (sets encoder/prediction/joint shapes); "
                         "'tiny' is a 2-layer smoke-test model")
    ap.add_argument("--loss", default=None,
                    choices=["ctc", "tdt", "rnnt", "hybrid"],
                    help="objective (default: hybrid for 110m, tdt for tdt-600m, "
                         "rnnt for rnnt-600m)")
    ap.add_argument("--init-weights", default=None,
                    help="safetensors to start from (e.g. a converted NeMo ckpt); "
                         "default: random init")
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--steps", type=int, default=100, help="optimizer steps to run")
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--schedule", default="constant",
                    choices=["constant", "cosine", "noam"],
                    help="learning-rate schedule (cosine decays over --steps; "
                         "noam = Transformer inverse-sqrt)")
    ap.add_argument("--warmup-steps", type=int, default=0)
    ap.add_argument("--clip-norm", type=float, default=None,
                    help="global-norm gradient clipping (default: off)")
    ap.add_argument("--bf16", action="store_true",
                    help="run the model in bfloat16 (MXU rate); Adam keeps "
                         "f32 master params")
    ap.add_argument("--sigma", type=float, default=0.05, help="TDT logit under-normalization")
    ap.add_argument("--model-parallel", type=int, default=1,
                    help="tensor-parallel ways (mesh = data × model)")
    ap.add_argument("--data-parallel", type=int, default=None,
                    help="data-parallel ways (default: devices / (model×seq parallel)); "
                         "must divide --batch-size")
    ap.add_argument("--seq-parallel", type=int, default=1,
                    help="sequence-parallel ways: encoder activations sharded over "
                         "time (mesh = data × seq × model)")
    ap.add_argument("--pipeline-parallel", type=int, default=1,
                    help="pipeline-parallel stages: conformer layers sharded over a "
                         "'pipe' mesh axis, GPipe microbatch schedule "
                         "(mesh = data × pipe; excludes --model/--seq-parallel)")
    ap.add_argument("--micro-batches", type=int, default=2,
                    help="GPipe microbatches per step with --pipeline-parallel "
                         "(must divide the per-data-shard batch)")
    ap.add_argument("--remat", action="store_true",
                    help="rematerialize each conformer block in backward "
                         "(less activation memory, same numerics)")
    ap.add_argument("--accum-steps", type=int, default=1,
                    help="gradient accumulation: split each batch into N equal "
                         "chunks scanned sequentially (same numerics, less "
                         "activation memory; N must divide --batch-size)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--frame-multiple", type=int, default=160,
                    help="pad mel frames per batch up to this multiple (bounds recompiles)")
    ap.add_argument("--label-multiple", type=int, default=16)
    ap.add_argument("--spec-augment", action="store_true",
                    help="SpecAugment on training batches (NeMo recipe: "
                         "2 freq masks <=27 bins, 10 time masks <=5%%)")
    ap.add_argument("--checkpoint-dir", default=None)
    ap.add_argument("--checkpoint-every", type=int, default=100)
    ap.add_argument("--resume", action="store_true",
                    help="resume from --checkpoint-dir if a checkpoint exists")
    ap.add_argument("--export", default=None,
                    help="write final weights as safetensors (reference schema)")
    ap.add_argument("--log-every", type=int, default=10)
    ap.add_argument("--device", default=None, choices=["cpu"],
                    help="force CPU (debug; default: the real accelerator)")
    ap.add_argument("--cpu-devices", type=int, default=8,
                    help="virtual device count with --device cpu")
    return ap


def _preset(name: str):
    from parakeet_tpu import config as C

    if name == "110m":
        return C.make_110m_config(), "tdt_ctc", "hybrid"
    if name == "tdt-600m":
        return C.make_tdt_600m_config(), "tdt", "tdt"
    if name == "rnnt-600m":
        return C.make_rnnt_600m_config(), "rnnt", "rnnt"
    # 'tiny': pipeline smoke tests / install checks (compiles in seconds)
    tiny = C.TDTCTCConfig(
        encoder=C.EncoderConfig(mel_bins=80, subsampling_channels=8, hidden_size=16,
                                num_layers=2, num_heads=2, ffn_intermediate=32),
        prediction=C.PredictionConfig(vocab_size=33, pred_hidden=8, num_lstm_layers=1),
        joint=C.JointConfig(encoder_hidden=16, pred_hidden=8, joint_hidden=8,
                            vocab_size=33),
        ctc_vocab_size=33,
    )
    return tiny, "tdt_ctc", "hybrid"


def _spec_for(cfg, kind: str):
    from parakeet_tpu import params as P

    return {"tdt_ctc": P.tdt_ctc_spec, "tdt": P.tdt_spec, "rnnt": P.rnnt_spec}[kind](cfg)


def _fit_vocab(cfg, kind: str, tokenizer):
    """Resize prediction/joint/ctc vocab dims to the tokenizer (+1 blank)."""
    want = tokenizer.vocab_size() + 1
    if cfg.joint.vocab_size == want:
        return cfg
    print(f"# preset vocab {cfg.joint.vocab_size} != tokenizer+blank {want}; resizing",
          file=sys.stderr)
    cfg = replace(cfg, prediction=replace(cfg.prediction, vocab_size=want),
                  joint=replace(cfg.joint, vocab_size=want))
    if kind == "tdt_ctc":
        cfg = replace(cfg, ctc_vocab_size=want)
    return cfg


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
    from parakeet_tpu.data import ManifestDataset, TrainDataLoader
    from parakeet_tpu.parallel.mesh import make_mesh
    from parakeet_tpu.text.tokenizer import Tokenizer
    from parakeet_tpu.train import make_sharded_trainer

    tokenizer = Tokenizer(args.vocab)
    cfg, kind, default_loss = _preset(args.model)
    loss = args.loss or default_loss
    if kind == "rnnt" and loss in ("tdt", "hybrid", "ctc"):
        raise SystemExit(f"--loss {loss} needs a TDT/CTC head; rnnt-600m trains with --loss rnnt")
    if kind == "tdt" and loss in ("hybrid", "ctc"):
        raise SystemExit(f"--loss {loss} needs a CTC head; tdt-600m trains with --loss tdt/rnnt")
    cfg = _fit_vocab(cfg, kind, tokenizer)
    spec = _spec_for(cfg, kind)

    if args.init_weights:
        params = P.load_params(spec, args.init_weights, strict=False)
    else:
        params = P.init_params(spec, seed=args.seed)

    dataset = ManifestDataset(args.manifest)
    loader = TrainDataLoader(
        dataset, tokenizer, batch_size=args.batch_size,
        audio_config=AudioConfig(n_mels=cfg.encoder.mel_bins),
        frame_multiple=args.frame_multiple, label_multiple=args.label_multiple,
        seed=args.seed, spec_augment=args.spec_augment,
    )
    print(f"# {len(dataset)} clips, {len(loader)} batches/epoch, loss={loss}",
          file=sys.stderr)

    mp, sp, pp = args.model_parallel, args.seq_parallel, args.pipeline_parallel
    if pp > 1 and (mp > 1 or sp > 1):
        raise SystemExit("--pipeline-parallel composes with data parallelism only")
    dp = args.data_parallel or max(1, len(jax.devices()) // (mp * sp * pp))
    if args.batch_size % dp:
        raise SystemExit(
            f"--batch-size {args.batch_size} must be divisible by the data-parallel "
            f"ways ({dp}); pass --data-parallel explicitly to shrink the mesh"
        )
    if pp > 1:
        from parakeet_tpu.parallel.pipeline import (
            make_pp_trainer,
            merge_layer_params,
            split_layer_params,
        )

        if (args.batch_size // dp) % args.micro_batches:
            raise SystemExit(
                f"per-shard batch {args.batch_size // dp} must be divisible by "
                f"--micro-batches {args.micro_batches}"
            )
        if args.remat or args.accum_steps > 1 or args.bf16:
            # never silently drop a flag the user is relying on: the GPipe
            # trainer already remats per stage and microbatches via
            # --micro-batches; bf16 isn't wired through the pipeline path
            raise SystemExit(
                "--remat/--accum-steps/--bf16 don't apply with "
                "--pipeline-parallel (the GPipe trainer rematerializes each "
                "stage and microbatches via --micro-batches)"
            )
        mesh = make_mesh(dp * pp, pipeline_parallel=pp)
        state, step_fn, place_batch, _export_pp = make_pp_trainer(
            cfg, params, mesh, n_micro=args.micro_batches,
            learning_rate=args.lr, loss=loss, sigma=args.sigma,
            schedule=args.schedule, warmup_steps=args.warmup_steps,
            decay_steps=args.steps, clip_norm=args.clip_norm,
        )
        as_schema_params = lambda p: merge_layer_params(p["layers"], p["rest"])  # noqa: E731

        def from_schema_params(p):
            layers, rest = split_layer_params(p, cfg.encoder.num_layers)
            return {"layers": layers, "rest": rest}
    else:
        if args.batch_size % max(args.accum_steps, 1):
            raise SystemExit(
                f"--accum-steps {args.accum_steps} must divide --batch-size"
            )
        mesh = make_mesh(dp * mp * sp, model_parallel=mp, seq_parallel=sp)
        mesh, state, step_fn, place_batch = make_sharded_trainer(
            cfg, params, mesh, learning_rate=args.lr, loss=loss, sigma=args.sigma,
            remat=args.remat, accum_steps=args.accum_steps,
            compute_dtype="bfloat16" if args.bf16 else "float32",
            schedule=args.schedule, warmup_steps=args.warmup_steps,
            decay_steps=args.steps, clip_norm=args.clip_norm,
        )
        as_schema_params = from_schema_params = lambda p: p  # noqa: E731
    if args.resume:
        if not args.checkpoint_dir:
            raise SystemExit("--resume needs --checkpoint-dir")
        ck = Path(args.checkpoint_dir)
        if (ck / "state.safetensors").exists() or (ck / "params.safetensors").exists():
            from parakeet_tpu.train_loop import place_train_state

            p2, o2, s2 = load_train_state(ck, state.opt_state)
            p2 = from_schema_params(p2)  # pp trainers hold {layers, rest}
            if mp > 1:
                # a sharded trainer holds vocab-PADDED params (mesh.py
                # pad_vocab_dim); re-pad schema-shaped checkpoints so the
                # placement below matches the compiled shapes (no-op when
                # the checkpoint was saved padded)
                from parakeet_tpu.parallel.mesh import pad_vocab_dim

                p2 = {
                    k: (pad_vocab_dim(k, v, mp) if pad_vocab_dim(k, v, mp) is not None else v)
                    for k, v in p2.items()
                }
            state = place_train_state(mesh, p2, o2, s2, state)
            print(f"# resumed at step {s2}", file=sys.stderr)

    from parakeet_tpu.train_loop import run_training

    params, opt_state, step = run_training(
        mesh, loader, state, step_fn, place_batch,
        steps=args.steps, log_every=args.log_every,
        checkpoint_dir=args.checkpoint_dir, checkpoint_every=args.checkpoint_every,
        as_schema=as_schema_params,
    )

    if args.checkpoint_dir:
        save_train_state(args.checkpoint_dir, as_schema_params(params), opt_state, step)
        print(f"# checkpoint: {args.checkpoint_dir} (step {step})", file=sys.stderr)
    if args.export:
        # export the final in-memory params (== the final checkpoint) with
        # vocab-pad rows sliced back off, so the artifact is always
        # reference-schema-shaped even after model-parallel training
        # (mesh.py pad_vocab_dim pads the joint/CTC/embedding vocab dims)
        from parakeet_tpu.io.safetensors import save_safetensors
        from parakeet_tpu.parallel.mesh import unpad_vocab_params

        host = {k: np.asarray(v) for k, v in as_schema_params(params).items()}
        vocab = getattr(getattr(cfg, "joint", None), "vocab_size", None)
        if vocab is not None:
            host = unpad_vocab_params(
                host, vocab, getattr(cfg, "ctc_vocab_size", None)
            )
        save_safetensors(host, args.export, metadata={"format": "pt"})
        print(f"# exported: {args.export}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())

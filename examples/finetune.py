#!/usr/bin/env python
"""End-to-end fine-tuning walkthrough: manifest → sharded training →
safetensors export → Transcriber inference → WER.

Runs out of the box with a synthetic toy corpus (no assets needed, forces
CPU + a virtual device mesh), and with a real NeMo-style manifest when you
have one:

    python examples/finetune.py                      # synthetic demo corpus
    python examples/finetune.py --manifest train.jsonl --vocab vocab.txt \
        --model 110m --steps 500 --bf16              # real fine-tune

The same flow is available as the `parakeet-train` console script; this
example spells out the library calls so you can embed them (custom loops,
eval-during-train, etc.). Manifest format: one JSON object per line with
"audio_filepath" and "text" (NeMo convention — reference
scripts/convert_nemo.py works on checkpoints, this works on audio).
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile
from pathlib import Path

# run straight from a source checkout (no pip install): examples/ is
# sys.path[0] when invoked as `python examples/finetune.py`
try:
    import parakeet_tpu  # noqa: F401
except ModuleNotFoundError:
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def make_toy_corpus(root: Path, n: int = 8):
    """Tiny deterministic corpus: random audio, two-word transcripts."""
    import numpy as np

    from parakeet_tpu.audio.io import write_wav

    rng = np.random.RandomState(0)
    lines = []
    words = ["a", "b", "ab", "ba"]
    for i in range(n):
        wav = root / f"clip{i}.wav"
        write_wav(wav, 0.1 * rng.randn(int(16000 * (0.4 + 0.05 * i))).astype(np.float32))
        lines.append(json.dumps({
            "audio_filepath": str(wav),
            "text": f"{words[i % 4]} {words[(i + 1) % 4]}",
        }))
    manifest = root / "train.jsonl"
    manifest.write_text("\n".join(lines) + "\n")
    vocab = root / "vocab.txt"
    vocab.write_text("\n".join(["<unk>", "▁a", "▁b", "a", "b"]) + "\n")
    return manifest, vocab


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--manifest", default=None, help="NeMo-style jsonl (default: synthetic toy corpus)")
    ap.add_argument("--vocab", default=None)
    ap.add_argument("--model", default="tiny", help="tiny|110m|tdt-600m|rnnt-600m")
    ap.add_argument("--weights", default=None, help="starting safetensors (default: random init)")
    ap.add_argument("--steps", type=int, default=6)
    ap.add_argument("--batch-size", type=int, default=4)
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--device", default="cpu", choices=["cpu", "tpu"],
                    help="cpu = 8 virtual devices (demo default); tpu = real chip(s)")
    args = ap.parse_args(argv)

    import jax

    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", 8)

    tmp = None
    if args.manifest is None:
        tmp = tempfile.TemporaryDirectory(prefix="parakeet_finetune_")
        args.manifest, args.vocab = make_toy_corpus(Path(tmp.name))
        print(f"# synthetic corpus at {tmp.name}")
    elif args.vocab is None:
        ap.error("--vocab is required with --manifest")

    # 1. The train CLI's main() is itself a library function — one call runs
    #    manifest loading, bucketing, the sharded train loop, and export.
    from parakeet_tpu.train_cli import main as train_main

    # data-parallel ways must divide the batch: largest divisor <= devices
    ndev = len(jax.devices())
    dp = max(d for d in range(1, min(args.batch_size, ndev) + 1)
             if args.batch_size % d == 0)

    export = Path(tmp.name if tmp else ".") / "tuned.safetensors"
    cli = [
        "--manifest", str(args.manifest), "--vocab", str(args.vocab),
        "--model", args.model, "--batch-size", str(args.batch_size),
        "--steps", str(args.steps),
        "--schedule", "cosine", "--warmup-steps", "2", "--clip-norm", "1.0",
        "--spec-augment", "--log-every", "1", "--export", str(export),
        "--frame-multiple", "32", "--label-multiple", "8",
        "--data-parallel", str(dp),
    ]
    if args.weights:
        cli += ["--init-weights", args.weights]
    if args.bf16:
        cli += ["--bf16"]
    if args.device == "cpu":
        cli += ["--device", "cpu"]
    rc = train_main(cli)
    if rc != 0:
        return rc

    # 2. Load the exported weights straight into the inference facade (the
    #    export is schema-verbatim safetensors — interchangeable with the
    #    C++ reference's converter output) and measure WER on the train set
    #    (toy sanity; point at a held-out manifest for real evals, or use
    #    scripts/eval_wer.py).
    from parakeet_tpu.metrics import corpus_wer
    from parakeet_tpu.text.tokenizer import Tokenizer
    from parakeet_tpu.train_cli import _fit_vocab, _preset
    from parakeet_tpu.transcribe import RNNTTranscriber, TDTTranscriber, Transcriber

    # the CLI resizes the preset's vocab dims to the tokenizer (+blank);
    # rebuild the identical config so the export loads strict
    cfg, kind, _ = _preset(args.model)
    cfg = _fit_vocab(cfg, kind, Tokenizer(str(args.vocab)))
    facade = {"tdt_ctc": Transcriber, "tdt": TDTTranscriber, "rnnt": RNNTTranscriber}[kind]
    tr = facade(str(export), str(args.vocab), cfg)

    pairs = []
    for line in Path(args.manifest).read_text().splitlines():
        e = json.loads(line)
        hyp = tr.transcribe(e["audio_filepath"]).text
        pairs.append((e["text"], hyp))
        print(f"  ref={e['text']!r}  hyp={hyp!r}")
    print(f"# corpus WER: {corpus_wer(pairs)}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

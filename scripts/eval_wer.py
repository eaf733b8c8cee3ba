#!/usr/bin/env python
"""WER evaluation over a manifest (LibriSpeech-style).

Manifest: one JSON object per line with {"audio_filepath": ..., "text": ...}
(NeMo manifest format), or a LibriSpeech trans.txt directory tree.

    python scripts/eval_wer.py manifest.jsonl --weights m.safetensors \
        --vocab vocab.txt [--decoder ctc|tdt] [--batch 16] [--dtype bfloat16]
    python scripts/eval_wer.py --librispeech path/to/test-clean ...
"""

import argparse
import json
import sys
import time
from pathlib import Path

try:
    import parakeet_tpu  # noqa: F401
except ModuleNotFoundError:  # source checkout: scripts/ is sys.path[0]
    import pathlib as _pl
    import sys as _sys

    _sys.path.insert(0, str(_pl.Path(__file__).resolve().parent.parent))



def load_manifest(path: str) -> list[tuple[str, str]]:
    items = []
    with open(path) as f:
        for line in f:
            if line.strip():
                obj = json.loads(line)
                items.append((obj["audio_filepath"], obj["text"]))
    return items


def load_librispeech(root: str) -> list[tuple[str, str]]:
    items = []
    for trans in Path(root).rglob("*.trans.txt"):
        for line in trans.read_text().splitlines():
            utt_id, _, text = line.partition(" ")
            flac = trans.parent / f"{utt_id}.flac"
            if flac.exists():
                items.append((str(flac), text))
    return items


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("manifest", nargs="?")
    ap.add_argument("--librispeech", default=None, help="LibriSpeech split dir")
    ap.add_argument("--weights", default=None)
    ap.add_argument("--vocab", default=None)
    ap.add_argument("--random-weights", action="store_true",
                    help="pipeline smoke test without a checkpoint")
    ap.add_argument("--model", default="tdt-ctc-110m", choices=["tdt-ctc-110m", "tdt-600m", "rnnt-600m"])
    ap.add_argument("--decoder", default="tdt", choices=["ctc", "tdt"])
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--dtype", default="float32", choices=["float32", "bfloat16"])
    ap.add_argument("--limit", type=int, default=0)
    ap.add_argument("--device", default="tpu", choices=["tpu", "cpu"],
                    help="cpu = hermetic run (the axon plugin ignores "
                         "JAX_PLATFORMS, so force via jax.config)")
    args = ap.parse_args()
    if args.device == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")

    from parakeet_tpu.metrics import corpus_wer
    from parakeet_tpu.transcribe import (
        Decoder,
        RNNTTranscriber,
        TDTTranscriber,
        TranscribeOptions,
        Transcriber,
    )

    if args.librispeech:
        items = load_librispeech(args.librispeech)
    elif args.manifest:
        items = load_manifest(args.manifest)
    else:
        ap.error("provide a manifest or --librispeech")
    if args.limit:
        items = items[: args.limit]
    if not items:
        print("no items found", file=sys.stderr)
        return 1

    if not args.random_weights and not args.weights:
        ap.error("--weights required (or pass --random-weights for a smoke test)")
    if args.weights and not args.vocab:
        ap.error("--vocab required with --weights (otherwise every hypothesis is empty)")
    cls = {"tdt-ctc-110m": Transcriber, "tdt-600m": TDTTranscriber, "rnnt-600m": RNNTTranscriber}[args.model]
    tr = cls(None if args.random_weights else args.weights, args.vocab, compute_dtype=args.dtype)
    decoder = Decoder.CTC if args.decoder == "ctc" else Decoder.TDT

    pairs = []
    total_audio = 0.0
    t0 = time.perf_counter()
    opts = TranscribeOptions(decoder)
    for i in range(0, len(items), args.batch):
        chunk = items[i : i + args.batch]
        results = tr.transcribe_batch([p for p, _ in chunk], opts)
        from parakeet_tpu.audio.io import get_audio_duration

        for (path, ref), res in zip(chunk, results):
            pairs.append((ref, res.text))
            total_audio += get_audio_duration(path)
        print(f"\r{len(pairs)}/{len(items)}", end="", file=sys.stderr)
    elapsed = time.perf_counter() - t0
    print(file=sys.stderr)

    result = corpus_wer(pairs)
    print(result)
    print(f"RTFx: {total_audio / elapsed:.1f} ({total_audio:.0f}s audio in {elapsed:.1f}s)")
    return 0


if __name__ == "__main__":
    sys.exit(main())

#!/usr/bin/env python
"""CLI wrapper for NeMo checkpoint conversion (parakeet_tpu.tools.convert).

    python scripts/convert_nemo.py model.nemo -o models/model.safetensors \
        --model 110m-tdt-ctc
    python scripts/convert_nemo.py model.nemo --extract-vocab models/vocab.txt
"""

import argparse
import pathlib
import sys

try:
    import parakeet_tpu  # noqa: F401
except ModuleNotFoundError:  # source checkout: scripts/ is sys.path[0]
    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main() -> int:
    from parakeet_tpu.tools.convert import PRESETS, convert, extract_vocab

    ap = argparse.ArgumentParser()
    ap.add_argument("nemo_path", help=".nemo archive or .ckpt file")
    ap.add_argument("-o", "--output", default="models/model.safetensors")
    ap.add_argument("--model", default="110m-tdt-ctc", choices=sorted(PRESETS))
    ap.add_argument("--extract-vocab", metavar="PATH", default=None)
    args = ap.parse_args()

    if args.extract_vocab:
        n = extract_vocab(args.nemo_path, args.extract_vocab)
        print(f"wrote {n} vocab pieces to {args.extract_vocab}")
        return 0
    convert(args.nemo_path, args.output, args.model)
    return 0


if __name__ == "__main__":
    sys.exit(main())

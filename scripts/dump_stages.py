#!/usr/bin/env python
"""Stage-by-stage pipeline dumps for cross-implementation parity checks.

The analog of the reference's compare_features.py / compare_encoder.py
workflow (SURVEY §4 tier 3): dump intermediate tensors to .npy so they can
be diffed against dumps from the C++ reference (or any other
implementation) running the same weights + audio.

    python scripts/dump_stages.py audio.wav --weights model.safetensors \
        --outdir dumps/            # writes features/subsampling/layer0/...
    python scripts/dump_stages.py --compare dumps_a/ dumps_b/
"""

import argparse
import sys
from pathlib import Path

import numpy as np


def dump(args) -> int:
    import jax.numpy as jnp

    from parakeet_tpu import config as C
    from parakeet_tpu import params as P
    from parakeet_tpu.audio.frontend import preprocess_audio
    from parakeet_tpu.audio.io import read_audio
    from parakeet_tpu.config import AudioConfig
    from parakeet_tpu.models import encoder as E
    from parakeet_tpu.models.ctc import ctc_log_probs
    from parakeet_tpu.params import Params

    cfg = C.make_110m_config()
    spec = P.tdt_ctc_spec(cfg)
    params = P.load_params(spec, args.weights) if args.weights else P.init_params(spec, seed=0)
    root = Params(params)

    out = Path(args.outdir)
    out.mkdir(parents=True, exist_ok=True)

    audio = read_audio(args.audio)
    feats = preprocess_audio(audio.samples, AudioConfig(n_mels=cfg.encoder.mel_bins))
    np.save(out / "features.npy", np.asarray(feats))

    x = E.conv_subsampling(root.sub("encoder_").sub("subsampling_"), feats)
    np.save(out / "subsampling_out.npy", np.asarray(x))

    pos = E.sinusoidal_position_embedding(x.shape[1], cfg.encoder.hidden_size)
    layers = root.sub("encoder_").sub("layers_")
    for i in range(cfg.encoder.num_layers):
        x = E.conformer_block(layers.sub(str(i)), x, pos, cfg.encoder)
        if i in (0, 1, cfg.encoder.num_layers - 1):
            np.save(out / f"layer{i}.npy", np.asarray(x))
    np.save(out / "encoder_out.npy", np.asarray(x))

    lp = ctc_log_probs(root.sub("ctc_decoder_"), x)
    np.save(out / "ctc_log_probs.npy", np.asarray(lp))
    print(f"wrote stage dumps to {out}/")
    return 0


def compare(dir_a: str, dir_b: str) -> int:
    a_dir, b_dir = Path(dir_a), Path(dir_b)
    status = 0
    for f in sorted(a_dir.glob("*.npy")):
        other = b_dir / f.name
        if not other.exists():
            print(f"{f.name}: MISSING in {b_dir}")
            status = 1
            continue
        a, b = np.load(f), np.load(other)
        if a.shape != b.shape:
            print(f"{f.name}: shape {a.shape} vs {b.shape}")
            status = 1
            continue
        d = np.abs(a.astype(np.float64) - b.astype(np.float64))
        print(f"{f.name}: max {d.max():.3e}  mean {d.mean():.3e}")
    return status


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("audio", nargs="?", help="audio file to run")
    ap.add_argument("--weights", default=None)
    ap.add_argument("--outdir", default="dumps")
    ap.add_argument("--compare", nargs=2, metavar=("DIR_A", "DIR_B"))
    args = ap.parse_args()
    if args.compare:
        return compare(*args.compare)
    if not args.audio:
        ap.error("audio file required unless --compare")
    return dump(args)


if __name__ == "__main__":
    sys.exit(main())

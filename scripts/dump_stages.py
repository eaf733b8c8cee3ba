#!/usr/bin/env python
"""Stage-by-stage pipeline dumps for cross-implementation parity checks.

The analog of the reference's compare_features.py / compare_encoder.py
workflow (SURVEY §4 tier 3). Three modes:

    # dump our stages to .npy
    python scripts/dump_stages.py audio.wav --weights model.safetensors \
        --outdir dumps/

    # diff two of our dump dirs
    python scripts/dump_stages.py --compare dumps_a/ dumps_b/

    # diff OUR pipeline directly against the C++ reference's debug dumps
    # (models/debug_*.bin as consumed by compare_features.py:62-78 and
    # compare_encoder.py:74-113: headerless little-endian float32, NCHW
    # layout for the conv stages) — no manual conversion needed:
    python scripts/dump_stages.py audio.wav --weights model.safetensors \
        --compare-ref /path/to/reference/models/

The reference stage registry (names are the reference's):

    debug_features_cpp.bin      (1, T, n_mels)      mel features
    debug_after_conv1.bin       (1, C, T/2, F/2)    conv1 + act   [NCHW]
    debug_after_block1.bin      (1, C, T/4, F/4)    dw1+pw+act    [NCHW]
    debug_after_block2.bin      (1, C, T/8, F/8)    dw2+pw+act    [NCHW]
    debug_subsampling_out.bin   (1, T/8, d_model)   after proj
    debug_after_layer0.bin      (1, T/8, d_model)   conformer layer 0

.npy reference artifacts (debug_features_py.npy, debug_sub_out_py.npy from
debug_encoder.py:204-205) are also accepted — the loader dispatches on the
file extension.
"""

import argparse
import sys
from pathlib import Path

import numpy as np

try:
    import parakeet_tpu  # noqa: F401
except ModuleNotFoundError:  # source checkout: scripts/ is sys.path[0]
    import pathlib as _pl
    import sys as _sys

    _sys.path.insert(0, str(_pl.Path(__file__).resolve().parent.parent))


# our stage name → (reference dump basenames tried in order)
REF_STAGE_FILES = {
    "features": ("debug_features_cpp.bin", "debug_features_py.npy"),
    "after_conv1": ("debug_after_conv1.bin",),
    "after_block1": ("debug_after_block1.bin",),
    "after_block2": ("debug_after_block2.bin",),
    "subsampling_out": ("debug_subsampling_out.bin", "debug_sub_out_py.npy"),
    "layer0": ("debug_after_layer0.bin",),
}

# stages whose reference dumps are NCHW while ours are NHWC
_NHWC_STAGES = {"after_conv1", "after_block1", "after_block2"}


def load_ref_dump(path: Path) -> np.ndarray:
    """Flat float32 array from a reference debug artifact (.bin or .npy)."""
    if path.suffix == ".npy":
        return np.load(path).astype(np.float32).ravel()
    return np.fromfile(path, dtype="<f4")


def compute_stages(audio_path: str, weights: str | None) -> dict[str, np.ndarray]:
    """Run our 110m pipeline and return every parity stage, with conv stages
    pre-transposed to the reference's NCHW dump layout."""
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
    params = P.load_params(spec, weights) if weights else P.init_params(spec, seed=0)
    root = Params(params)

    audio = read_audio(audio_path)
    feats = preprocess_audio(audio.samples, AudioConfig(n_mels=cfg.encoder.mel_bins))

    stages: dict[str, np.ndarray] = {"features": np.asarray(feats)}
    sub = E.conv_subsampling_stages(root.sub("encoder_").sub("subsampling_"), feats)
    for name in ("after_conv1", "after_block1", "after_block2"):
        # ours: (B, T, F, C) NHWC → reference dump order (B, C, T, F) NCHW
        stages[name] = np.transpose(np.asarray(sub[name]), (0, 3, 1, 2))
    x = sub["subsampling_out"]
    stages["subsampling_out"] = np.asarray(x)

    pos = E.sinusoidal_position_embedding(x.shape[1], cfg.encoder.hidden_size)
    layers = root.sub("encoder_").sub("layers_")
    for i in range(cfg.encoder.num_layers):
        x = E.conformer_block(layers.sub(str(i)), x, pos, cfg.encoder)
        if i in (0, 1, cfg.encoder.num_layers - 1):
            stages[f"layer{i}"] = np.asarray(x)
    stages["encoder_out"] = np.asarray(x)
    stages["ctc_log_probs"] = np.asarray(ctc_log_probs(root.sub("ctc_decoder_"), x))
    return stages


def report_diff(name: str, ours: np.ndarray, ref_flat: np.ndarray, shape_hint="") -> bool:
    """Print the reference scripts' max/mean abs diff line; True if compared."""
    ours_flat = ours.astype(np.float64).ravel()
    if ours_flat.size != ref_flat.size:
        print(f"{name}: SIZE MISMATCH ours={ours.shape} ({ours_flat.size}) "
              f"ref={ref_flat.size} floats{shape_hint}")
        return False
    d = np.abs(ours_flat - ref_flat.astype(np.float64))
    print(f"{name}: max abs diff {d.max():.6e}  mean abs diff {d.mean():.6e}  "
          f"(ours shape {ours.shape})")
    return True


def compare_ref(args) -> int:
    ref_dir = Path(args.compare_ref)
    if args.weights is None:
        # random-init params diffed against real reference dumps look
        # exactly like a catastrophic parity regression — be loud
        print(
            "WARNING: --compare-ref without --weights runs RANDOM-INIT "
            "params; every stage past 'features' will show huge diffs.",
            file=sys.stderr,
        )
    stages = compute_stages(args.audio, args.weights)
    if args.outdir:
        out = Path(args.outdir)
        out.mkdir(parents=True, exist_ok=True)
        for name, arr in stages.items():
            np.save(out / f"{name}.npy", arr)

    status, compared = 0, 0
    for name, candidates in REF_STAGE_FILES.items():
        path = next((ref_dir / c for c in candidates if (ref_dir / c).exists()), None)
        if path is None:
            print(f"{name}: no reference dump in {ref_dir} (tried {', '.join(candidates)})")
            continue
        hint = " [ref layout NCHW]" if name in _NHWC_STAGES else ""
        if not report_diff(name, stages[name], load_ref_dump(path), hint):
            status = 1
        compared += 1
    if compared == 0:
        print(f"no debug_*.bin/.npy reference dumps found in {ref_dir}")
        return 1
    return status


def dump(args) -> int:
    out = Path(args.outdir)
    out.mkdir(parents=True, exist_ok=True)
    for name, arr in compute_stages(args.audio, args.weights).items():
        np.save(out / f"{name}.npy", arr)
    print(f"wrote stage dumps to {out}/")
    return 0


def compare(dir_a: str, dir_b: str) -> int:
    a_dir, b_dir = Path(dir_a), Path(dir_b)
    status = 0
    names = sorted(
        {f.name for f in a_dir.glob("*.npy")} | {f.name for f in b_dir.glob("*.npy")}
    )
    for name in names:
        f, other = a_dir / name, b_dir / name
        if not f.exists():
            print(f"{name}: MISSING in {a_dir}")
            status = 1
            continue
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
    ap.add_argument("--outdir", default=None)
    ap.add_argument("--compare", nargs=2, metavar=("DIR_A", "DIR_B"))
    ap.add_argument(
        "--compare-ref", metavar="REF_DIR",
        help="directory holding the C++ reference's models/debug_*.bin dumps",
    )
    ap.add_argument("--device", default="tpu", choices=["tpu", "cpu"],
                    help="cpu = hermetic run (scripts/acceptance.py); the "
                         "axon plugin ignores JAX_PLATFORMS, so force via config")
    args = ap.parse_args()
    if args.device == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")
    if args.compare:
        return compare(*args.compare)
    if not args.audio:
        ap.error("audio file required unless --compare")
    if args.compare_ref:
        return compare_ref(args)
    if args.outdir is None:
        args.outdir = "dumps"
    return dump(args)


if __name__ == "__main__":
    sys.exit(main())

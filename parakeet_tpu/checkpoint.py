"""Training checkpoint/resume.

The reference's only 'checkpointing' is safetensors weight loading
(SURVEY §5.4). For the training capability this framework adds, full
train-state checkpointing (params + optimizer state + step) goes through
safetensors as well: the opt-state pytree is flattened to path-keyed
arrays, so checkpoints stay dependency-free, inspectable, and loadable on
any host. Inference weights can be exported from a train checkpoint with
`export_weights` (producing a reference-schema file).
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np
import jax

from parakeet_tpu.io.safetensors import load_safetensors, save_safetensors


def _flatten_opt_state(opt_state) -> tuple[dict[str, np.ndarray], str]:
    """Pytree → {path: array} + a treedef JSON note for sanity checking."""
    leaves, treedef = jax.tree_util.tree_flatten(opt_state)
    flat = {f"opt.{i}": np.asarray(leaf) for i, leaf in enumerate(leaves)}
    return flat, str(treedef)


def save_train_state(path: str | Path, params: dict, opt_state, step: int) -> None:
    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    save_safetensors({k: np.asarray(v) for k, v in params.items()}, path / "params.safetensors")
    flat, treedef = _flatten_opt_state(opt_state)
    save_safetensors(flat, path / "opt_state.safetensors")
    (path / "meta.json").write_text(json.dumps({"step": int(step), "treedef": treedef}))


def load_train_state(path: str | Path, opt_state_template) -> tuple[dict, object, int]:
    """Restore (params, opt_state, step). `opt_state_template` supplies the
    pytree structure (e.g. optimizer.init(params))."""
    path = Path(path)
    params = {k: v.copy() for k, v in load_safetensors(path / "params.safetensors").items()}
    flat = load_safetensors(path / "opt_state.safetensors")
    leaves_t, treedef = jax.tree_util.tree_flatten(opt_state_template)
    if len(flat) != len(leaves_t):
        raise ValueError(
            f"opt state leaf count mismatch: checkpoint {len(flat)} vs template {len(leaves_t)}"
        )
    leaves = [np.asarray(flat[f"opt.{i}"]) for i in range(len(leaves_t))]
    opt_state = jax.tree_util.tree_unflatten(treedef, leaves)
    meta = json.loads((path / "meta.json").read_text())
    return params, opt_state, int(meta["step"])


def export_weights(train_ckpt: str | Path, weights_path: str | Path) -> None:
    """Train checkpoint → plain inference safetensors (reference schema)."""
    params = load_safetensors(Path(train_ckpt) / "params.safetensors")
    save_safetensors(dict(params), weights_path, metadata={"format": "pt"})


__all__ = ["save_train_state", "load_train_state", "export_weights"]

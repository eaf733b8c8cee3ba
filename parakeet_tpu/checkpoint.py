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
    """Atomic-ish overwrite: write the three files into a temp sibling dir,
    then swap the filenames in one pass — a crash mid-save over an
    existing checkpoint can no longer leave new params paired with stale
    opt state/step (the old files stay intact until every new file is
    fully written)."""
    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    tmp = path / ".tmp_save"
    tmp.mkdir(exist_ok=True)
    save_safetensors({k: np.asarray(v) for k, v in params.items()}, tmp / "params.safetensors")
    flat, treedef = _flatten_opt_state(opt_state)
    save_safetensors(flat, tmp / "opt_state.safetensors")
    (tmp / "meta.json").write_text(json.dumps({"step": int(step), "treedef": treedef}))
    for name in ("params.safetensors", "opt_state.safetensors", "meta.json"):
        (tmp / name).replace(path / name)  # atomic per file, all data on disk
    tmp.rmdir()


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
    meta = json.loads((path / "meta.json").read_text())
    saved_treedef = meta.get("treedef")
    if saved_treedef is not None and saved_treedef != str(treedef):
        raise ValueError(
            "opt state structure mismatch: the checkpoint was saved "
            "with a different optimizer configuration; "
            f"saved={saved_treedef!r} template={str(treedef)!r}"
        )
    leaves = []
    for i, tmpl in enumerate(leaves_t):
        leaf = np.asarray(flat[f"opt.{i}"])
        tmpl_shape = tuple(np.shape(tmpl))
        if tuple(leaf.shape) != tmpl_shape:
            if tmpl_shape == () and leaf.size == 1:
                # safetensors round-trips 0-d scalars (optimizer step count)
                # as shape (1,); restore the exact template shape so resumed
                # step functions don't silently recompile on a shape change
                leaf = leaf.reshape(())
            else:
                raise ValueError(
                    f"opt state leaf {i} shape mismatch: checkpoint "
                    f"{tuple(leaf.shape)} vs template {tmpl_shape} — wrong "
                    "model or optimizer for this checkpoint"
                )
        leaves.append(leaf)
    opt_state = jax.tree_util.tree_unflatten(treedef, leaves)
    return params, opt_state, int(meta["step"])


def export_weights(train_ckpt: str | Path, weights_path: str | Path) -> None:
    """Train checkpoint → plain inference safetensors (reference schema)."""
    params = load_safetensors(Path(train_ckpt) / "params.safetensors")
    save_safetensors(dict(params), weights_path, metadata={"format": "pt"})


__all__ = ["save_train_state", "load_train_state", "export_weights"]

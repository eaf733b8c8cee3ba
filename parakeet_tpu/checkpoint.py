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
import os
from pathlib import Path

import numpy as np
import jax

from parakeet_tpu.io.safetensors import load_safetensors, save_safetensors

#: key prefixes reserved inside the single-file train state (the reference
#: schema never uses '##', so param keys cannot collide)
_OPT_PREFIX = "##opt."
_META_STEP = "##meta.step"
_META_TREEDEF = "##meta.treedef"


def _flatten_opt_state(opt_state) -> tuple[dict[str, np.ndarray], str]:
    """Pytree → {path: array} + a treedef JSON note for sanity checking."""
    leaves, treedef = jax.tree_util.tree_flatten(opt_state)
    flat = {f"opt.{i}": np.asarray(leaf) for i, leaf in enumerate(leaves)}
    return flat, str(treedef)


def save_train_state(path: str | Path, params: dict, opt_state, step: int) -> None:
    """Atomic overwrite: params + opt state + step are packed into ONE
    `state.safetensors` written to a temp sibling, fsynced, then committed
    with a single `os.replace` — a crash at any point leaves either the old
    complete checkpoint or the new complete checkpoint, never new params
    paired with stale opt state/step. (Rounds ≤2 wrote three files with
    three sequential renames, which could mix generations mid-crash.)"""
    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    state: dict[str, np.ndarray] = {k: np.asarray(v) for k, v in params.items()}
    flat, treedef = _flatten_opt_state(opt_state)
    for k, v in flat.items():
        state["##" + k] = v
    state[_META_STEP] = np.asarray([int(step)], np.int64)
    state[_META_TREEDEF] = np.frombuffer(treedef.encode("utf-8"), np.uint8)
    tmp = path / ".state.safetensors.tmp"
    save_safetensors(state, tmp)
    with open(tmp, "rb") as f:  # data durable before the rename commits it
        os.fsync(f.fileno())
    os.replace(tmp, path / "state.safetensors")
    for legacy in ("params.safetensors", "opt_state.safetensors", "meta.json"):
        try:  # drop stale pre-r3 files so the two layouts can't diverge
            (path / legacy).unlink()
        except OSError:
            pass


def _load_raw_state(path: Path) -> tuple[dict, dict[str, np.ndarray], dict]:
    """Read either layout → (params, flat opt arrays keyed 'opt.N', meta)."""
    single = path / "state.safetensors"
    if single.exists():
        blob = load_safetensors(single)
        params = {k: v.copy() for k, v in blob.items() if not k.startswith("##")}
        flat = {k[2:]: v for k, v in blob.items() if k.startswith(_OPT_PREFIX)}
        meta = {
            "step": int(blob[_META_STEP][0]),
            "treedef": bytes(blob[_META_TREEDEF]).decode("utf-8"),
        }
        return params, flat, meta
    # legacy three-file layout (rounds ≤2)
    params = {k: v.copy() for k, v in load_safetensors(path / "params.safetensors").items()}
    flat = load_safetensors(path / "opt_state.safetensors")
    meta = json.loads((path / "meta.json").read_text())
    return params, flat, meta


def load_train_state(path: str | Path, opt_state_template) -> tuple[dict, object, int]:
    """Restore (params, opt_state, step). `opt_state_template` supplies the
    pytree structure (e.g. optimizer.init(params))."""
    path = Path(path)
    params, flat, meta = _load_raw_state(path)
    leaves_t, treedef = jax.tree_util.tree_flatten(opt_state_template)
    if len(flat) != len(leaves_t):
        raise ValueError(
            f"opt state leaf count mismatch: checkpoint {len(flat)} vs template {len(leaves_t)}"
        )
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
    """Train checkpoint → plain inference safetensors (reference schema).

    Needs only the params: a legacy (≤r2) dir with just params.safetensors
    exports fine even when opt_state/meta are missing or corrupt."""
    path = Path(train_ckpt)
    single = path / "state.safetensors"
    if single.exists():
        blob = load_safetensors(single)
        params = {k: v for k, v in blob.items() if not k.startswith("##")}
    else:
        params = load_safetensors(path / "params.safetensors")
    save_safetensors(dict(params), weights_path, metadata={"format": "pt"})


__all__ = ["save_train_state", "load_train_state", "export_weights"]

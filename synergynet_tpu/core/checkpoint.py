"""Checkpointing: pytree save/restore + PyTorch checkpoint import.

The reference checkpoints a torch ``state_dict`` with a ``module.`` prefix
from DataParallel that every consumer must strip (reference
main_train.py:96-98,225-236; model_building.py:255-263). Here checkpoints are
flat ``path -> array`` maps in a single ``.npz`` (atomic rename on write), so
any pytree (TrainState, raw params, detector weights) round-trips without
framework-specific pickling; the torch importer maps reference checkpoints
into our parameter trees for parity validation.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax
import numpy as np

_SEP = "/"


def _flatten(tree: Any) -> Dict[str, np.ndarray]:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = _SEP.join(str(getattr(p, "key", getattr(p, "idx", p)))
                        for p in path)
        flat[key] = np.asarray(leaf)
    return flat


def save_checkpoint(path: str, tree: Any, *, step: Optional[int] = None,
                    metadata: Optional[dict] = None) -> None:
    """Atomically write a pytree checkpoint to ``path`` (.npz)."""
    flat = _flatten(tree)
    meta = dict(metadata or {})
    if step is not None:
        meta["step"] = int(step)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    tmp = path + f".tmp{os.getpid()}.npz"
    np.savez(tmp, __metadata__=json.dumps(meta), **flat)
    os.replace(tmp, path)


def restore_checkpoint(path: str, template: Any) -> Any:
    """Restore into the structure of ``template`` (shapes must match)."""
    with np.load(path, allow_pickle=False) as z:
        flat = {k: z[k] for k in z.files if k != "__metadata__"}
    leaves_t, treedef = jax.tree_util.tree_flatten_with_path(template)
    out = []
    for path_keys, leaf in leaves_t:
        key = _SEP.join(str(getattr(p, "key", getattr(p, "idx", p)))
                        for p in path_keys)
        if key not in flat:
            raise KeyError(f"checkpoint missing leaf '{key}'")
        arr = flat[key]
        want = np.shape(leaf)
        if tuple(arr.shape) != tuple(want):
            raise ValueError(
                f"shape mismatch for '{key}': ckpt {arr.shape} vs {want}")
        out.append(arr.astype(np.asarray(leaf).dtype))
    return jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(template), out)


def checkpoint_metadata(path: str) -> dict:
    with np.load(path, allow_pickle=False) as z:
        if "__metadata__" in z.files:
            return json.loads(str(z["__metadata__"]))
    return {}


# ---------------------------------------------------------------------------
# PyTorch checkpoint import
# ---------------------------------------------------------------------------

def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a torch checkpoint into numpy arrays, stripping any DataParallel
    ``module.`` prefix (the reference's multi-GPU residue)."""
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict) and "state_dict" in ckpt:
        ckpt = ckpt["state_dict"]
    out = {}
    for k, v in ckpt.items():
        if hasattr(v, "numpy"):
            out[k.removeprefix("module.")] = v.detach().cpu().numpy()
    return out


def import_conv(w: np.ndarray) -> np.ndarray:
    """torch conv OIHW -> flax HWIO."""
    return np.transpose(w, (2, 3, 1, 0))


def import_depthwise_conv(w: np.ndarray) -> np.ndarray:
    """torch depthwise (C,1,H,W) -> flax HWIO with feature_group_count=C,
    i.e. (H,W,1,C)."""
    return np.transpose(w, (2, 3, 1, 0))


def import_linear(w: np.ndarray) -> np.ndarray:
    """torch (out,in) -> flax (in,out)."""
    return np.transpose(w, (1, 0))


def import_bn(sd: Dict[str, np.ndarray], prefix: str) -> Dict[str, np.ndarray]:
    """torch BatchNorm params/buffers -> flax param + batch_stats leaves."""
    return {
        "scale": sd[f"{prefix}.weight"],
        "bias": sd[f"{prefix}.bias"],
        "mean": sd[f"{prefix}.running_mean"],
        "var": sd[f"{prefix}.running_var"],
    }

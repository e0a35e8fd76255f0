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


def _path_key(path) -> str:
    """Canonical flat key for a tree_flatten_with_path entry.

    Dict nodes flatten to ``DictKey`` (str() == the key) but attr-style
    nodes (flax ``struct.PyTreeNode`` like TrainState) flatten to
    ``GetAttrKey`` whose str() carries a leading dot (``.params``). Strip
    it so the SAME leaf gets the SAME key whether it was saved from a
    TrainState or a plain variables dict — a Trainer snapshot must restore
    into ``cli.evaluate``'s ``{params, batch_stats}`` template (caught by
    tests/test_dress_rehearsal.py)."""
    return _SEP.join(
        str(getattr(p, "key", getattr(p, "idx", p))).lstrip(".")
        for p in path)


def _flatten(tree: Any) -> Dict[str, np.ndarray]:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        flat[_path_key(path)] = np.asarray(leaf)
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
        # lstrip: checkpoints written before _path_key normalized attr-style
        # keys carry a leading dot on struct fields (``.params/...``).
        flat = {_SEP.join(c.lstrip(".") for c in k.split(_SEP)): z[k]
                for k in z.files if k != "__metadata__"}
    leaves_t, treedef = jax.tree_util.tree_flatten_with_path(template)
    out = []
    for path_keys, leaf in leaves_t:
        key = _path_key(path_keys)
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


def load_trained_variables(path: str) -> Dict[str, Any]:
    """Load an exported inference asset (scripts/export_trained.py) into a
    flax variables dict ``{"params": ..., "batch_stats": ...}``.

    The asset stores the flat ``.params/...`` / ``.batch_stats/...`` leaves
    of a TrainState checkpoint (float16 for size); this rebuilds the nested
    tree and upcasts to float32. Fills the role of the reference's released
    ``pretrained/best.pth.tar`` consumers (reference model_building.py:255-263)
    without torch pickling.
    """
    out: Dict[str, Any] = {}
    with np.load(path, allow_pickle=False) as z:
        for k in z.files:
            if k == "__metadata__":
                continue
            parts = k.split(_SEP)
            col = parts[0].lstrip(".")
            if col not in ("params", "batch_stats"):
                continue
            node = out.setdefault(col, {})
            for p in parts[1:-1]:
                node = node.setdefault(p, {})
            arr = z[k]
            if arr.dtype == np.float16:
                arr = arr.astype(np.float32)
            node[parts[-1]] = arr
    if "params" not in out:
        raise ValueError(f"{path} holds no '.params/' leaves — not an "
                         "exported inference asset")
    return out


_TRAINED_ASSETS = {"mobilenet_v2": "synergynet_mbv2_shaded680k_ep80.npz"}


def shipped_trained_path(arch: str = "mobilenet_v2") -> str:
    """Path of the shipped trained asset for ``arch`` (package data under
    ``synergynet_tpu/assets/trained/``, exported by
    scripts/export_trained.py from the executed full-recipe run — the role
    of the reference's released ``pretrained/best.pth.tar``). Raises for
    archs without a shipped run.

    The asset is wheel package data (pyproject ``[tool.setuptools.
    package-data]``), so this works for installed wheels as well as repo
    checkouts (ADVICE round 4)."""
    if arch not in _TRAINED_ASSETS:
        raise ValueError(
            f"no shipped trained weights for arch {arch!r} "
            f"(have: {sorted(_TRAINED_ASSETS)})")
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(pkg_root, "assets", "trained",
                        _TRAINED_ASSETS[arch])
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"shipped trained asset missing at {path} — package data not "
            "installed?")
    return path


def load_shipped_trained(arch: str = "mobilenet_v2") -> Dict[str, Any]:
    """The shipped full-recipe weights as flax variables (see
    :func:`load_trained_variables`)."""
    return load_trained_variables(shipped_trained_path(arch))


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

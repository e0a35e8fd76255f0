"""Import FaceBoxes PyTorch weights into the flax FaceBoxesNet.

The reference ships a trained detector checkpoint
(FaceBoxes/weights/FaceBoxesProd.pth, loaded at FaceBoxes/FaceBoxes.py:49-50
with a ``module.`` prefix strip, FaceBoxes/utils/functions.py:20-43). This
module converts that torch ``state_dict`` into the flax variable tree of
:class:`synergynet_tpu.detect.net.FaceBoxesNet` — conv weights transposed
OIHW -> HWIO, BatchNorm split into params (scale, bias) and batch_stats
(mean, var) — and caches the result as a framework-native ``.npz`` so torch
is only needed once.

Without any checkpoint available the loader falls back to deterministic
random init so the full pipeline stays runnable (the detector then finds
nothing meaningful; tests inject synthetic weights instead).
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from synergynet_tpu.detect.net import FaceBoxesNet

def _asset_dir() -> str:
    """Repo ``assets/`` in a checkout; a user cache dir for wheel installs
    (the package parent is site-packages there — generated caches must not
    be written into the install; see mm3d.assets._default_cache_path)."""
    root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    if os.path.exists(os.path.join(root, "pyproject.toml")):
        return os.path.join(root, "assets")
    base = (os.environ.get("XDG_CACHE_HOME")
            or os.path.join(os.path.expanduser("~"), ".cache"))
    return os.path.join(base, "synergynet_tpu")


_ASSET_DIR = _asset_dir()
_NPZ_CACHE = os.path.join(_ASSET_DIR, "faceboxes.npz")

# torch module path -> flax module path (same block/branch names by design).
_HEAD_MAP = {"loc.0": "loc0", "loc.1": "loc1", "loc.2": "loc2",
             "conf.0": "conf0", "conf.1": "conf1", "conf.2": "conf2"}


def _default_torch_path() -> Optional[str]:
    for p in (os.environ.get("SYNERGY_FACEBOXES_WEIGHTS"),
              "/root/reference/FaceBoxes/weights/FaceBoxesProd.pth"):
        if p and os.path.exists(p):
            return p
    return None


def convert_torch_state_dict(sd: Dict[str, "np.ndarray"]) -> dict:
    """torch state_dict (tensors or arrays) -> flax variables dict."""
    params: dict = {}
    stats: dict = {}

    def put(tree, path, leaf):
        node = tree
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = jnp.asarray(leaf)

    for name, val in sd.items():
        if name.startswith("module."):
            name = name[len("module."):]
        arr = np.asarray(val.detach().cpu().numpy()
                         if hasattr(val, "detach") else val)
        parts = name.split(".")
        if parts[0] in ("loc", "conf"):
            mod = _HEAD_MAP[".".join(parts[:2])]
            kind = parts[2]
            if kind == "weight":
                put(params, (mod, "kernel"), arr.transpose(2, 3, 1, 0))
            else:
                put(params, (mod, "bias"), arr)
            continue
        # conv1.conv.weight / inception1.branch3x3.bn.running_mean / ...
        mod_path = parts[:-2] + [parts[-2]]
        leaf = parts[-1]
        flax_mod = tuple(mod_path)
        if leaf == "weight" and parts[-2] == "conv":
            put(params, flax_mod + ("kernel",), arr.transpose(2, 3, 1, 0))
        elif leaf == "weight" and parts[-2] == "bn":
            put(params, flax_mod + ("scale",), arr)
        elif leaf == "bias" and parts[-2] == "bn":
            put(params, flax_mod + ("bias",), arr)
        elif leaf == "running_mean":
            put(stats, flax_mod + ("mean",), arr)
        elif leaf == "running_var":
            put(stats, flax_mod + ("var",), arr)
        # num_batches_tracked: dropped.

    return {"params": params, "batch_stats": stats}


def _flatten(tree, prefix=()):
    for k, v in tree.items():
        if isinstance(v, dict):
            yield from _flatten(v, prefix + (k,))
        else:
            yield "/".join(prefix + (k,)), np.asarray(v)


def _unflatten(flat: Dict[str, np.ndarray]) -> dict:
    tree: dict = {}
    for key, arr in flat.items():
        node = tree
        parts = key.split("/")
        for k in parts[:-1]:
            node = node.setdefault(k, {})
        node[parts[-1]] = jnp.asarray(arr)
    return tree


def save_variables_npz(path: str, variables: dict) -> None:
    np.savez_compressed(path, **dict(_flatten(variables)))


def load_variables_npz(path: str) -> dict:
    z = np.load(path)
    return _unflatten({k: z[k] for k in z.files})


def random_init_variables(seed: int = 0) -> dict:
    net = FaceBoxesNet()
    x = jnp.zeros((1, 256, 256, 3), jnp.float32)
    return net.init(jax.random.PRNGKey(seed), x, train=False)


def load_faceboxes_variables(weights_path: Optional[str] = None) -> dict:
    """Resolve detector weights: explicit path > cached npz > torch import >
    random init."""
    if weights_path and weights_path.endswith(".npz"):
        return load_variables_npz(weights_path)
    if weights_path is None and os.path.exists(_NPZ_CACHE):
        return load_variables_npz(_NPZ_CACHE)
    torch_path = weights_path or _default_torch_path()
    if torch_path:
        import torch
        sd = torch.load(torch_path, map_location="cpu")
        variables = convert_torch_state_dict(sd)
        if weights_path is None:
            os.makedirs(_ASSET_DIR, exist_ok=True)
            tmp = _NPZ_CACHE + f".tmp{os.getpid()}.npz"
            save_variables_npz(tmp, variables)
            os.replace(tmp, _NPZ_CACHE)
        return variables
    return random_init_variables()

"""SynergyNet: image -> 3DMM parameters with forward/reverse synergy MLPs.

The TPU-native equivalent of the reference's core model
(model_building.py:65-165): a backbone (I2P) regresses the 62-d parameter
vector, the forward MLP refines decoded landmarks, the reverse MLP regresses
parameters back from refined landmarks. Unlike the reference — where losses
are mutated into a dict on the module (quirk Q11) and BFM bases live as
replicated torch buffers — this module is a pure function-of-inputs; the
5-term training loss lives in :func:`synergy_criterion`, which takes the
``ParamPack`` as an explicit argument and returns a fresh dict.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from synergynet_tpu.mm3d.assets import ParamPack
from synergynet_tpu.mm3d.codec import decode_landmarks
from synergynet_tpu.losses import wing_loss, param_loss
from synergynet_tpu.nn.backbones import make_backbone
from synergynet_tpu.nn.pointnet import MLPFor, MLPRev

REFINE_SCALE = 0.05   # lmk + 0.05 * residual (reference model_building.py:150)

LOSS_WEIGHTS = {       # reference model_building.py:146-155
    "loss_LMK_f0": 0.05,
    "loss_Param_In": 0.02,
    "loss_LMK_pointNet": 0.05,
    "loss_Param_S2": 0.02,
    "loss_Param_S1S2": 0.001,
}


class SynergyNet(nn.Module):
    """Backbone + synergy MLP pair.

    ``__call__`` returns the test-time 62-d parameters; ``refine`` and
    ``reverse`` expose the synergy stages for the training criterion.
    """

    arch: str = "mobilenet_v2"
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.backbone = make_backbone(self.arch, dtype=self.dtype)
        self.forward_direction = MLPFor(dtype=jnp.float32)
        self.reverse_direction = MLPRev(dtype=jnp.float32)

    def __call__(self, images: jnp.ndarray, train: bool = False
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """(B, 120, 120, 3) normalized NHWC -> ((B, 62) params, (B, C) feat)."""
        return self.backbone(images, train)

    def refine(self, lmk: jnp.ndarray, feat: jnp.ndarray,
               shape_code: jnp.ndarray, exp_code: jnp.ndarray,
               train: bool = False) -> jnp.ndarray:
        """Landmarks (B, 3, 68) -> refined landmarks (B, 3, 68)."""
        residual = self.forward_direction(
            lmk.transpose(0, 2, 1), feat, shape_code, exp_code, train)
        return lmk + REFINE_SCALE * residual.transpose(0, 2, 1)

    def reverse(self, lmk: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """Refined landmarks (B, 3, 68) -> 62-d parameters."""
        return self.reverse_direction(lmk.transpose(0, 2, 1), train)

    def init_all(self, images: jnp.ndarray, train: bool = False):
        """Touches every submodule so ``model.init(..., method=SynergyNet.
        init_all)`` creates the full variable tree (``__call__`` alone only
        initializes the backbone)."""
        p62, feat = self.backbone(images, train)
        lmk = jnp.zeros((images.shape[0], 3, 68), jnp.float32)
        lmk_r = self.refine(lmk, feat, p62[:, 12:52], p62[:, 52:62], train)
        return p62, self.reverse(lmk_r, train)


def init_synergy_variables(model: SynergyNet, rng: jax.Array,
                           batch: int = 1) -> Dict[str, Any]:
    """Initialize the complete SynergyNet variable tree.

    Init runs on the host CPU backend when one exists: over the
    remote-TPU tunnel the throwaway init program costs minutes of compile
    (~200 s measured) for ~3 MB of weights; initializing on CPU and
    uploading once is ~0.1 s. Single-platform jobs fall through to the
    default device.
    """
    import contextlib
    x = jnp.zeros((batch, 120, 120, 3), jnp.float32)
    on_cpu = jax.default_backend() != "cpu"
    try:
        ctx = (jax.default_device(jax.devices("cpu")[0]) if on_cpu
               else contextlib.nullcontext())
    except Exception:
        on_cpu = False
        ctx = contextlib.nullcontext()
    with ctx:
        variables = model.init(rng, x, train=False,
                               method=SynergyNet.init_all)
    if on_cpu:
        # local_devices, not devices: under multi-process SPMD the global
        # list leads with process 0's devices, which are non-addressable
        # from other ranks and device_put would raise there.
        variables = jax.device_put(variables, jax.local_devices()[0])
    return variables


def synergy_criterion(model: SynergyNet, variables: Dict[str, Any],
                      images: jnp.ndarray, target62: jnp.ndarray,
                      pack: ParamPack, *, train: bool = True,
                      dropout_rng: jax.Array | None = None
                      ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray], Dict]:
    """Full 5-term synergy training loss (reference model_building.py:141-157).

    Returns (total_loss, loss_dict, mutated_variable_updates). The total is
    the plain sum of the per-term means (reference main_train.py:128-132).
    """
    rngs = {"dropout": dropout_rng} if dropout_rng is not None else None
    # NB: flax treats mutable=[] differently from mutable=False (the former
    # still returns an (out, state) tuple), hence the explicit False.
    mutable = ["batch_stats"] if train else False

    def apply(method, *args):
        out = model.apply(variables, *args, train=train, rngs=rngs,
                          mutable=mutable, method=method)
        return out if train else (out, {})

    (pred62, feat), upd1 = apply(SynergyNet.__call__, images)
    target62 = target62.astype(jnp.float32)

    lmk = decode_landmarks(pred62, pack)
    lmk_gt = decode_landmarks(target62, pack)

    losses = {
        "loss_LMK_f0": LOSS_WEIGHTS["loss_LMK_f0"] * wing_loss(lmk, lmk_gt),
        "loss_Param_In": LOSS_WEIGHTS["loss_Param_In"] *
        jnp.mean(param_loss(pred62, target62)),
    }

    lmk_refined, upd2 = apply(SynergyNet.refine, lmk, feat,
                              pred62[:, 12:52], pred62[:, 52:62])
    losses["loss_LMK_pointNet"] = (
        LOSS_WEIGHTS["loss_LMK_pointNet"] * wing_loss(lmk_refined, lmk_gt))

    pred62_s2, upd3 = apply(SynergyNet.reverse, lmk_refined)
    losses["loss_Param_S2"] = LOSS_WEIGHTS["loss_Param_S2"] * jnp.mean(
        param_loss(pred62_s2, target62, mode="only_3dmm"))
    losses["loss_Param_S1S2"] = LOSS_WEIGHTS["loss_Param_S1S2"] * jnp.mean(
        param_loss(pred62_s2, pred62, mode="only_3dmm"))

    total = sum(losses.values())

    updates = {}
    if train:
        # Each apply returns the WHOLE mutable collection — including
        # stale passed-in copies of modules it did not execute (the three
        # applies all read from the same input ``variables``). Take each
        # module's stats from the apply that actually ran it; a naive
        # shallow merge would let the last apply's stale copies overwrite
        # the fresh backbone/forward updates (which silently froze the
        # backbone's BN running stats at init for self-trained runs).
        merged: Dict[str, Dict] = {}
        for upd, keys in ((upd1, ("backbone",)),
                          (upd2, ("forward_direction",)),
                          (upd3, ("reverse_direction",))):
            for col, tree in upd.items():
                dst = merged.setdefault(col, {})
                for k in keys:
                    if k in tree:
                        dst[k] = tree[k]
        updates = merged
    return total, losses, updates

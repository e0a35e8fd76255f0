"""FaceBoxes detector training: SSD multibox objective under jit.

The reference ships the training-side box code (match/encode/jaccard,
FaceBoxes/utils/box_utils.py:98-173) but no trainer — FaceBoxesProd.pth is
shipped pre-trained. This module completes the loop: anchor matching on the
host-free device path, multibox loss with hard negative mining
(:mod:`synergynet_tpu.detect.train_utils`), SGD+momentum step, and a
synthetic bright-box dataset so the whole path is exercisable end to end.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from synergynet_tpu.detect.anchors import generate_anchors
from synergynet_tpu.detect.net import FaceBoxesNet
from synergynet_tpu.detect.train_utils import match, multibox_loss


def make_synthetic_detection_batch(rng: np.random.Generator, batch: int,
                                   size: Tuple[int, int] = (256, 256),
                                   max_faces: int = 4
                                   ) -> Dict[str, np.ndarray]:
    """Frames with bright square 'faces' on dark noise + normalized GT boxes
    (padded to max_faces with valid mask)."""
    h, w = size
    images = rng.integers(0, 60, (batch, h, w, 3)).astype(np.float32)
    boxes = np.zeros((batch, max_faces, 4), np.float32)
    valid = np.zeros((batch, max_faces), bool)
    for b in range(batch):
        n = int(rng.integers(1, max_faces + 1))
        for k in range(n):
            side = int(rng.integers(32, 96))
            x0 = int(rng.integers(0, w - side))
            y0 = int(rng.integers(0, h - side))
            images[b, y0:y0 + side, x0:x0 + side] = rng.integers(
                170, 255, 3).astype(np.float32)
            boxes[b, k] = [x0 / w, y0 / h, (x0 + side) / w, (y0 + side) / h]
            valid[b, k] = True
    return {"images": images, "boxes": boxes, "valid": valid}


class DetectorTrainer:
    def __init__(self, image_size: Tuple[int, int] = (256, 256),
                 lr: float = 1e-3, momentum: float = 0.9,
                 iou_threshold: float = 0.35, neg_pos_ratio: int = 7,
                 seed: int = 0):
        self.image_size = image_size
        self.net = FaceBoxesNet()
        self.anchors = jnp.asarray(generate_anchors(*image_size))
        x = jnp.zeros((1,) + image_size + (3,), jnp.float32)
        variables = self.net.init(jax.random.PRNGKey(seed), x, train=True)
        self.params = variables["params"]
        self.batch_stats = variables.get("batch_stats", {})
        self.tx = optax.sgd(lr, momentum=momentum, nesterov=True)
        self.opt_state = self.tx.init(self.params)
        self._step = self._build_step(iou_threshold, neg_pos_ratio)

    def _build_step(self, iou_threshold: float, neg_pos_ratio: int):
        net, anchors, tx = self.net, self.anchors, self.tx
        match_batch = jax.vmap(match, in_axes=(0, 0, None, None))

        from synergynet_tpu.detect.detector import BGR_MEAN

        @jax.jit
        def step(params, batch_stats, opt_state, images, gt_boxes, gt_valid):
            loc_t, labels = match_batch(gt_boxes, gt_valid, anchors,
                                        iou_threshold)
            # Train on the SAME input transform the serving path applies
            # (detector.py: canvas - BGR_MEAN; reference FaceBoxes.py:89)
            # — training on raw 0-255 pixels would skew every deployed
            # conv1/BN statistic by ~110 per channel (round-5 review).
            images = images - jnp.asarray(BGR_MEAN, images.dtype)

            def loss_fn(p):
                (loc, conf), upd = net.apply(
                    {"params": p, "batch_stats": batch_stats}, images,
                    train=True, mutable=["batch_stats"])
                losses = multibox_loss(loc, conf, loc_t, labels,
                                       neg_pos_ratio=neg_pos_ratio)
                return losses["loss_total"], (losses, upd)

            (_, (losses, upd)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            updates, new_opt = tx.update(grads, opt_state, params)
            new_params = optax.apply_updates(params, updates)
            return (new_params, upd.get("batch_stats", batch_stats),
                    new_opt, losses)

        return step

    def train_step(self, batch: Dict[str, np.ndarray]) -> Dict[str, float]:
        self.params, self.batch_stats, self.opt_state, losses = self._step(
            self.params, self.batch_stats, self.opt_state,
            jnp.asarray(batch["images"]), jnp.asarray(batch["boxes"]),
            jnp.asarray(batch["valid"]))
        return {k: float(v) for k, v in losses.items()}

    def fit_synthetic(self, steps: int = 50, batch: int = 8,
                      seed: int = 0, log_every: int = 10,
                      log_fn=None) -> list:
        rng = np.random.default_rng(seed)
        history = []
        for i in range(steps):
            losses = self.train_step(make_synthetic_detection_batch(
                rng, batch, self.image_size))
            history.append(losses)
            if log_fn and i % log_every == 0:
                log_fn(f"[det {i}] {losses}")
        return history

    @property
    def variables(self) -> dict:
        return {"params": self.params, "batch_stats": self.batch_stats}

"""Detector training utilities: anchor matching, box encode, multibox loss.

Capability parity with the reference's training-side box code
(reference FaceBoxes/utils/box_utils.py:98-173 ``match``/``encode``/
``jaccard`` and the SSD-style multibox objective it serves; the reference
ships the code but no detector trainer). All functions are batched and
jit-able: matching is two argmaxes over the IoU matrix instead of the
reference's in-place index surgery.

Conventions: anchors are (A, 4) [cx, cy, w, h] normalized; ground-truth
boxes are (G, 4) corner-form normalized; variances (0.1, 0.2) mirror
decode's.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from synergynet_tpu.detect.anchors import VARIANCES


def center_to_corner(boxes: jnp.ndarray) -> jnp.ndarray:
    tl = boxes[..., :2] - boxes[..., 2:] / 2
    return jnp.concatenate([tl, tl + boxes[..., 2:]], axis=-1)


def jaccard(boxes_a: jnp.ndarray, boxes_b: jnp.ndarray) -> jnp.ndarray:
    """(A, 4) x (B, 4) corner boxes -> (A, B) IoU (no +1: normalized
    coordinates, reference box_utils.py:13-61)."""
    tl = jnp.maximum(boxes_a[:, None, :2], boxes_b[None, :, :2])
    br = jnp.minimum(boxes_a[:, None, 2:], boxes_b[None, :, 2:])
    wh = jnp.clip(br - tl, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    area_a = ((boxes_a[:, 2] - boxes_a[:, 0])
              * (boxes_a[:, 3] - boxes_a[:, 1]))[:, None]
    area_b = ((boxes_b[:, 2] - boxes_b[:, 0])
              * (boxes_b[:, 3] - boxes_b[:, 1]))[None, :]
    return inter / (area_a + area_b - inter)


def encode(matched: jnp.ndarray, anchors: jnp.ndarray,
           variances=VARIANCES) -> jnp.ndarray:
    """Corner GT (A, 4) matched per anchor -> regression targets (A, 4)
    (the inverse of decode; reference box_utils.py:158-173)."""
    g_cxcy = (matched[:, :2] + matched[:, 2:]) / 2 - anchors[:, :2]
    g_cxcy = g_cxcy / (variances[0] * anchors[:, 2:])
    g_wh = (matched[:, 2:] - matched[:, :2]) / anchors[:, 2:]
    g_wh = jnp.log(jnp.maximum(g_wh, 1e-8)) / variances[1]
    return jnp.concatenate([g_cxcy, g_wh], axis=1)


def match(gt_boxes: jnp.ndarray, gt_valid: jnp.ndarray,
          anchors: jnp.ndarray, iou_threshold: float = 0.35
          ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Assign ground truth to anchors (reference box_utils.py:98-155).

    Bipartite stage: every valid GT claims its best anchor (guaranteed
    positive); per-anchor stage: remaining anchors take their best GT if
    IoU >= threshold. Returns (loc_targets (A, 4), labels (A,) int32 —
    1 face / 0 background). ``gt_valid`` masks padded GT rows.
    """
    a_corner = center_to_corner(anchors)
    iou = jaccard(gt_boxes, a_corner)                     # (G, A)
    iou = jnp.where(gt_valid[:, None], iou, -1.0)

    best_anchor_per_gt = jnp.argmax(iou, axis=1)          # (G,)
    best_gt_per_anchor = jnp.argmax(iou, axis=0)          # (A,)
    best_iou_per_anchor = jnp.max(iou, axis=0)

    # Force-claim: anchor best_anchor_per_gt[g] belongs to gt g. Invalid
    # (padded) rows argmax to anchor 0 on their all-(-1) IoU row; redirect
    # them off-array so their dropped writes can never race a valid GT's
    # claim of anchor 0 (duplicate-index .at[].set is nondeterministic;
    # round-5 review).
    num_a = anchors.shape[0]
    claim_idx = jnp.where(gt_valid, best_anchor_per_gt, num_a)
    claimed = jnp.zeros((num_a,), bool).at[claim_idx].set(
        True, mode="drop")
    gt_of_claim = jnp.zeros((num_a,), jnp.int32).at[claim_idx].set(
        jnp.arange(gt_boxes.shape[0], dtype=jnp.int32), mode="drop")

    assigned_gt = jnp.where(claimed, gt_of_claim, best_gt_per_anchor)
    positive = claimed | (best_iou_per_anchor >= iou_threshold)

    matched = gt_boxes[assigned_gt]
    loc_t = encode(matched, anchors)
    labels = positive.astype(jnp.int32)
    return loc_t, labels


def smooth_l1(x: jnp.ndarray) -> jnp.ndarray:
    ax = jnp.abs(x)
    return jnp.where(ax < 1.0, 0.5 * x * x, ax - 0.5)


@partial(jax.jit, static_argnames=("neg_pos_ratio",))
def multibox_loss(loc_pred: jnp.ndarray, conf_logits: jnp.ndarray,
                  loc_t: jnp.ndarray, labels: jnp.ndarray,
                  neg_pos_ratio: int = 7) -> dict:
    """SSD multibox objective with hard negative mining, batched.

    loc_pred (B, A, 4), conf_logits (B, A, 2), loc_t (B, A, 4),
    labels (B, A) in {0, 1}. Negatives are mined per sample by confidence
    loss rank, capped at ``neg_pos_ratio`` x positives.
    """
    pos = labels > 0
    n_pos = jnp.sum(pos, axis=1)                          # (B,)

    loss_l = jnp.sum(smooth_l1(loc_pred - loc_t).sum(-1) * pos, axis=1)

    ce = -jax.nn.log_softmax(conf_logits)[
        ..., 0] * (1 - labels) - jax.nn.log_softmax(conf_logits)[
        ..., 1] * labels                                   # (B, A)

    # Hard negative mining: rank background anchors by loss.
    neg_loss = jnp.where(pos, -jnp.inf, ce)
    order = jnp.argsort(-neg_loss, axis=1)
    rank = jnp.argsort(order, axis=1)
    n_neg = jnp.minimum(neg_pos_ratio * n_pos,
                        jnp.sum(~pos, axis=1))
    neg = rank < n_neg[:, None]

    loss_c = jnp.sum(ce * (pos | neg), axis=1)
    denom = jnp.maximum(n_pos.astype(jnp.float32), 1.0)
    return {
        "loss_loc": jnp.mean(loss_l / denom),
        "loss_conf": jnp.mean(loss_c / denom),
        "loss_total": jnp.mean((loss_l + loss_c) / denom),
    }

"""Greedy NMS as a fixpoint of masked matrix-vector products — TPU-native.

The reference suppresses boxes with a sequential scalar Cython loop
(reference: FaceBoxes/utils/nms/cpu_nms.pyx:17-67). A literal translation
(fori_loop over candidates) would serialize thousands of tiny steps on the
TPU. Instead we exploit the structure of greedy NMS: with boxes sorted by
score, box i is kept iff no kept box j < i has IoU >= threshold — a
well-founded recurrence whose unique fixpoint can be reached by iterating

    keep <- ~(A @ keep > 0),   A[i, j] = (iou[i, j] >= t) & (j < i)

from keep = all-ones. Each iteration settles every box whose "suppression
chain" depth is <= the iteration count, so convergence takes O(longest
chain) iterations (single digits for real face layouts, never more than K),
and each iteration is one K x K matvec on the MXU. Result is bit-identical
to the sequential greedy algorithm.

IoU uses the +1 pixel-inclusive areas of the reference (cpu_nms.pyx:24,57-60).
All shapes are static: callers pad candidates to K and mark padding with
score -inf (padding rows decode to degenerate boxes that never suppress).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def pairwise_iou(boxes: jnp.ndarray) -> jnp.ndarray:
    """(K, 4) corner boxes -> (K, K) IoU with +1 inclusive areas."""
    x1, y1, x2, y2 = (boxes[:, i] for i in range(4))
    area = (x2 - x1 + 1.0) * (y2 - y1 + 1.0)
    xx1 = jnp.maximum(x1[:, None], x1[None, :])
    yy1 = jnp.maximum(y1[:, None], y1[None, :])
    xx2 = jnp.minimum(x2[:, None], x2[None, :])
    yy2 = jnp.minimum(y2[:, None], y2[None, :])
    w = jnp.maximum(0.0, xx2 - xx1 + 1.0)
    h = jnp.maximum(0.0, yy2 - yy1 + 1.0)
    inter = w * h
    return inter / (area[:, None] + area[None, :] - inter)


@partial(jax.jit, static_argnames=("iou_threshold",))
def greedy_nms_mask(boxes: jnp.ndarray, valid: jnp.ndarray,
                    iou_threshold: float = 0.3) -> jnp.ndarray:
    """Keep-mask of greedy NMS over score-sorted ``boxes`` (K, 4).

    ``valid`` (K,) bool marks real (non-padding) candidates; padding is
    never kept and never suppresses.
    """
    k = boxes.shape[0]
    iou = pairwise_iou(boxes)
    lower = jnp.tril(jnp.ones((k, k), jnp.float32), -1)     # j < i
    sup = (iou >= iou_threshold).astype(jnp.float32) * lower
    sup = sup * valid[None, :].astype(jnp.float32)          # only real j suppress

    def cond(state):
        keep, prev, it = state
        return jnp.logical_and(jnp.any(keep != prev), it < k)

    def body(state):
        keep, _, it = state
        suppressed = (sup @ keep.astype(jnp.float32)) > 0.0
        return jnp.logical_and(~suppressed, valid), keep, it + 1

    keep0 = valid
    keep, _, _ = jax.lax.while_loop(
        cond, body, (keep0, jnp.zeros_like(keep0), jnp.int32(0)))
    return keep


def nms_indices(dets, iou_threshold: float = 0.3):
    """Reference-compatible host API: (N, 5) [x1 y1 x2 y2 score] -> kept
    indices in descending-score order (reference nms_wrapper.py:13-19)."""
    import numpy as np

    dets = np.asarray(dets, np.float32)
    order = np.argsort(-dets[:, 4], kind="stable")
    boxes = jnp.asarray(dets[order, :4])
    valid = jnp.ones((dets.shape[0],), bool)
    keep = np.asarray(greedy_nms_mask(boxes, valid, iou_threshold))
    return [int(i) for i in order[keep]]


@partial(jax.jit, static_argnames=("sigma", "iou_threshold",
                                   "score_threshold", "method"))
def soft_nms_device(boxes: jnp.ndarray, scores: jnp.ndarray,
                    valid: jnp.ndarray, sigma: float = 0.5,
                    iou_threshold: float = 0.3,
                    score_threshold: float = 0.001,
                    method: str = "gaussian"):
    """Device-side soft-NMS over a fixed candidate budget.

    The sequential pick-max/decay recurrence of the reference's
    ``cpu_soft_nms`` (FaceBoxes/utils/nms/cpu_nms.pyx:70-163) is inherently
    serial in its pick order, but each round's score decay is a dense
    vector op — so the jit formulation precomputes the (K, K) IoU matrix
    once (MXU) and runs a ``fori_loop`` of K cheap VPU rounds: argmax pick,
    gather the pick's IoU row, decay, threshold-discard. Static shapes
    throughout; padding is marked invalid and never picked.

    Returns ``(pick_idx (K,), pick_score (K,), n_picked)``: the first
    ``n_picked`` entries are kept candidate indices in pick order with
    their (decayed) scores — the same contract as the host :func:`soft_nms`
    expressed over original indices.
    """
    k = scores.shape[0]
    neg = jnp.float32(-jnp.inf)
    iou = pairwise_iou(boxes)
    live = jnp.where(valid, scores.astype(jnp.float32), neg)

    def body(i, state):
        live, idx, out = state
        j = jnp.argmax(live)
        s = live[j]
        row = iou[j]
        if method == "linear":
            decay = jnp.where(row > iou_threshold, 1.0 - row, 1.0)
        elif method == "gaussian":
            decay = jnp.exp(-(row * row) / sigma)
        else:                                   # hard: ov > Nt -> 0
            decay = jnp.where(row > iou_threshold, 0.0, 1.0)
        # guard dead entries: -inf * 0 would poison the argmax with NaN
        new = jnp.where(live > neg, live * decay, neg)
        # the reference's threshold discard runs only inside its
        # positive-overlap branch (cpu_nms.pyx:128-158): a box that merely
        # *starts* below threshold survives until it overlaps a pick
        new = jnp.where((row > 0.0) & (new < score_threshold), neg, new)
        new = new.at[j].set(neg)
        picked = s > neg
        live = jnp.where(picked, new, live)
        idx = idx.at[i].set(jnp.where(picked, j, -1))
        out = out.at[i].set(s)
        return live, idx, out

    _, idx, out = jax.lax.fori_loop(
        0, k, body,
        (live, jnp.full((k,), -1, jnp.int32), jnp.full((k,), neg)))
    return idx, out, jnp.sum(out > neg)


def soft_nms(dets, sigma: float = 0.5, iou_threshold: float = 0.3,
             score_threshold: float = 0.001, method: str = "gaussian"):
    """Soft-NMS (Bodla et al. 2017) — capability parity with the reference's
    ``cpu_soft_nms`` (FaceBoxes/utils/nms/cpu_nms.pyx:70-163): instead of
    suppressing overlaps, decay their scores (linear: score *= 1 - IoU when
    IoU > threshold; gaussian: score *= exp(-IoU^2 / sigma); 'hard' = classic
    NMS). Vectorized over the remaining set per kept box; returns kept
    detections (M, 5) in pick order.
    """
    import numpy as np

    dets = np.asarray(dets, np.float32).copy()
    out = []
    while dets.shape[0]:
        # The reference picks the max-score box unconditionally (its only
        # discard rule is the post-decay `< threshold` test below,
        # cpu_nms.pyx:150-158), so no early break on the best score here.
        i = int(np.argmax(dets[:, 4]))
        best = dets[i].copy()
        out.append(best)
        dets = np.delete(dets, i, axis=0)
        if not dets.shape[0]:
            break
        xx1 = np.maximum(best[0], dets[:, 0])
        yy1 = np.maximum(best[1], dets[:, 1])
        xx2 = np.minimum(best[2], dets[:, 2])
        yy2 = np.minimum(best[3], dets[:, 3])
        w = np.maximum(0.0, xx2 - xx1 + 1)
        h = np.maximum(0.0, yy2 - yy1 + 1)
        inter = w * h
        area_b = (best[2] - best[0] + 1) * (best[3] - best[1] + 1)
        area = (dets[:, 2] - dets[:, 0] + 1) * (dets[:, 3] - dets[:, 1] + 1)
        iou = inter / (area_b + area - inter)
        if method == "linear":
            decay = np.where(iou > iou_threshold, 1.0 - iou, 1.0)
        elif method == "gaussian":
            decay = np.exp(-(iou * iou) / sigma)
        else:                                   # hard NMS: ov > Nt -> 0
            decay = np.where(iou > iou_threshold, 0.0, 1.0)
        # No-overlap boxes are untouched in the reference (the decay only
        # applies inside the iw/ih > 0 branch, cpu_nms.pyx:126-148) — decay
        # is 1.0 at iou == 0 for every method, so a plain multiply matches.
        # The threshold discard lives inside that same branch, so it only
        # fires for boxes overlapping this round's pick (cpu_nms.pyx:151).
        dets[:, 4] *= decay.astype(np.float32)
        dets = dets[~((iou > 0) & (dets[:, 4] < score_threshold))]
    return np.asarray(out, np.float32).reshape(-1, 5)

"""Numpy oracles: independent single-sample re-derivations of the reference
math (SynergyNet utils/inference.py, model_building.py), used to validate the
batched JAX implementations. Deliberately written in the reference's
single-sample numpy style so any divergence in the JAX code is caught.
"""

import numpy as np

STD_SIZE = 120


def oracle_param2vert(param, pack, dense=False, transform=True):
    """Single (62,) whitened param -> (3, N). Reference utils/inference.py:64-84."""
    param_ = param * np.asarray(pack.param_std)[:62] + np.asarray(pack.param_mean)[:62]
    p_ = param_[:12].reshape(3, 4)
    p, offset = p_[:, :3], p_[:, 3:]
    a_shp = param_[12:52].reshape(40, 1)
    a_exp = param_[52:62].reshape(10, 1)
    if dense:
        u, ws, we = np.asarray(pack.u), np.asarray(pack.w_shp), np.asarray(pack.w_exp)
    else:
        u, ws, we = (np.asarray(pack.u_base), np.asarray(pack.w_shp_base),
                     np.asarray(pack.w_exp_base))
    vertex = p @ (u + ws @ a_shp + we @ a_exp).reshape(3, -1, order="F") + offset
    if transform:
        vertex[1, :] = STD_SIZE + 1 - vertex[1, :]
    return vertex


def oracle_p2srt(P):
    """Reference utils/inference.py:33-43."""
    t3d = P[:, 3]
    R1, R2 = P[0:1, :3], P[1:2, :3]
    s = (np.linalg.norm(R1) + np.linalg.norm(R2)) / 2.0
    r1 = R1 / np.linalg.norm(R1)
    r2 = R2 / np.linalg.norm(R2)
    r3 = np.cross(r1, r2)
    return s, np.concatenate((r1, r2, r3), 0), t3d


def oracle_matrix2angle(R):
    """Reference utils/inference.py:45-62 (degrees)."""
    from math import asin, atan2, cos
    if R[2, 0] != 1 and R[2, 0] != -1:
        x = asin(R[2, 0])
        y = atan2(R[1, 2] / cos(x), R[2, 2] / cos(x))
        z = atan2(R[0, 1] / cos(x), R[0, 0] / cos(x))
    else:
        z = 0
        if R[2, 0] == -1:
            x = np.pi / 2
            y = z + atan2(R[0, 1], R[0, 2])
        else:
            x = -np.pi / 2
            y = -z + atan2(-R[0, 1], -R[0, 2])
    return np.array([x, y, z]) * 180 / np.pi


def oracle_rescale(vertex, roi_box):
    """Reference utils/inference.py:127-138."""
    vertex = vertex.copy()
    sx, sy, ex, ey = roi_box[:4]
    scale_x = (ex - sx) / STD_SIZE
    scale_y = (ey - sy) / STD_SIZE
    vertex[0, :] = vertex[0, :] * scale_x + sx
    vertex[1, :] = vertex[1, :] * scale_y + sy
    vertex[2, :] *= (scale_x + scale_y) / 2
    return vertex


def oracle_wing_loss(pred, target, omega=10.0, epsilon=2.0):
    """Reference loss_definition.py:15-27: flattened-3N wing loss, mean over
    all elements with count-based denominator."""
    import math
    delta = np.abs(target - pred).reshape(-1)
    small = delta < omega
    loss1 = omega * np.log(1 + delta[small] / epsilon)
    C = omega - omega * math.log(1 + omega / epsilon)
    loss2 = delta[~small] - C
    return (loss1.sum() + loss2.sum()) / delta.size


def oracle_param_loss(inp, target, mode="normal"):
    """Reference loss_definition.py:35-41 (per-sample sqrt of mean MSEs)."""
    se = (inp - target) ** 2 if mode == "normal" else None
    if mode == "normal":
        loss = ((inp[:, :12] - target[:, :12]) ** 2).mean(1) + \
               ((inp[:, 12:] - target[:, 12:]) ** 2).mean(1)
    else:  # only_3dmm — including the reference's slice asymmetry (quirk Q3)
        loss = ((inp[:, :50] - target[:, 12:62]) ** 2).mean(1)
    return np.sqrt(loss)

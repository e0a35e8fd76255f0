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


# ---------------------------------------------------------------------------
# Rendering oracles (reference Sim3DR/lib/rasterize_kernel.cpp)


def _bary(px, py, p0, p1, p2):
    """Barycentric (u, v) with the reference's degenerate convention
    (rasterize_kernel.cpp:26-83)."""
    v0 = p2[:2] - p0[:2]
    v1 = p1[:2] - p0[:2]
    v2 = np.array([px, py], np.float32) - p0[:2]
    dot00 = v0 @ v0
    dot01 = v0 @ v1
    dot02 = v0 @ v2
    dot11 = v1 @ v1
    dot12 = v1 @ v2
    den = dot00 * dot11 - dot01 * dot01
    inv = 0.0 if den == 0 else 1.0 / den
    u = (dot11 * dot02 - dot01 * dot12) * inv
    v = (dot00 * dot12 - dot01 * dot02) * inv
    return u, v


def oracle_rasterize(image_u8, vertices, triangles, colors, alpha=1.0,
                     reverse=False):
    """Faithful sequential z-buffer rasterizer (rasterize_kernel.cpp:219-287)
    including its order-dependent repeated blending. Mutates & returns a copy
    of ``image_u8``; also returns the final depth buffer."""
    import math

    img = image_u8.copy()
    h, w, c = img.shape
    depth_buffer = np.full((h, w), -1e8, np.float32)
    for i in range(triangles.shape[0]):
        i0, i1, i2 = triangles[i]
        p0, p1, p2 = vertices[i0], vertices[i1], vertices[i2]
        x_min = max(int(math.floor(min(p0[0], p1[0], p2[0]))), 0)
        x_max = min(int(math.ceil(max(p0[0], p1[0], p2[0]))), w - 1)
        y_min = max(int(math.floor(min(p0[1], p1[1], p2[1]))), 0)
        y_max = min(int(math.ceil(max(p0[1], p1[1], p2[1]))), h - 1)
        if x_max < x_min or y_max < y_min:
            continue
        for y in range(y_min, y_max + 1):
            for x in range(x_min, x_max + 1):
                u, v = _bary(x, y, p0, p1, p2)
                if not (u >= 0 and v >= 0 and u + v < 1):
                    continue
                w0, w1, w2 = 1 - u - v, v, u
                p_depth = w0 * p0[2] + w1 * p1[2] + w2 * p2[2]
                if p_depth > depth_buffer[y, x]:
                    yy = h - 1 - y if reverse else y
                    for k in range(c):
                        p_color = (w0 * colors[i0, k] + w1 * colors[i1, k]
                                   + w2 * colors[i2, k])
                        img[yy, x, k] = np.uint8(int(
                            (1 - alpha) * img[yy, x, k]
                            + alpha * 255.0 * p_color))
                    depth_buffer[y, x] = p_depth
    return img, depth_buffer


def oracle_get_normal(vertices, triangles):
    """Fused vertex normal (rasterize_kernel.cpp:158-215, unguarded)."""
    tri_n = np.cross(vertices[triangles[:, 1]] - vertices[triangles[:, 0]],
                     vertices[triangles[:, 2]] - vertices[triangles[:, 0]])
    acc = np.zeros_like(vertices, np.float32)
    for i in range(triangles.shape[0]):
        for k in triangles[i]:
            acc[k] += tri_n[i]
    with np.errstate(invalid="ignore", divide="ignore"):
        return acc / np.sqrt((acc ** 2).sum(1))[:, None]


def oracle_soft_nms(boxes, sigma=0.5, nt=0.3, threshold=0.001,
                    method="gaussian"):
    """Faithful simulation of the reference's in-place selection-sort
    soft-NMS (FaceBoxes/utils/nms/cpu_nms.pyx:70-163): position i receives
    the max-score box among [i, N); the rest are decayed against it; boxes
    whose decayed score drops below ``threshold`` are swapped out with the
    last live box and N shrinks. Returns the surviving boxes[:N] (pick
    order), which is what the pyx's ``keep = range(N)`` indexes."""
    b = np.asarray(boxes, np.float32).copy()
    m = {"hard": 0, "linear": 1, "gaussian": 2}[method]
    n = b.shape[0]
    i = 0
    while i < n:
        maxpos = i + int(np.argmax(b[i:n, 4]))
        b[[i, maxpos]] = b[[maxpos, i]]
        tx1, ty1, tx2, ty2 = b[i, :4]
        pos = i + 1
        while pos < n:
            x1, y1, x2, y2, s = b[pos]
            iw = min(tx2, x2) - max(tx1, x1) + 1
            ih = min(ty2, y2) - max(ty1, y1) + 1
            if iw > 0 and ih > 0:
                ua = ((tx2 - tx1 + 1) * (ty2 - ty1 + 1)
                      + (x2 - x1 + 1) * (y2 - y1 + 1) - iw * ih)
                ov = iw * ih / ua
                if m == 1:
                    weight = 1 - ov if ov > nt else 1.0
                elif m == 2:
                    weight = np.exp(-(ov * ov) / sigma)
                else:
                    weight = 0.0 if ov > nt else 1.0
                b[pos, 4] = np.float32(weight) * b[pos, 4]
                if b[pos, 4] < threshold:
                    b[pos] = b[n - 1]
                    n -= 1
                    pos -= 1
            pos += 1
        i += 1
    return b[:n]


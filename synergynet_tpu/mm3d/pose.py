"""Head-pose math: camera matrix factorisation and Euler angles, batched.

Re-derivation of the reference's single-sample numpy pose path
(utils/inference.py:33-62,86-92) as branchless, jit/vmap-able JAX:

- ``p2srt``: factor the 3x4 camera matrix P into scale s, rotation R and
  translation t3d. s = mean of the first two row norms; r3 = r1 x r2
  (reference utils/inference.py:33-43).
- ``matrix_to_euler_deg``: the reference's ``matrix2angle_corr``
  (utils/inference.py:45-62): x = asin(R20), y = atan2(R12, R22),
  z = atan2(R01, R00) in degrees. The reference divides the atan2 operands
  by cos(x), which never changes the angle when cos(x) > 0 (the non-gimbal
  regime) — we use plain atan2 plus an explicit gimbal-lock branch expressed
  with ``jnp.where`` so there is no data-dependent Python control flow.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from synergynet_tpu.mm3d.assets import ParamPack, STD_SIZE
from synergynet_tpu.mm3d.codec import dewhiten


def p2srt(P: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Batched (B,3,4) -> (s (B,), R (B,3,3), t3d (B,3))."""
    t3d = P[:, :, 3]
    R1 = P[:, 0:1, :3]
    R2 = P[:, 1:2, :3]
    n1 = jnp.linalg.norm(R1, axis=(1, 2))
    n2 = jnp.linalg.norm(R2, axis=(1, 2))
    s = (n1 + n2) / 2.0
    r1 = R1[:, 0] / n1[:, None]
    r2 = R2[:, 0] / n2[:, None]
    r3 = jnp.cross(r1, r2)
    R = jnp.stack([r1, r2, r3], axis=1)
    return s, R, t3d


def matrix_to_euler_deg(R: jnp.ndarray) -> jnp.ndarray:
    """Batched (B,3,3) -> (B,3) [rx, ry, rz] degrees (yaw, pitch, roll order
    as the reference labels it). Gimbal-lock handled branchlessly."""
    r20 = jnp.clip(R[:, 2, 0], -1.0, 1.0)
    locked = jnp.abs(jnp.abs(r20) - 1.0) < 1e-7

    x = jnp.arcsin(r20)
    y = jnp.arctan2(R[:, 1, 2], R[:, 2, 2])
    z = jnp.arctan2(R[:, 0, 1], R[:, 0, 0])

    # Gimbal branches (reference utils/inference.py:51-58), z := 0.
    x_lock = jnp.where(r20 < 0, jnp.pi / 2, -jnp.pi / 2)
    y_lock_neg = jnp.arctan2(R[:, 0, 1], R[:, 0, 2])      # R20 == -1
    y_lock_pos = jnp.arctan2(-R[:, 0, 1], -R[:, 0, 2])    # R20 == +1
    y_lock = jnp.where(r20 < 0, y_lock_neg, y_lock_pos)

    x = jnp.where(locked, x_lock, x)
    y = jnp.where(locked, y_lock, y)
    z = jnp.where(locked, 0.0, z)
    return jnp.stack([x, y, z], axis=1) * (180.0 / jnp.pi)


def pose_from_param(param: jnp.ndarray, pack: ParamPack
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Whitened (B,62) -> (angles_deg (B,3), t3d (B,3)).

    Equivalent of reference ``parse_pose`` (utils/inference.py:86-92).
    """
    param_raw = dewhiten(param, pack)
    P = param_raw[:, :12].reshape(-1, 3, 4)
    _, R, t3d = p2srt(P)
    return matrix_to_euler_deg(R), t3d


def rescale_pose_to_roi(t3d: jnp.ndarray, roi_box: jnp.ndarray) -> jnp.ndarray:
    """Translate/scale t3d (B,3) into original-image coordinates
    (reference utils/inference.py:146-157)."""
    sx, sy, ex, ey = (roi_box[:, i] for i in range(4))
    scale_x = (ex - sx) / STD_SIZE
    scale_y = (ey - sy) / STD_SIZE
    return jnp.stack([
        t3d[:, 0] * scale_x + sx,
        t3d[:, 1] * scale_y + sy,
        t3d[:, 2],
    ], axis=1)

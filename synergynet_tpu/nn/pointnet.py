"""Synergy MLPs: landmark refinement (forward) and landmark-to-3DMM (reverse).

The reference implements both as stacks of 1x1 Conv1d + BatchNorm1d over a
(B, C, 68) layout (backbone_nets/pointnet_backbone.py:7-105). A 1x1 conv over
points is a per-point dense layer, so the TPU-native formulation is (B, N, C)
with ``nn.Dense`` — each layer is one batched GEMM on the MXU, and BatchNorm
reduces over (batch, point) axes exactly like torch's BatchNorm1d.

Behavioral parity notes:
- ``MLPFor`` concatenates [64-d point features, 1024-d max-pooled global
  feature, 1280-d backbone feature, 40-d shape code, 10-d expression code]
  = 2418 channels per point (pointnet_backbone.py:49-58; the reference's
  in-channel comment says 2368 — quirk Q1 — the real number is 2418).
- Both nets apply BatchNorm + ReLU to their *output* layers as well
  (pointnet_backbone.py:63,99-101), so residuals/params are non-negative
  post-activation. Reproduced as-is.
- The caller adds the refinement as ``lmk + 0.05 * residual``
  (model_building.py:150).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn


def _dense_bn_relu(x, features, train, name, dtype=jnp.float32):
    x = nn.Dense(features, name=f"{name}_fc", dtype=dtype)(x)
    x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                     epsilon=1e-5, name=f"{name}_bn", dtype=dtype)(x)
    return nn.relu(x)


class PointEncoder(nn.Module):
    """Shared PointNet trunk: per-point 3->64->64 (point features), then
    64->128->1024 and a max-pool over points (global feature)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pts, train: bool = False):
        # pts: (B, N, 3)
        x = _dense_bn_relu(pts, 64, train, "enc1", self.dtype)
        x = _dense_bn_relu(x, 64, train, "enc2", self.dtype)
        point_feat = x                                    # (B, N, 64)
        x = _dense_bn_relu(x, 64, train, "enc3", self.dtype)
        x = _dense_bn_relu(x, 128, train, "enc4", self.dtype)
        x = _dense_bn_relu(x, 1024, train, "enc5", self.dtype)
        global_feat = jnp.max(x, axis=1)                  # (B, 1024)
        return point_feat, global_feat


class MLPFor(nn.Module):
    """Landmark-refinement net ("multi-attribute feature aggregation").

    (B, N, 3) landmarks + backbone feature + shape/exp codes -> (B, N, 3)
    non-negative residual. Reference pointnet_backbone.py:7-64.
    """

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, lmk, backbone_feat, shape_code, exp_code,
                 train: bool = False):
        n_pts = lmk.shape[1]
        point_feat, global_feat = PointEncoder(dtype=self.dtype)(lmk, train)

        def tile(v):  # (B, C) -> (B, N, C)
            return jnp.broadcast_to(v[:, None, :],
                                    (v.shape[0], n_pts, v.shape[1]))

        x = jnp.concatenate([
            point_feat, tile(global_feat), tile(backbone_feat),
            tile(shape_code), tile(exp_code),
        ], axis=-1)                                        # (B, N, 2418)
        x = _dense_bn_relu(x, 512, train, "dec1", self.dtype)
        x = _dense_bn_relu(x, 256, train, "dec2", self.dtype)
        x = _dense_bn_relu(x, 128, train, "dec3", self.dtype)
        x = _dense_bn_relu(x, 3, train, "dec4", self.dtype)
        return x                                           # (B, N, 3) >= 0


class MLPRev(nn.Module):
    """Reverse net: refined landmarks -> 62-d 3DMM parameters.

    Reference pointnet_backbone.py:67-105: PointNet trunk, global max-pool,
    three BN+ReLU'd heads (12 rot / 40 shape / 10 exp), concatenated.
    """

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, lmk, train: bool = False):
        _, global_feat = PointEncoder(dtype=self.dtype)(lmk, train)
        g = global_feat[:, None, :]                        # (B, 1, 1024)
        rot = _dense_bn_relu(g, 12, train, "head_rot", self.dtype)
        shp = _dense_bn_relu(g, 40, train, "head_shape", self.dtype)
        exp = _dense_bn_relu(g, 10, train, "head_exp", self.dtype)
        return jnp.concatenate([rot, shp, exp], axis=-1)[:, 0, :]  # (B, 62)

"""Shared 3DMM parameter head: three dropout+linear branches, concat 62-d.

Reference: backbone_nets/mobilenetv2_backbone.py:147-158,184-188 (12 pose /
40 shape / 10 expression branches with Dropout(0.2)). Shared across all
backbones here so every trunk meets the same ``(param62, feat)`` contract.
The optional 40-d texture branch mirrors the extra head some reference
backbones carry (resnet/ghostnet/mobilenetv1, e.g.
backbone_nets/resnet_backbone.py:181-184).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn


class ParamHead(nn.Module):
    dropout: float = 0.2
    num_pose: int = 12
    num_shape: int = 40
    num_exp: int = 10
    with_texture: bool = False
    num_texture: int = 40

    @nn.compact
    def __call__(self, feat: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        feat = feat.astype(jnp.float32)
        def branch(n, name):
            x = nn.Dropout(self.dropout, deterministic=not train,
                           name=f"drop_{name}")(feat)
            return nn.Dense(n, name=f"fc_{name}")(x)

        parts = [branch(self.num_pose, "pose"),
                 branch(self.num_shape, "shape"),
                 branch(self.num_exp, "exp")]
        if self.with_texture:
            parts.append(branch(self.num_texture, "texture"))
        return jnp.concatenate(parts, axis=1)

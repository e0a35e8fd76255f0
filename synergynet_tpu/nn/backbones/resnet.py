"""ResNet / ResNeXt / WideResNet backbones (He et al. 2016), flax / NHWC.

Capability parity with the reference's resnet trunk family
(reference backbone_nets/resnet_backbone.py:139-254: resnet18/34/50/101/152,
resnext50_32x4d/resnext101_32x8d, wide_resnet50_2/101_2). BasicBlock for
18/34, Bottleneck (with groups / width_per_group) otherwise; stride-2 7x7
stem + 3x3/2 max-pool; stage downsampling by 1x1/2 projection.

The reference family returns a 102-d tensor and no pooled feature (quirk
Q5); here the uniform ``(param62, feat)`` contract holds.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from synergynet_tpu.nn.heads import ParamHead


def _bn(train, dtype, scale_init=None):
    kw = {} if scale_init is None else {"scale_init": scale_init}
    return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                        epsilon=1e-5, dtype=dtype, **kw)


class BasicBlock(nn.Module):
    features: int
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        y = nn.Conv(self.features, (3, 3), strides=self.stride, padding=1,
                    use_bias=False, dtype=self.dtype)(x)
        y = nn.relu(_bn(train, self.dtype)(y))
        y = nn.Conv(self.features, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype)(y)
        y = _bn(train, self.dtype, nn.initializers.zeros)(y)
        if self.stride != 1 or x.shape[-1] != self.features:
            x = nn.Conv(self.features, (1, 1), strides=self.stride,
                        use_bias=False, dtype=self.dtype)(x)
            x = _bn(train, self.dtype)(x)
        return nn.relu(x + y)


class Bottleneck(nn.Module):
    features: int              # base planes; output = 4x
    stride: int = 1
    groups: int = 1
    width_per_group: int = 64
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        width = int(self.features * (self.width_per_group / 64.0)) * self.groups
        out_ch = self.features * 4
        y = nn.Conv(width, (1, 1), use_bias=False, dtype=self.dtype)(x)
        y = nn.relu(_bn(train, self.dtype)(y))
        y = nn.Conv(width, (3, 3), strides=self.stride, padding=1,
                    feature_group_count=self.groups, use_bias=False,
                    dtype=self.dtype)(y)
        y = nn.relu(_bn(train, self.dtype)(y))
        y = nn.Conv(out_ch, (1, 1), use_bias=False, dtype=self.dtype)(y)
        y = _bn(train, self.dtype, nn.initializers.zeros)(y)
        if self.stride != 1 or x.shape[-1] != out_ch:
            x = nn.Conv(out_ch, (1, 1), strides=self.stride, use_bias=False,
                        dtype=self.dtype)(x)
            x = _bn(train, self.dtype)(x)
        return nn.relu(x + y)


class ResNet(nn.Module):
    """Returns ``(param62, pooled_feat)``."""

    layers: Sequence[int] = (3, 4, 6, 3)
    block: str = "bottleneck"             # or "basic"
    groups: int = 1
    width_per_group: int = 64
    dropout: float = 0.2
    with_texture: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype)
        x = nn.Conv(64, (7, 7), strides=2, padding=3, use_bias=False,
                    dtype=self.dtype)(x)
        x = nn.relu(_bn(train, self.dtype)(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for stage, n in enumerate(self.layers):
            planes = 64 * (2 ** stage)
            for i in range(n):
                stride = 2 if (stage > 0 and i == 0) else 1
                if self.block == "basic":
                    x = BasicBlock(planes, stride, dtype=self.dtype)(x, train)
                else:
                    x = Bottleneck(planes, stride, self.groups,
                                   self.width_per_group,
                                   dtype=self.dtype)(x, train)
        feat = jnp.mean(x, axis=(1, 2)).astype(jnp.float32)
        param = ParamHead(dropout=self.dropout,
                          with_texture=self.with_texture)(feat, train)
        return param[:, :62] if self.with_texture else param, feat


RESNET_LAYERS = {
    "resnet18": ((2, 2, 2, 2), "basic", 1, 64),
    "resnet34": ((3, 4, 6, 3), "basic", 1, 64),
    "resnet50": ((3, 4, 6, 3), "bottleneck", 1, 64),
    "resnet101": ((3, 4, 23, 3), "bottleneck", 1, 64),
    "resnet152": ((3, 8, 36, 3), "bottleneck", 1, 64),
    "resnext50_32x4d": ((3, 4, 6, 3), "bottleneck", 32, 4),
    "resnext101_32x8d": ((3, 4, 23, 3), "bottleneck", 32, 8),
    "wide_resnet50_2": ((3, 4, 6, 3), "bottleneck", 1, 128),
    "wide_resnet101_2": ((3, 4, 23, 3), "bottleneck", 1, 128),
}


def make_resnet(name: str, **kwargs) -> ResNet:
    layers, block, groups, wpg = RESNET_LAYERS[name]
    return ResNet(layers=layers, block=block, groups=groups,
                  width_per_group=wpg, **kwargs)

"""ResNeSt backbone (Zhang et al. 2020) with split-attention convolutions.

Capability parity with the reference's resnest trunk
(reference backbone_nets/ResNeSt/resnet.py:29-324, splat.py:11-98,
resnest.py:33-71): deep 3x3 stem, average-pool downsampling (``avg_down``),
bottlenecks whose 3x3 conv is a ``SplAtConv2d`` — a radix-grouped conv whose
branches are fused by a learned per-channel softmax attention (rSoftMax).

This is the second reference backbone that genuinely satisfies the I2P
2-tuple contract (returns (62-d params, pooled feature), reference
resnet.py:310-324); the contract is uniform here.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from synergynet_tpu.nn.heads import ParamHead


def _bn(train, dtype):
    return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                        epsilon=1e-5, dtype=dtype)


class SplAtConv2d(nn.Module):
    """Split-attention conv: grouped conv into ``radix`` branches, global
    pooled gap -> two 1x1 convs -> radix-softmax attention, weighted sum
    (reference ResNeSt/splat.py:11-98)."""

    features: int
    kernel: int = 3
    stride: int = 1
    groups: int = 1
    radix: int = 2
    reduction_factor: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        r, c = self.radix, self.features
        inter = max(x.shape[-1] * r // self.reduction_factor, 32)
        y = nn.Conv(c * r, (self.kernel, self.kernel), strides=self.stride,
                    padding=(self.kernel - 1) // 2,
                    feature_group_count=self.groups * r, use_bias=False,
                    dtype=self.dtype)(x)
        y = nn.relu(_bn(train, self.dtype)(y))
        b, h, w, _ = y.shape
        split = y.reshape(b, h, w, r, c)                 # radix branches
        gap = jnp.sum(split, axis=3).mean(axis=(1, 2))    # (B, C)
        # fc1/fc2 are cardinality-grouped 1x1 convs in the reference
        # (splat.py:40-43).
        gap = nn.relu(_bn(train, self.dtype)(
            nn.Conv(inter, (1, 1), feature_group_count=self.groups,
                    dtype=self.dtype)(gap[:, None, None, :])))  # (B,1,1,inter)
        atten = nn.Conv(c * r, (1, 1), feature_group_count=self.groups,
                        dtype=self.dtype)(gap)            # (B,1,1,C*r)
        # rSoftMax (splat.py:76-88): softmax over radix when r > 1 under the
        # (cardinality, radix, c/cardinality) channel layout of the grouped
        # fc2; sigmoid otherwise.
        if r > 1:
            atten = atten.reshape(b, self.groups, r, c // self.groups)
            atten = jax.nn.softmax(atten, axis=2)
            atten = jnp.transpose(atten, (0, 2, 1, 3)).reshape(b, r, c)
            out = jnp.sum(split * atten[:, None, None, :, :], axis=3)
        else:
            out = y * nn.sigmoid(atten.reshape(b, c))[:, None, None, :]
        return out


class ResNeStBottleneck(nn.Module):
    features: int              # base planes; output = 4x
    stride: int = 1
    radix: int = 2
    groups: int = 1
    bottleneck_width: int = 64
    avd: bool = True
    avd_first: bool = False
    is_first: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        width = int(self.features * (self.bottleneck_width / 64.0)) * self.groups
        out_ch = self.features * 4
        avd = self.avd and (self.stride > 1 or self.is_first)

        def avd_pool(z):
            # Reference avd_layer = nn.AvgPool2d(3, stride, padding=1) with
            # torch's default count_include_pad=True (resnet.py:49).
            return nn.avg_pool(z, (3, 3),
                               strides=(self.stride, self.stride),
                               padding=((1, 1), (1, 1)),
                               count_include_pad=True)

        y = nn.Conv(width, (1, 1), use_bias=False, dtype=self.dtype)(x)
        y = nn.relu(_bn(train, self.dtype)(y))
        if avd and self.avd_first:
            y = avd_pool(y)       # _fast ablation (reference ablation.py)
        y = SplAtConv2d(width, stride=1 if avd else self.stride,
                        groups=self.groups, radix=self.radix,
                        dtype=self.dtype)(y, train)
        if avd and not self.avd_first:
            y = avd_pool(y)
        y = nn.Conv(out_ch, (1, 1), use_bias=False, dtype=self.dtype)(y)
        y = _bn(train, self.dtype)(y)

        if self.stride != 1 or x.shape[-1] != out_ch:
            # avg_down shortcut (reference resnet.py:173-184); the reference
            # pools with ceil_mode=True, emulated by right/bottom padding
            # excluded from the average.
            if self.stride != 1:
                s = self.stride
                pad_h = (-(x.shape[1] - s)) % s
                pad_w = (-(x.shape[2] - s)) % s
                x = nn.avg_pool(x, (s, s), strides=(s, s),
                                padding=((0, pad_h), (0, pad_w)),
                                count_include_pad=False)
            x = nn.Conv(out_ch, (1, 1), use_bias=False, dtype=self.dtype)(x)
            x = _bn(train, self.dtype)(x)
        return nn.relu(x + y)


class ResNeSt(nn.Module):
    """Returns ``(param62, pooled_feat_2048)``."""

    layers: Sequence[int] = (3, 4, 6, 3)      # resnest50
    radix: int = 2
    groups: int = 1
    bottleneck_width: int = 64
    stem_width: int = 32
    avd_first: bool = False
    dropout: float = 0.2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype)
        # deep stem: 3x3/2 -> 3x3 -> 3x3 (reference resnet.py:201-213)
        for i, (c, s) in enumerate(((self.stem_width, 2),
                                    (self.stem_width, 1),
                                    (self.stem_width * 2, 1))):
            x = nn.Conv(c, (3, 3), strides=s, padding=1, use_bias=False,
                        dtype=self.dtype)(x)
            x = nn.relu(_bn(train, self.dtype)(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for stage, n in enumerate(self.layers):
            planes = 64 * (2 ** stage)
            for i in range(n):
                stride = 2 if (stage > 0 and i == 0) else 1
                # is_first stays False everywhere: the reference builds
                # layer1 with is_first=False (resnet.py:197) and blocks past
                # the first of a layer default to False, so avd is active
                # exactly when stride > 1.
                x = ResNeStBottleneck(
                    planes, stride, self.radix, self.groups,
                    self.bottleneck_width, avd_first=self.avd_first,
                    is_first=False, dtype=self.dtype)(x, train)
        feat = jnp.mean(x, axis=(1, 2)).astype(jnp.float32)   # (B, 2048)
        param = ParamHead(dropout=self.dropout)(feat, train)
        return param, feat


RESNEST_LAYERS = {
    "resnest50": ((3, 4, 6, 3), 32),
    "resnest101": ((3, 4, 23, 3), 64),
    "resnest200": ((3, 24, 36, 3), 64),
    "resnest269": ((3, 30, 48, 8), 64),
}

# _fast ablations (reference ResNeSt/ablation.py:38-106): (radix, groups,
# bottleneck_width, avd_first) with the resnest50 layer schedule.
RESNEST_FAST_VARIANTS = {
    "resnest50_fast_1s1x64d": (1, 1, 64, True),
    "resnest50_fast_2s1x64d": (2, 1, 64, True),
    "resnest50_fast_4s1x64d": (4, 1, 64, True),
    "resnest50_fast_1s2x40d": (1, 2, 40, True),
    "resnest50_fast_2s2x40d": (2, 2, 40, True),
    "resnest50_fast_1s4x24d": (1, 4, 24, True),
}


def make_resnest(name: str, **kwargs) -> ResNeSt:
    if name in RESNEST_FAST_VARIANTS:
        radix, groups, bw, avd_first = RESNEST_FAST_VARIANTS[name]
        return ResNeSt(layers=(3, 4, 6, 3), stem_width=32, radix=radix,
                       groups=groups, bottleneck_width=bw,
                       avd_first=avd_first, **kwargs)
    layers, stem = RESNEST_LAYERS[name]
    return ResNeSt(layers=layers, stem_width=stem, **kwargs)

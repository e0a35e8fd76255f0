"""GhostNet backbone (Han et al. 2020), TPU-native flax / NHWC.

Capability parity with the reference's ghostnet trunk
(reference backbone_nets/ghostnet_backbone.py:76-266): GhostModule (a
primary conv generates half the channels, a cheap depthwise conv "ghosts"
the rest), GhostBottleneck with optional SE (hard-sigmoid gate) and
depthwise stride, the standard width-1.0 stage table, 960-ch final conv and
a 1280-ch head conv before pooling.

The reference's ghostnet returns a single 102-d tensor (62 + 40 texture)
and no pooled feature, which breaks the I2P contract (SURVEY.md quirk Q5);
here it meets the uniform ``(param62, feat)`` contract through the shared
:class:`~synergynet_tpu.nn.heads.ParamHead` (texture branch optional).
"""

from __future__ import annotations

import math
from typing import Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from synergynet_tpu.nn.heads import ParamHead

# (kernel, expansion, out_channels, se_ratio, stride) — standard GhostNet
# width-1.0 schedule.
GHOSTNET_CFG: Tuple[Tuple[int, int, int, float, int], ...] = (
    (3, 16, 16, 0.0, 1),
    (3, 48, 24, 0.0, 2),
    (3, 72, 24, 0.0, 1),
    (5, 72, 40, 0.25, 2),
    (5, 120, 40, 0.25, 1),
    (3, 240, 80, 0.0, 2),
    (3, 200, 80, 0.0, 1),
    (3, 184, 80, 0.0, 1),
    (3, 184, 80, 0.0, 1),
    (3, 480, 112, 0.25, 1),
    (3, 672, 112, 0.25, 1),
    (5, 672, 160, 0.25, 2),
    (5, 960, 160, 0.0, 1),
    (5, 960, 160, 0.25, 1),
    (5, 960, 160, 0.0, 1),
    (5, 960, 160, 0.25, 1),
)


def make_divisible(v, divisor=4, min_value=None):
    if min_value is None:
        min_value = divisor
    new_v = max(min_value, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


def hard_sigmoid(x):
    return jnp.clip(x / 6.0 + 0.5, 0.0, 1.0)


def _bn(train, dtype, name=None):
    return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                        epsilon=1e-5, dtype=dtype, name=name)


class SqueezeExcite(nn.Module):
    se_ratio: float = 0.25
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        reduced = make_divisible(c * self.se_ratio)
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.relu(nn.Conv(reduced, (1, 1), dtype=self.dtype)(s))
        s = nn.Conv(c, (1, 1), dtype=self.dtype)(s)
        return x * hard_sigmoid(s)


class GhostModule(nn.Module):
    features: int
    kernel: int = 1
    ratio: int = 2
    dw_size: int = 3
    stride: int = 1
    relu: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        init_ch = math.ceil(self.features / self.ratio)
        y = nn.Conv(init_ch, (self.kernel, self.kernel), strides=self.stride,
                    padding=self.kernel // 2, use_bias=False,
                    dtype=self.dtype)(x)
        y = _bn(train, self.dtype)(y)
        if self.relu:
            y = nn.relu(y)
        cheap = nn.Conv(init_ch * (self.ratio - 1),
                        (self.dw_size, self.dw_size),
                        padding=self.dw_size // 2, feature_group_count=init_ch,
                        use_bias=False, dtype=self.dtype)(y)
        cheap = _bn(train, self.dtype)(cheap)
        if self.relu:
            cheap = nn.relu(cheap)
        return jnp.concatenate([y, cheap], axis=-1)[..., :self.features]


class GhostBottleneck(nn.Module):
    mid: int
    out: int
    dw_kernel: int = 3
    stride: int = 1
    se_ratio: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        inp = x.shape[-1]
        y = GhostModule(self.mid, relu=True, dtype=self.dtype)(x, train)
        if self.stride > 1:
            y = nn.Conv(self.mid, (self.dw_kernel, self.dw_kernel),
                        strides=self.stride,
                        padding=(self.dw_kernel - 1) // 2,
                        feature_group_count=self.mid, use_bias=False,
                        dtype=self.dtype)(y)
            y = _bn(train, self.dtype)(y)
        if self.se_ratio > 0:
            y = SqueezeExcite(self.se_ratio, dtype=self.dtype)(y)
        y = GhostModule(self.out, relu=False, dtype=self.dtype)(y, train)

        if inp == self.out and self.stride == 1:
            short = x
        else:
            short = nn.Conv(inp, (self.dw_kernel, self.dw_kernel),
                            strides=self.stride,
                            padding=(self.dw_kernel - 1) // 2,
                            feature_group_count=inp, use_bias=False,
                            dtype=self.dtype)(x)
            short = _bn(train, self.dtype)(short)
            short = nn.Conv(self.out, (1, 1), use_bias=False,
                            dtype=self.dtype)(short)
            short = _bn(train, self.dtype)(short)
        return y + short


class GhostNet(nn.Module):
    """Returns ``(param62, pooled_feat_1280)``."""

    cfg: Sequence = GHOSTNET_CFG
    width: float = 1.0
    dropout: float = 0.2
    with_texture: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype)
        stem = make_divisible(16 * self.width)
        x = nn.Conv(stem, (3, 3), strides=2, padding=1, use_bias=False,
                    dtype=self.dtype)(x)
        x = nn.relu(_bn(train, self.dtype)(x))
        for k, exp, c, se, s in self.cfg:
            x = GhostBottleneck(
                mid=make_divisible(exp * self.width),
                out=make_divisible(c * self.width),
                dw_kernel=k, stride=s, se_ratio=se,
                dtype=self.dtype)(x, train)
        final = make_divisible(exp * self.width)       # 960 at width 1.0
        x = nn.Conv(final, (1, 1), use_bias=False, dtype=self.dtype)(x)
        x = nn.relu(_bn(train, self.dtype)(x))
        x = jnp.mean(x, axis=(1, 2), keepdims=True)    # (B, 1, 1, 960)
        x = nn.Conv(1280, (1, 1), use_bias=True, dtype=self.dtype)(x)
        feat = nn.relu(x)[:, 0, 0, :].astype(jnp.float32)   # (B, 1280)
        param = ParamHead(dropout=self.dropout,
                          with_texture=self.with_texture)(feat, train)
        return param[:, :62] if self.with_texture else param, feat

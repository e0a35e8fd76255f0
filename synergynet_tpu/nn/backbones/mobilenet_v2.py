"""MobileNetV2 backbone with the 12/40/10 3DMM parameter head.

TPU-native re-design of the reference's primary (and only shipped) backbone
(reference: backbone_nets/mobilenetv2_backbone.py:77-208): standard
MobileNetV2 (Sandler et al. 2018) trunk, global average pool, three dropout +
linear heads for pose (12), shape (40) and expression (10), concatenated to a
62-d parameter vector; also returns the 1280-d pooled feature consumed by the
landmark-refinement MLP.

TPU choices:
- NHWC layout (XLA's native conv layout on TPU; the reference is NCHW).
- Configurable compute dtype — bf16 keeps the conv stack on the MXU at full
  rate; params and batch-norm statistics stay fp32.
- ReLU6 / BN / conv stay as stock XLA ops: XLA fuses BN+ReLU6 into the conv
  epilogues, so no hand-written kernel is warranted here.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from synergynet_tpu.nn.heads import ParamHead

# (expand_ratio t, out_channels c, repeats n, stride s) — the canonical
# MobileNetV2 schedule.
_DEFAULT_SETTING: Tuple[Tuple[int, int, int, int], ...] = (
    (1, 16, 1, 1),
    (6, 24, 2, 2),
    (6, 32, 3, 2),
    (6, 64, 4, 2),
    (6, 96, 3, 1),
    (6, 160, 3, 2),
    (6, 320, 1, 1),
)


def make_divisible(v: float, divisor: int = 8, min_value: int | None = None) -> int:
    """Round channel counts to a multiple of ``divisor`` (never below 90%)."""
    if min_value is None:
        min_value = divisor
    new_v = max(min_value, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


class ConvBNReLU6(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    groups: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        pad = (self.kernel - 1) // 2
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=self.stride, padding=pad,
                    feature_group_count=self.groups, use_bias=False,
                    dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype)(x)
        return jnp.minimum(nn.relu(x), jnp.asarray(6.0, x.dtype))


class InvertedResidual(nn.Module):
    features: int
    stride: int
    expand_ratio: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        inp = x.shape[-1]
        hidden = int(round(inp * self.expand_ratio))
        use_res = self.stride == 1 and inp == self.features

        y = x
        if self.expand_ratio != 1:
            y = ConvBNReLU6(hidden, kernel=1, dtype=self.dtype)(y, train)
        y = ConvBNReLU6(hidden, kernel=3, stride=self.stride, groups=hidden,
                        dtype=self.dtype)(y, train)
        y = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype)(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype)(y)
        return x + y if use_res else y


class MobileNetV2(nn.Module):
    """Returns ``(param62, pooled_feature)`` — the uniform backbone contract.

    All backbones in this framework return this 2-tuple (the reference only
    does so for mobilenet_v2/resnest — quirk Q5 in SURVEY.md — breaking the
    other backbones; here the contract is uniform by construction).
    """

    width_mult: float = 1.0
    setting: Sequence[Tuple[int, int, int, int]] = _DEFAULT_SETTING
    dropout: float = 0.2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        input_channel = make_divisible(32 * self.width_mult)
        last_channel = make_divisible(1280 * max(1.0, self.width_mult))

        x = x.astype(self.dtype)
        x = ConvBNReLU6(input_channel, stride=2, dtype=self.dtype)(x, train)
        for t, c, n, s in self.setting:
            out_c = make_divisible(c * self.width_mult)
            for i in range(n):
                x = InvertedResidual(out_c, s if i == 0 else 1, t,
                                     dtype=self.dtype)(x, train)
        x = ConvBNReLU6(last_channel, kernel=1, dtype=self.dtype)(x, train)

        pool = jnp.mean(x, axis=(1, 2)).astype(jnp.float32)   # (B, 1280)
        param = ParamHead(dropout=self.dropout)(pool, train)   # (B, 62)
        return param, pool

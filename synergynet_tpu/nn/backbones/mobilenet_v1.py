"""MobileNetV1 backbone (Howard et al. 2017), flax / NHWC.

Capability parity with the reference's mobilenet trunk
(reference backbone_nets/mobilenetv1_backbone.py:47-140): the standard
depthwise-separable stack (conv/2, then dw/sep pairs to 1024 channels) with
a ``widen_factor`` in {0.25, 0.5, 0.75, 1.0, 1.5, 2.0}.

The reference variant returns one 102-d tensor and no pooled feature
(quirk Q5, unusable under I2P); here the uniform ``(param62, feat)``
contract holds via the shared ParamHead.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from synergynet_tpu.nn.heads import ParamHead

# (out_channels, stride) of each depthwise-separable pair at width 1.0.
_DS_SCHEDULE = ((64, 1), (128, 2), (128, 1), (256, 2), (256, 1), (512, 2),
                (512, 1), (512, 1), (512, 1), (512, 1), (512, 1), (1024, 2),
                (1024, 1))


class _ConvBN(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    groups: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=self.stride, padding=(self.kernel - 1) // 2,
                    feature_group_count=self.groups, use_bias=False,
                    dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype)(x)
        return nn.relu(x)


class MobileNetV1(nn.Module):
    """Returns ``(param62, pooled_feat)``."""

    widen_factor: float = 1.0
    dropout: float = 0.2
    with_texture: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        w = self.widen_factor
        ch = lambda c: max(8, int(c * w))
        x = x.astype(self.dtype)
        x = _ConvBN(ch(32), stride=2, dtype=self.dtype)(x, train)
        for c, s in _DS_SCHEDULE:
            inp = x.shape[-1]
            x = _ConvBN(inp, kernel=3, stride=s, groups=inp,
                        dtype=self.dtype)(x, train)           # depthwise
            x = _ConvBN(ch(c), kernel=1, dtype=self.dtype)(x, train)
        feat = jnp.mean(x, axis=(1, 2)).astype(jnp.float32)
        param = ParamHead(dropout=self.dropout,
                          with_texture=self.with_texture)(feat, train)
        return param[:, :62] if self.with_texture else param, feat

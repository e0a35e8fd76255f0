"""Backbone registry. Every backbone returns ``(param62, pooled_feat)``.

The reference dispatches on substrings of ``args.arch``
(model_building.py:40-51) and only mobilenet_v2/resnest actually satisfy
the 2-tuple contract (SURVEY.md quirk Q5 — mobilenet_v1/resnet/ghostnet
return a bare 102-d tensor and crash under I2P); here registration implies
conformance, and the texture head those variants carried is an option on
the shared ParamHead.
"""

from __future__ import annotations

from typing import Callable, Dict

from flax import linen as nn

from synergynet_tpu.nn.backbones.mobilenet_v2 import MobileNetV2  # noqa: F401
from synergynet_tpu.nn.backbones.mobilenet_v1 import MobileNetV1  # noqa: F401
from synergynet_tpu.nn.backbones.ghostnet import GhostNet  # noqa: F401
from synergynet_tpu.nn.backbones.resnet import (  # noqa: F401
    ResNet, RESNET_LAYERS, make_resnet,
)
from synergynet_tpu.nn.backbones.resnest import (  # noqa: F401
    ResNeSt, RESNEST_LAYERS, RESNEST_FAST_VARIANTS, make_resnest,
)

_REGISTRY: Dict[str, Callable[..., nn.Module]] = {}


def register_backbone(name: str, factory: Callable[..., nn.Module]) -> None:
    _REGISTRY[name] = factory


def make_backbone(arch: str, **kwargs) -> nn.Module:
    if arch not in _REGISTRY:
        raise ValueError(
            f"unknown backbone '{arch}'; available: {sorted(_REGISTRY)}")
    return _REGISTRY[arch](**kwargs)


def available_backbones():
    return sorted(_REGISTRY)


register_backbone("mobilenet_v2", MobileNetV2)
register_backbone("mobilenet_v2_0.5",
                  lambda **kw: MobileNetV2(width_mult=0.5, **kw))
register_backbone("mobilenet_v2_1.4",
                  lambda **kw: MobileNetV2(width_mult=1.4, **kw))

# MobileNetV1 widen factors (reference mobilenetv1_backbone.py factories).
register_backbone("mobilenet_1", MobileNetV1)
for _w in (0.25, 0.5, 0.75, 1.5, 2.0):
    register_backbone(f"mobilenet_1_{_w}",
                      lambda _w=_w, **kw: MobileNetV1(widen_factor=_w, **kw))

register_backbone("ghostnet", GhostNet)

for _name in RESNET_LAYERS:
    register_backbone(_name, lambda _n=_name, **kw: make_resnet(_n, **kw))

for _name in RESNEST_LAYERS:
    register_backbone(_name, lambda _n=_name, **kw: make_resnest(_n, **kw))

for _name in RESNEST_FAST_VARIANTS:
    register_backbone(_name, lambda _n=_name, **kw: make_resnest(_n, **kw))

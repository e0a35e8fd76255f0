"""Backbone registry. Every backbone returns ``(param62, pooled_feat)``.

The reference dispatches on substrings of ``args.arch``
(model_building.py:40-51) and only mobilenet_v2/resnest actually satisfy the
2-tuple contract (SURVEY.md quirk Q5); here registration implies conformance.
"""

from __future__ import annotations

from typing import Callable, Dict

from flax import linen as nn

from synergynet_tpu.nn.backbones.mobilenet_v2 import MobileNetV2  # noqa: F401

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

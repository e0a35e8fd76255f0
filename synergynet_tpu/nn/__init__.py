"""Neural network modules: backbones, synergy MLPs, SynergyNet."""

from synergynet_tpu.nn.synergy import (  # noqa: F401
    SynergyNet, synergy_criterion, init_synergy_variables, LOSS_WEIGHTS, REFINE_SCALE,
)
from synergynet_tpu.nn.backbones import (  # noqa: F401
    make_backbone, register_backbone, available_backbones,
)
from synergynet_tpu.nn.pointnet import MLPFor, MLPRev, PointEncoder  # noqa: F401
from synergynet_tpu.nn.heads import ParamHead  # noqa: F401

"""SynergyNet-TPU: a TPU-native 3D facial geometry framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of SynergyNet
(3DV 2021, reference implementation choyingw/SynergyNet): single-image 3DMM
parameter regression, 68-landmark and 53,215-vertex dense mesh decode, head
pose estimation, FaceBoxes face detection, z-buffer mesh rendering, 300W-LP
training and AFLW2000-3D evaluation.

Everything on the compute path is jit-compiled and batch-vectorized; scaling
is expressed with `jax.sharding` over a device mesh rather than replicated
module state.
"""

__version__ = "0.1.0"

from synergynet_tpu.mm3d import (  # noqa: F401
    ParamPack,
    load_param_pack,
    decode_param62,
    decode_landmarks,
    decode_dense,
    pose_from_param,
)

# Packaged inference API (the synergy3DMM equivalent) at top level.
from synergynet_tpu.pipeline.api import SynergyNet3DMM  # noqa: F401

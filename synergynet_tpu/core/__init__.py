"""Core runtime: config, device mesh/sharding, checkpointing."""

from synergynet_tpu.core.mesh import (  # noqa: F401
    DATA_AXIS, MODEL_AXIS, make_mesh, batch_sharding, replicated,
    vertex_sharding, shard_batch, replicate,
)

"""Core runtime: config, device mesh/sharding, checkpointing."""

from synergynet_tpu.core.mesh import (  # noqa: F401
    DATA_AXIS, MODEL_AXIS, make_mesh, batch_sharding, replicated,
    vertex_sharding, shard_batch, replicate,
)
from synergynet_tpu.core.config import (  # noqa: F401
    Config, ModelConfig, TrainConfig, DataConfig, EvalConfig, DetectConfig,
    RenderConfig,
)
from synergynet_tpu.core.checkpoint import (  # noqa: F401
    save_checkpoint, restore_checkpoint, checkpoint_metadata,
    load_trained_variables, load_shipped_trained, shipped_trained_path,
)
from synergynet_tpu.core.profiling import (  # noqa: F401
    trace, annotate, StageTimer, measure, device_memory_stats,
)
from synergynet_tpu.core.profiling import enable_compile_cache  # noqa: F401

"""Device mesh and sharding helpers.

The reference's entire parallelism story is single-host ``nn.DataParallel``
(reference main_train.py:176): replicate module + scatter batch + gather. The
TPU-native equivalent is SPMD: one jitted program over a
``jax.sharding.Mesh``, with the batch axis sharded over ``data``, parameters
replicated, and gradients all-reduced by XLA-inserted ``psum`` over ICI. A
second ``model`` axis is available for sharding the long vertex dimension of
the dense 3DMM basis (the analogue of tensor/sequence parallelism for this
workload); multi-host extends the same mesh over DCN via
``jax.distributed.initialize`` with no code change here.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build a (data, model) mesh. Defaults to all devices on the data axis."""
    if devices is None:
        devices = jax.devices()
    n_total = len(devices)
    if n_data is None:
        if n_total % n_model:
            raise ValueError(f"{n_total} devices not divisible by n_model={n_model}")
        n_data = n_total // n_model
    if n_data * n_model > n_total:
        raise ValueError(
            f"mesh {n_data}x{n_model} needs more than {n_total} devices")
    grid = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def vertex_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the long vertex axis (rows of the 159645-row BFM basis) over the
    model axis — tensor-parallel dense decode."""
    return NamedSharding(mesh, P(MODEL_AXIS))


def shard_batch(mesh: Mesh, tree: Any) -> Any:
    """Device-put a host batch with the leading axis sharded over data.

    Multi-process jobs hand each process its own local rows (from the
    process-sharded loader); the global array is assembled across hosts
    without any data movement beyond the local device transfer.
    """
    sh = batch_sharding(mesh)
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                sh, np.asarray(x)), tree)
    return jax.device_put(tree, sh)


def replicate(mesh: Mesh, tree: Any) -> Any:
    return jax.device_put(tree, replicated(mesh))

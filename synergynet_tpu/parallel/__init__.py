"""SPMD parallelism APIs: mesh construction, shardings, TP dense decode.

The reference's parallelism is single-host ``nn.DataParallel`` replication
(reference main_train.py:176). Here everything is SPMD over a
``jax.sharding.Mesh``:

- data parallel: batch axis sharded over ``data``; gradient psum inserted
  by XLA (see :func:`synergynet_tpu.train.jit_train_step`);
- tensor parallel: the 53k-vertex dense-decode basis sharded over
  ``model`` (:func:`tp_dense_decode`) — the direct analogue of sequence/
  tensor parallelism for this workload's long axis;
- multi-host: the same mesh extends over DCN via
  :func:`init_distributed`.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from synergynet_tpu.core.mesh import (  # noqa: F401
    DATA_AXIS, MODEL_AXIS, make_mesh, batch_sharding, replicated,
    vertex_sharding, shard_batch, replicate,
)
from synergynet_tpu.mm3d.assets import ParamPack


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Join a multi-host SPMD job (``jax.distributed.initialize``); a no-op
    for single-process runs.

    Multi-process CPU jobs (tests, CPU pods) need gloo collectives — the
    default CPU collectives cannot cross process boundaries — so it is
    enabled whenever a real multi-process job is requested; TPU backends
    ignore the CPU-collectives setting.
    """
    if num_processes in (None, 1):
        return
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def warm_mesh_cliques(mesh) -> None:
    """Serially create one cross-process collective context per model
    column of the mesh.

    Creating two cross-process gloo contexts concurrently (e.g. the
    gradient psum over two model columns of a (data, model) mesh)
    deadlocks under gVisor's network stack; warming each column clique
    one at a time pre-populates the backend's per-clique context cache so
    subsequent multi-column programs find every context ready. No-op for
    single-process jobs.
    """
    if jax.process_count() == 1:
        return
    import numpy as np
    from jax.sharding import Mesh

    nproc = jax.process_count()
    for col in range(mesh.devices.shape[1]):
        sub = Mesh(mesh.devices[:, col:col + 1], mesh.axis_names)
        ones = jax.make_array_from_process_local_data(
            NamedSharding(sub, P(DATA_AXIS)),
            np.ones((mesh.devices.shape[0] // nproc,), np.float32))
        warm = jax.jit(lambda x: x.sum(),
                       out_shardings=NamedSharding(sub, P()))(ones)
        assert float(warm) == mesh.devices.shape[0]


def tp_dense_decode(mesh, pack: ParamPack) -> Callable:
    """Tensor-parallel dense decode over a (data, model) mesh.

    Returns ``decode(params (B, 62)) -> (B, 3, Nshard-per-device...)`` as a
    jitted program where:
    - params are sharded over ``data`` (each data row group decodes its own
      faces),
    - the coordinate-separated basis is sharded over ``model`` on the vertex
      axis, so each model-group chip holds 1/TP of the 53k-vertex basis and
      computes only its vertex slab,
    - the returned dense vertices stay vertex-sharded (the natural layout
      for a downstream sharded renderer); the companion checksum output is
      reduced across the model axis, which makes XLA insert the cross-chip
      collective.
    """
    from synergynet_tpu.ops.fused_decode import build_decode_basis
    from synergynet_tpu.mm3d.codec import dewhiten
    from synergynet_tpu.mm3d.assets import STD_SIZE

    basis = build_decode_basis(pack)
    w = jax.device_put(basis.w, NamedSharding(mesh, P(None, MODEL_AXIS)))
    u = jax.device_put(basis.u, NamedSharding(mesh, P(None, MODEL_AXIS)))

    def decode(params, w, u):
        raw = dewhiten(params, pack)
        alpha = raw[:, 12:62]                           # (B, 50)
        p12 = raw[:, :12].reshape(-1, 3, 4)
        rot = p12[:, :, :3]                             # (B, 3, 3)
        off = p12[:, :, 3]                              # (B, 3)
        xyz = jnp.einsum("bk,cnk->bcn", alpha, w) + u[None]   # (B, 3, Npad)
        out = jnp.einsum("brc,bcn->brn", rot, xyz) + off[:, :, None]
        out = out.at[:, 1, :].set(STD_SIZE + 1 - out[:, 1, :])
        # Cross-shard reduction -> psum over the model axis.
        checksum = jnp.sum(out, axis=2)                 # (B, 3)
        return out, checksum

    return jax.jit(
        lambda params: decode(params, w, u),
        in_shardings=NamedSharding(mesh, P(DATA_AXIS)),
        out_shardings=(NamedSharding(mesh, P(DATA_AXIS, None, MODEL_AXIS)),
                       NamedSharding(mesh, P(DATA_AXIS))),
    )


def shard_fused_engine(engine, mesh) -> Callable:
    """Data-parallel multi-frame serving: the FusedFrameEngine's batched
    program with the frame axis sharded over the mesh's ``data`` axis —
    each chip detects/regresses its own frames; no collectives needed.

    Returns ``run(frames (B, H, W, 3) f32, frames_s2d, true_hws)`` with B
    divisible by the data-axis size.
    """
    from synergynet_tpu.pipeline.api import _fused_batch_program

    program = _fused_batch_program(engine)
    bsh = NamedSharding(mesh, P(DATA_AXIS))

    def run(frames, frames_s2d, true_hws):
        frames = jax.device_put(frames, bsh)
        frames_s2d = jax.device_put(frames_s2d, bsh)
        true_hws = jax.device_put(true_hws, bsh)
        return program(engine.api.variables, engine.detector.variables,
                       *engine.pack_args, frames, frames_s2d, true_hws)

    return run

"""Multi-host SPMD worker (run as a subprocess by tests/test_multihost.py).

The reference has no multi-host story at all (its parallelism is one
``nn.DataParallel`` call, reference main_train.py:176). This worker proves
the TPU-native stack's multi-host path end to end on real separate
processes: ``init_distributed`` joins N processes into one JAX job (gloo
CPU collectives stand in for DCN), the (data, model) mesh spans both
processes, and

1. one ``jit_train_step`` executes with the batch sharded across
   processes — the gradient psum crosses the process boundary;
2. ``tp_dense_decode`` runs with the vertex axis model-sharded;
3. ``PrefetchLoader``'s process sharding is checked to cover the dataset
   disjointly across ranks.

Usage: mh_worker.py <process_id> <num_processes> <coordinator_port>
(each process must set XLA_FLAGS=--xla_force_host_platform_device_count=4).
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

PID = int(sys.argv[1])
NPROC = int(sys.argv[2])
PORT = sys.argv[3]

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")

# Own cache dir (CLAUDE.md hazard), fingerprinted like every other cache.
from synergynet_tpu.core.profiling import enable_compile_cache  # noqa: E402

enable_compile_cache("/tmp/synergy_mh_cache", min_compile_secs=5.0)

from synergynet_tpu.parallel import init_distributed  # noqa: E402

init_distributed(coordinator_address=f"127.0.0.1:{PORT}",
                 num_processes=NPROC, process_id=PID)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
import optax  # noqa: E402
from jax.experimental import multihost_utils  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from synergynet_tpu.core import make_mesh, replicated  # noqa: E402
from synergynet_tpu.data.datasets import ArrayDataset  # noqa: E402
from synergynet_tpu.data.loader import PrefetchLoader  # noqa: E402
from synergynet_tpu.mm3d.assets import pack_from_arrays  # noqa: E402
from synergynet_tpu.mm3d.codec import decode_dense  # noqa: E402
from synergynet_tpu.nn import SynergyNet  # noqa: E402
from synergynet_tpu.parallel import tp_dense_decode  # noqa: E402
from synergynet_tpu.train.step import (create_train_state,  # noqa: E402
                                       jit_train_step)

assert jax.process_count() == NPROC, jax.process_count()
assert jax.device_count() == 4 * NPROC, jax.device_count()
print(f"[{PID}] joined: {jax.process_count()} processes, "
      f"{jax.device_count()} global devices", flush=True)


def small_pack():
    """Same 97-vertex pack recipe as tests/conftest.py::small_pack."""
    rng = np.random.default_rng(7)
    nver, ntri, n_lmk = 97, 160, 12
    d = {
        "u_shp": rng.normal(60, 20, (nver * 3, 1)).astype(np.float32),
        "u_exp": rng.normal(0, 1, (nver * 3, 1)).astype(np.float32),
        "w_shp": rng.normal(0, 5, (nver * 3, 40)).astype(np.float32),
        "w_exp": rng.normal(0, 2, (nver * 3, 10)).astype(np.float32),
        "param_mean": rng.normal(0, 0.2, 62).astype(np.float32),
        "param_std": rng.uniform(0.5, 2.0, 62).astype(np.float32),
        "tri": rng.integers(0, nver, (3, ntri)).astype(np.int32),
    }
    kp = rng.choice(nver, n_lmk, replace=False).astype(np.int64)
    d["keypoints"] = np.stack([kp * 3, kp * 3 + 1, kp * 3 + 2],
                              1).reshape(-1).astype(np.int32)
    return pack_from_arrays(d)


pack = small_pack()
mesh = make_mesh(n_model=2)  # (NPROC*2) x 2 — data axis spans processes

# --- 1. loader process sharding covers the dataset disjointly ------------
N = 32
ds = ArrayDataset(
    np.arange(N, dtype=np.float32)[:, None],    # "image" = its own index
    np.zeros((N, 62), np.float32))
loader = PrefetchLoader(ds, batch_size=4, shuffle=False, num_workers=1,
                        process_index=jax.process_index(),
                        process_count=jax.process_count())
local_ids = np.sort(np.concatenate(
    [np.asarray(imgs)[:, 0] for imgs, _ in loader]).astype(np.int64))
all_ids = multihost_utils.process_allgather(local_ids)
if PID == 0:
    flat = np.sort(all_ids.reshape(-1))
    assert np.array_equal(flat, np.arange(N)), flat
    print(f"[{PID}] loader shards disjointly cover {N} samples", flush=True)

# --- 2. a sharded train step whose gradient psum crosses processes -------
# Concurrent cross-process gloo context creation deadlocks under gVisor;
# the library warms each model-column clique serially.
from synergynet_tpu.parallel import warm_mesh_cliques  # noqa: E402

warm_mesh_cliques(mesh)
print(f"[{PID}] column cliques warmed", flush=True)

model = SynergyNet(arch="mobilenet_v2_0.5")
optimizer = optax.sgd(1e-3)
state = create_train_state(model, jax.random.PRNGKey(0), optimizer)
state = jax.device_put(state, replicated(mesh))
step = jit_train_step(model, pack, optimizer, mesh)

B = 16  # global batch; every process holds B // NPROC rows
rng = np.random.default_rng(123)  # same stream everywhere
images = rng.integers(0, 255, (B, 120, 120, 3)).astype(np.uint8)
target = rng.normal(0, 0.5, (B, 62)).astype(np.float32)
rows = slice(PID * B // NPROC, (PID + 1) * B // NPROC)
bsh = NamedSharding(mesh, P("data"))
g_images = jax.make_array_from_process_local_data(bsh, images[rows])
g_target = jax.make_array_from_process_local_data(bsh, target[rows])

losses = []
key = jax.device_put(jax.random.PRNGKey(1), replicated(mesh))
for _ in range(2):
    state, metrics = step(state, g_images, g_target, key)
    losses.append(float(metrics["loss_total"]))
    assert float(metrics["skipped"]) == 0.0
print(f"[{PID}] train losses {losses[0]:.6f} {losses[1]:.6f}", flush=True)
assert losses[1] < losses[0], "SGD on a fixed batch must reduce the loss"

# --- 3. tensor-parallel dense decode across the model axis ---------------
decode = tp_dense_decode(mesh, pack)
params = rng.normal(0, 0.3, (B, 62)).astype(np.float32)
g_params = jax.make_array_from_process_local_data(bsh, params[rows])
dense, checksum = decode(g_params)
nver = pack.w_shp.shape[0] // 3
# The TP basis pads the vertex axis to the shard grid; gather the global
# sharded output and trim the padding before comparing (the checksum output
# also sums padded columns, so it is only an on-device collective probe).
got = np.asarray(multihost_utils.process_allgather(dense,
                                                   tiled=True))[:, :, :nver]
want = np.asarray(decode_dense(jnp.asarray(params), pack))
np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-2)
print(f"[{PID}] tp dense decode matches the single-device codec", flush=True)

print(f"[{PID}] MULTIHOST_OK loss0={losses[0]:.6f}", flush=True)

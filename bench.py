"""Single-chip end-to-end throughput benchmark (driver contract).

Measures faces/sec for the flagship inference path on one TPU chip:
normalized 120x120 crops -> MobileNetV2 SynergyNet -> 62-d 3DMM params ->
68-landmark decode + dense 53,215-vertex mesh (Pallas fused decode) + pose
angles. This is the "regress + reconstruct" portion of the reference's
pipeline; the reference's headline claim is 3000 fps on a laptop RTX 2080
(reference README.md:31) and the build target is >=5000 faces/sec/chip
(BASELINE.json).

Timing methodology: the remote-TPU tunnel used in this environment resolves
``block_until_ready`` before device completion and memoizes repeated
identical executions, so naive host-side loops measure dispatch, not
compute. Instead the whole measurement runs ON DEVICE: one jitted program
executes the pipeline N times via ``lax.fori_loop`` (each iteration
perturbs the input batch so no two iterations are identical) and reduces
every output into a scalar checksum whose host fetch forces completion.
Per-iteration time is the slope between two iteration counts, cancelling
fixed dispatch/fetch overhead.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np

BASELINE_FPS = 3000.0   # reference README.md:31 (RTX 2080 claim)
BATCH = 512
N_SMALL, N_LARGE = 10, 50


def main():
    import jax
    import jax.numpy as jnp
    from synergynet_tpu.core import enable_compile_cache
    enable_compile_cache()
    from jax import lax
    from synergynet_tpu.mm3d import (
        load_param_pack, decode_landmarks, pose_from_param)
    from synergynet_tpu.nn import SynergyNet, init_synergy_variables
    from synergynet_tpu.ops import decode_dense_fast

    pack = load_param_pack()
    model = SynergyNet(arch="mobilenet_v2", dtype=jnp.bfloat16)
    variables = init_synergy_variables(model, jax.random.PRNGKey(0))

    def pipeline(variables, images):
        param62, _ = model.apply(variables, images, train=False)
        param62 = param62.astype(jnp.float32)
        lmk = decode_landmarks(param62, pack)
        dense = decode_dense_fast(param62, pack)
        angles, t3d = pose_from_param(param62, pack)
        return lmk, dense, angles, t3d

    @jax.jit
    def bench_loop(variables, images, n_iters):
        def body(i, acc):
            x = images + (i.astype(jnp.float32) * 1e-4)   # defeat memoization
            lmk, dense, angles, t3d = pipeline(variables, x)
            return (acc + jnp.sum(lmk * lmk) * 1e-6
                    + jnp.sum(dense * dense) * 1e-9
                    + jnp.sum(angles) + jnp.sum(t3d))
        return lax.fori_loop(0, n_iters, body, jnp.float32(0.0))

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.normal(0, 1, (BATCH, 120, 120, 3)), jnp.float32)

    # Warmup / compile (both trip counts share one program: n is traced).
    float(bench_loop(variables, images, 2))

    def run(n):
        t0 = time.perf_counter()
        float(bench_loop(variables, images, n))   # scalar fetch = full sync
        return time.perf_counter() - t0

    t_small = min(run(N_SMALL) for _ in range(3))
    t_large = min(run(N_LARGE) for _ in range(3))
    per_iter = (t_large - t_small) / (N_LARGE - N_SMALL)

    fps = BATCH / per_iter
    print(json.dumps({
        "metric": "faces/sec/chip (regress + 68-lmk + dense-mesh + pose)",
        "value": round(fps, 1),
        "unit": "faces/sec",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
    }))


if __name__ == "__main__":
    main()

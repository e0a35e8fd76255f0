"""Single-chip end-to-end throughput benchmark (driver contract).

Measures faces/sec for the flagship inference path on one TPU chip:
normalized 120x120 crops -> MobileNetV2 SynergyNet -> 62-d 3DMM params ->
68-landmark decode + dense 53,215-vertex mesh + pose angles. This is the
"regress + reconstruct" portion of the reference's pipeline; the reference's
headline claim is 3000 fps on a laptop RTX 2080 (reference README.md:31), and
the build target is >=5000 faces/sec/chip (BASELINE.json).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np

BASELINE_FPS = 3000.0   # reference README.md:31 (RTX 2080 claim)
BATCH = 512
ITERS = 20


def main():
    import jax
    import jax.numpy as jnp
    from synergynet_tpu.mm3d import (
        load_param_pack, decode_landmarks, decode_dense, pose_from_param)
    from synergynet_tpu.nn import SynergyNet, init_synergy_variables

    pack = load_param_pack()
    model = SynergyNet(arch="mobilenet_v2", dtype=jnp.bfloat16)
    variables = init_synergy_variables(model, jax.random.PRNGKey(0))

    @jax.jit
    def pipeline(variables, images):
        param62, _ = model.apply(variables, images, train=False)
        param62 = param62.astype(jnp.float32)
        lmk = decode_landmarks(param62, pack)
        dense = decode_dense(param62, pack)
        angles, t3d = pose_from_param(param62, pack)
        return lmk, dense, angles, t3d

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.normal(0, 1, (BATCH, 120, 120, 3)), jnp.float32)

    # Warmup / compile
    out = pipeline(variables, images)
    jax.block_until_ready(out)

    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = pipeline(variables, images)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    fps = BATCH * ITERS / dt
    print(json.dumps({
        "metric": "faces/sec/chip (regress + 68-lmk + dense-mesh + pose)",
        "value": round(fps, 1),
        "unit": "faces/sec",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
    }))


if __name__ == "__main__":
    main()

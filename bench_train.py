"""Training-step benchmark on the real TPU chip (VERDICT round-1 item 4).

Times the full jitted SynergyNet training step — device-side augmentation
(optional), normalization, backbone + synergy MLPs forward, 5-term loss,
backward, SGD(momentum, nesterov) with atomic NaN-skip — at the reference
recipe's batch sizes, and projects the 80-epoch wall time over the 300W-LP
corpus (~680K crops, reference README.md:111, train_script.sh:9-27).

Reference baseline: ~6 h for 80 epochs at bs=1024 on an RTX 3090
(reference README.md:116) == ~2,470 crops/sec.

Methodology: bench.py's on-device fori_loop slope (the tunnel memoizes
identical dispatches and resolves block_until_ready early). The loop
carries the train state so every iteration is a real sequential update;
images perturb per iteration.

Prints one JSON line per configuration plus a summary line.
"""

import json
import time

import numpy as np

REFERENCE_CROPS_PER_SEC = 680_000 * 80 / (6 * 3600)   # ~2,519
EPOCH_CROPS = 680_000
N_SMALL, N_LARGE = 3, 10


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
    from synergynet_tpu.core import enable_compile_cache
    enable_compile_cache()
    from synergynet_tpu.data.device_augment import device_augment
    from synergynet_tpu.mm3d import load_param_pack
    from synergynet_tpu.nn import SynergyNet
    from synergynet_tpu.train.schedule import lr_per_step
    from synergynet_tpu.train.step import (create_train_state,
                                           make_optimizer, make_train_step)

    pack = load_param_pack()
    rng = np.random.default_rng(0)
    results = {}

    for bs, dtype_name, aug in [(512, "bfloat16", True),
                                (512, "bfloat16", False),
                                (1024, "bfloat16", True),
                                (512, "float32", True)]:
        label = f"bs{bs}_{dtype_name}_{'aug' if aug else 'noaug'}"
        try:
            model = SynergyNet(dtype=getattr(jnp, dtype_name))
            lr_fn = lr_per_step(0.08, (48, 64), 5,
                                steps_per_epoch=EPOCH_CROPS // bs)
            opt = make_optimizer(lr_fn)
            state = create_train_state(model, jax.random.PRNGKey(0), opt)
            step = make_train_step(model, pack, opt,
                                   augment=device_augment if aug else None)

            images = jnp.asarray(rng.integers(
                0, 255, (bs, 120, 120, 3)).astype(np.uint8))
            targets = jnp.asarray(rng.normal(
                0, 1, (bs, 62)).astype(np.float32))
            key = jax.random.PRNGKey(1)

            @jax.jit
            def loop(state, n, images=images, targets=targets, key=key,
                     step=step):
                def body(i, carry):
                    st, acc = carry
                    imgs = (images.astype(jnp.float32)
                            + i.astype(jnp.float32) * 1e-3).astype(jnp.uint8)
                    st, metrics = step(st, imgs, targets, key)
                    return st, acc + metrics["loss_total"]
                st, acc = lax.fori_loop(0, n, body, (state, 0.0))
                return acc

            float(loop(state, 1))                       # compile + warm

            def run(n):
                t0 = time.perf_counter()
                float(loop(state, n))
                return time.perf_counter() - t0

            t_small = min(run(N_SMALL) for _ in range(2))
            t_large = min(run(N_LARGE) for _ in range(2))
            sec_per_step = (t_large - t_small) / (N_LARGE - N_SMALL)
            crops_per_sec = bs / sec_per_step
            epoch_min = EPOCH_CROPS / crops_per_sec / 60
            results[label] = {
                "ms_per_step": round(sec_per_step * 1000, 1),
                "crops_per_sec": round(crops_per_sec, 0),
                "projected_80_epoch_hours": round(epoch_min * 80 / 60, 2),
                "vs_rtx3090_throughput": round(
                    crops_per_sec / REFERENCE_CROPS_PER_SEC, 2),
            }
            print(json.dumps({"config": label, **results[label]}),
                  flush=True)
        except Exception as e:                          # OOM etc: record
            print(json.dumps({"config": label,
                              "error": str(e)[:200]}), flush=True)

    best = max((r for r in results.values()), default=None,
               key=lambda r: r["crops_per_sec"])
    if best:
        print(json.dumps({
            "metric": "train crops/sec/chip (full synergy step, best cfg)",
            "value": best["crops_per_sec"],
            "unit": "crops/sec",
            "vs_baseline": best["vs_rtx3090_throughput"],
        }))


if __name__ == "__main__":
    main()

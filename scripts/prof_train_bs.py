"""Why is bs1024 slower per-crop than bs512? (round-2 VERDICT weak item 3)

docs/TRAINING.md records 17,037 crops/s at bs512+aug but 14,717 at bs1024
— the reference recipe's canonical batch (train_script.sh:14) is the worst
measured config. This probe splits the step at both batch sizes into
forward-only vs full train step, with XLA's own memory analysis of each
compiled program (temp allocation = activation liveness; a spike at bs1024
means XLA is spilling/rematerializing inside the backward pass).

Timing is bench.py's on-device fori_loop slope. One JSON line per probe.

Usage: python -u scripts/prof_train_bs.py [--sizes 512,1024,1024x2]
(``NxK`` = global batch N as K sequential microbatches, accum_steps=K)
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_SMALL, N_LARGE = 3, 10


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="512,1024,1024x2")
    ap.add_argument("--aug", action="store_true", default=True)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax
    from synergynet_tpu.core import enable_compile_cache
    enable_compile_cache()
    from synergynet_tpu.data.device_augment import device_augment
    from synergynet_tpu.mm3d import load_param_pack
    from synergynet_tpu.nn import SynergyNet
    from synergynet_tpu.nn.synergy import synergy_criterion
    from synergynet_tpu.train.schedule import lr_per_step
    from synergynet_tpu.train.step import (create_train_state,
                                           make_optimizer, make_train_step)

    pack = load_param_pack()
    rng = np.random.default_rng(0)

    for spec in args.sizes.split(","):
        bs, _, acc = spec.partition("x")
        bs, acc = int(bs), int(acc or 1)
        model = SynergyNet(dtype=jnp.bfloat16)
        lr_fn = lr_per_step(0.08, (48, 64), 5, steps_per_epoch=680_000 // bs)
        opt = make_optimizer(lr_fn)
        state = create_train_state(model, jax.random.PRNGKey(0), opt)
        step = make_train_step(model, pack, opt, augment=device_augment,
                               accum_steps=acc)

        images = jnp.asarray(rng.integers(
            0, 255, (bs, 120, 120, 3)).astype(np.uint8))
        targets = jnp.asarray(rng.normal(0, 1, (bs, 62)).astype(np.float32))
        key = jax.random.PRNGKey(1)

        # --- forward-only loop (augment + criterion, no grad/update) ---
        @jax.jit
        def fwd_loop(params, batch_stats, n, images=images, targets=targets,
                     key=key, model=model):
            def body(i, acc):
                imgs = (images.astype(jnp.float32)
                        + i.astype(jnp.float32) * 1e-3).astype(jnp.uint8)
                aug = (device_augment(imgs, key) - 127.5) / 128.0
                loss, _, _ = synergy_criterion(
                    model, {"params": params, "batch_stats": batch_stats},
                    aug, targets, pack, train=True, dropout_rng=key)
                return acc + loss
            return lax.fori_loop(0, n, body, jnp.float32(0.0))

        # --- full-step loop (bench_train.py's) ---
        @jax.jit
        def step_loop(state, n, images=images, targets=targets, key=key,
                      step=step):
            def body(i, carry):
                st, acc = carry
                imgs = (images.astype(jnp.float32)
                        + i.astype(jnp.float32) * 1e-3).astype(jnp.uint8)
                st, metrics = step(st, imgs, targets, key)
                return st, acc + metrics["loss_total"]
            st, acc = lax.fori_loop(0, n, body, (state, 0.0))
            return acc

        def slope_ms(fn, *a):
            float(fn(*a, 1))

            def run(n):
                t0 = time.perf_counter()
                float(fn(*a, n))
                return time.perf_counter() - t0
            ts = min(run(N_SMALL) for _ in range(2))
            tl = min(run(N_LARGE) for _ in range(2))
            return (tl - ts) / (N_LARGE - N_SMALL) * 1000

        def mem(fn, *a):
            try:
                m = fn.lower(*a, N_LARGE).compile().memory_analysis()
                return {k: round(getattr(m, k) / 2**20, 1)
                        for k in ("temp_size_in_bytes",
                                  "argument_size_in_bytes",
                                  "output_size_in_bytes",
                                  "generated_code_size_in_bytes")
                        if hasattr(m, k)}
            except Exception as e:
                return {"error": type(e).__name__}

        fwd_ms = slope_ms(fwd_loop, state.params, state.batch_stats)
        full_ms = slope_ms(step_loop, state)
        print(json.dumps({
            "bs": bs, "accum_steps": acc,
            "fwd_ms_per_step": round(fwd_ms, 2),
            "full_ms_per_step": round(full_ms, 2),
            "bwd_ms_per_step": round(full_ms - fwd_ms, 2),
            "fwd_crops_per_sec": round(bs / fwd_ms * 1000, 0),
            "full_crops_per_sec": round(bs / full_ms * 1000, 0),
            "mem_fwd_mb": mem(fwd_loop, state.params, state.batch_stats),
            "mem_full_mb": mem(step_loop, state),
        }), flush=True)


if __name__ == "__main__":
    main()

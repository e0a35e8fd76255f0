"""Per-stage slope profile + roofline attribution of the TRAIN step.

The serving program has a stage/roofline table (docs/SERVING.md,
scripts/prof_serving_stages.py); this is the same treatment for the
training step (round-3 VERDICT next-item 6): decompose
``make_train_step`` into its pipeline stages, slope-time each on the real
chip with bench.py's on-device fori_loop methodology, and attribute FLOPs
per stage from XLA's own cost model (v5e bf16 peak 197 TFLOP/s).

  augment   fused device ColorJitter + border occlusion + normalize
  backbone  MobileNetV2 forward, train-mode BN (bf16)
  fwd       full 5-loss synergy criterion forward (backbone + 68-pt
            decode + MLP_for/MLP_rev + wing/param losses)
  grad      value_and_grad of the criterion (fwd + backward)
  update    SGD(momentum, nesterov) + atomic NaN-scan on fixed grads
  full      the production train step (grad + update fused)

Stage times overlap under XLA fusion, so fwd/grad/update need not sum to
full. Run while no other TPU process is active.

Usage: python -u scripts/prof_train_stages.py [--bs 512] [--accum 1]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PEAK_BF16 = 197e12      # v5e chip


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, default=512)
    ap.add_argument("--accum", type=int, default=1)
    ap.add_argument("--small", type=int, default=4)
    ap.add_argument("--large", type=int, default=16)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--stages",
                    default="augment,backbone,fwd,grad,update,full")
    args = ap.parse_args()
    want = set(args.stages.split(","))
    bs = args.bs

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
    model = SynergyNet(dtype=jnp.bfloat16)
    lr_fn = lr_per_step(0.08, (48, 64), 5, steps_per_epoch=680_000 // bs)
    opt = make_optimizer(lr_fn)
    state = create_train_state(model, jax.random.PRNGKey(0), opt)
    step = make_train_step(model, pack, opt, augment=device_augment,
                           accum_steps=args.accum)

    images = jnp.asarray(rng.integers(0, 255, (bs, 120, 120, 3)
                                      ).astype(np.uint8))
    targets = jnp.asarray(rng.normal(0, 1, (bs, 62)).astype(np.float32))
    key = jax.random.PRNGKey(1)

    def slope_ms(loop_fn, *arrs):
        def run(n):
            t0 = time.perf_counter()
            jax.block_until_ready(
                jax.tree.leaves(loop_fn(jnp.int32(n), *arrs)))
            # scalar-fetch forces device completion through the tunnel
            float(jax.tree.leaves(loop_fn(jnp.int32(n), *arrs))[0]
                  .reshape(-1)[0])
            return time.perf_counter() - t0

        run(1)                                     # compile + warm
        best = []
        for _ in range(args.reps):
            ts = min(run(args.small) for _ in range(2))
            tl = min(run(args.large) for _ in range(2))
            best.append((tl - ts) / (args.large - args.small) * 1e3)
        best.sort()
        return best[len(best) // 2]

    def flops_of(jitted, *a):
        try:
            c = jitted.lower(*a).compile()
            fl = c.cost_analysis()
            fl = fl[0] if isinstance(fl, (list, tuple)) else fl
            return float(fl.get("flops", 0.0))
        except Exception:
            return 0.0

    results, gflops = {}, {}

    def record(name, loop, n_iters_flops=None, *arrs):
        ms = slope_ms(loop, *arrs)
        results[name] = round(ms, 3)
        print(f"# {name} {results[name]} ms/step", flush=True)

    if "augment" in want:
        @jax.jit
        def loop_aug(n, images):
            def body(i, acc):
                im = (images.astype(jnp.float32)
                      + i.astype(jnp.float32) * 1e-3).astype(jnp.uint8)
                x = (device_augment(im, key) - 127.5) / 128.0
                return acc + jnp.sum(x) * 1e-6
            return lax.fori_loop(0, n, body, jnp.float32(0.0))
        record("augment", loop_aug, None, images)

    xn0 = jnp.asarray(rng.normal(0, 1, (bs, 120, 120, 3)).astype(np.float32))

    if "backbone" in want:
        from synergynet_tpu.nn.backbones import make_backbone
        bb = make_backbone(model.arch, dtype=jnp.bfloat16)

        @jax.jit
        def loop_bb(n, xn, params, stats):
            def body(i, acc):
                x = xn + i.astype(jnp.float32) * 1e-4
                (p62, _), _ = bb.apply(
                    {"params": params["backbone"],
                     "batch_stats": stats["backbone"]},
                    x, train=True, mutable=["batch_stats"],
                    rngs={"dropout": key})
                return acc + jnp.sum(p62.astype(jnp.float32))
            return lax.fori_loop(0, n, body, jnp.float32(0.0))
        record("backbone", loop_bb, None, xn0, state.params,
               state.batch_stats)

    if "fwd" in want:
        @jax.jit
        def loop_fwd(n, xn, params, stats, targets):
            def body(i, acc):
                x = xn + i.astype(jnp.float32) * 1e-4
                total, _, _ = synergy_criterion(
                    model, {"params": params, "batch_stats": stats},
                    x, targets, pack, train=True, dropout_rng=key)
                return acc + total
            return lax.fori_loop(0, n, body, jnp.float32(0.0))
        record("fwd", loop_fwd, None, xn0, state.params, state.batch_stats,
               targets)

    if "grad" in want:
        def loss_fn(params, stats, x, targets):
            total, _, upd = synergy_criterion(
                model, {"params": params, "batch_stats": stats},
                x, targets, pack, train=True, dropout_rng=key)
            return total, upd

        @jax.jit
        def loop_grad(n, xn, params, stats, targets):
            def body(i, acc):
                x = xn + i.astype(jnp.float32) * 1e-4
                (total, _), g = jax.value_and_grad(
                    loss_fn, has_aux=True)(params, stats, x, targets)
                gsum = sum(jnp.sum(jnp.abs(l.astype(jnp.float32)))
                           for l in jax.tree.leaves(g))
                return acc + total + gsum * 1e-9
            return lax.fori_loop(0, n, body, jnp.float32(0.0))
        record("grad", loop_grad, None, xn0, state.params,
               state.batch_stats, targets)

    if "update" in want:
        g0 = jax.tree.map(lambda p: jnp.full_like(p, 1e-4), state.params)

        @jax.jit
        def loop_upd(n, g0, opt_state, params):
            def body(i, carry):
                opt_state, params = carry
                g = jax.tree.map(
                    lambda x: x + i.astype(x.dtype) * 1e-9, g0)
                finite = jnp.all(jnp.asarray(
                    [jnp.all(jnp.isfinite(l))
                     for l in jax.tree.leaves(g)]))
                upd, new_os = opt.update(g, opt_state, params)
                new_p = jax.tree.map(lambda p, u: p + u, params, upd)
                sel = lambda a, b: jax.tree.map(
                    lambda x, y: jnp.where(finite, x, y), a, b)
                return sel(new_os, opt_state), sel(new_p, params)
            return lax.fori_loop(0, n, body, (opt_state, params))
        record("update", loop_upd, None, g0, state.opt_state, state.params)

    if "full" in want:
        @jax.jit
        def loop_full(n, state, images, targets):
            def body(i, carry):
                st, acc = carry
                im = (images.astype(jnp.float32)
                      + i.astype(jnp.float32) * 1e-3).astype(jnp.uint8)
                st, m = step(st, im, targets, key)
                return st, acc + m["loss_total"]
            st, acc = lax.fori_loop(0, n, body, (state, jnp.float32(0.0)))
            return acc
        record("full", loop_full, None, state, images, targets)

        # FLOPs per step from XLA's cost model of ONE un-looped step.
        one = jax.jit(lambda st, im, tg: step(st, im, tg, key))
        fl = flops_of(one, state, images, targets)
        gflops["full"] = round(fl / 1e9, 2)

    out = {"bs": bs, "accum_steps": args.accum,
           "ms_per_step": results,
           "crops_per_sec": {k: round(bs / v * 1e3, 0)
                             for k, v in results.items()},
           "gflops_per_step": gflops}
    if "full" in results and gflops.get("full"):
        tfs = gflops["full"] / results["full"]   # GF / ms == TF/s
        out["full_tf_per_sec"] = round(tfs, 2)
        out["full_mfu_bf16_pct"] = round(tfs * 1e12 / PEAK_BF16 * 100, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

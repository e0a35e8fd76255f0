"""Diagnose the round-3 full-recipe eval plateau (VERDICT.md Weak #1).

The recorded recipe run (docs/FULL_RECIPE_RUN.json) reaches loss_LMK 0.38
while its eval NME sits at ~74%; the "good" toy run's 35.9% plateau turned
out to be the mean-collapse level (33.1%) — i.e. the dot-painted synthetic
task never teaches landmarks at all. This script separates two questions:

1. TASK: does the dense-appearance shaded-surface task
   (data/shaded.py) learn where the sparse dots task plateaus?
   Run both arms (DIAG_TASK=dots,shaded — comma list) under identical
   config and compare loss curves + eval reports.
2. MODE: is eval-mode inference (BN running stats, TestTransform,
   std=130) consistent with train-mode on the same crops?
     H1 train/eval mode mismatch (BN stats broken) ->
          eval-mode NME on TRAINING crops bad while train-mode good.
     H2 normalization mismatch (std 130 vs 128) -> arm C vs B.
     H3 no generalization -> train crops good, held-out bad.

Run: python scripts/diag_learn.py            # CPU 8-device mesh (default)
     DIAG_PLATFORM=tpu python scripts/diag_learn.py   # real chip
Config env: DIAG_TASK=dots,shaded DIAG_N=2048 DIAG_BS=128 DIAG_EPOCHS=24
            DIAG_LR=0.01 DIAG_AUGMENT=0 DIAG_DTYPE=float32
Trained states are saved to /tmp/diag_state_<task>.npz for report-only
iteration (DIAG_LOAD=1 skips training when the file exists).
"""

import os
import sys
import time

PLATFORM = os.environ.get("DIAG_PLATFORM", "cpu")
if PLATFORM == "cpu":
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

if PLATFORM == "cpu":
    jax.config.update("jax_platforms", "cpu")

from synergynet_tpu.core.profiling import enable_compile_cache
enable_compile_cache("/tmp/synergy_jax_cache", min_compile_secs=5.0)

from synergynet_tpu.data.synthetic import (make_crops_with_params,
                                           make_synthetic_aflw2000)
from synergynet_tpu.mm3d import decode_landmarks, load_param_pack
from synergynet_tpu.nn import SynergyNet
from synergynet_tpu.train.step import (create_train_state, make_optimizer,
                                       make_train_step)

TASKS = os.environ.get("DIAG_TASK", "dots,shaded").split(",")
N_TRAIN = int(os.environ.get("DIAG_N", 2048))
BATCH = int(os.environ.get("DIAG_BS", 128))
EPOCHS = int(os.environ.get("DIAG_EPOCHS", 24))
LR = float(os.environ.get("DIAG_LR", 0.01))
AUGMENT = os.environ.get("DIAG_AUGMENT", "0") == "1"
DTYPE = os.environ.get("DIAG_DTYPE", "float32")
LOAD = os.environ.get("DIAG_LOAD", "0") == "1"


def px_err(lmk_pred, lmk_gt):
    """Mean 2D pixel error in crop space."""
    d = np.asarray(lmk_pred)[:, :2] - np.asarray(lmk_gt)[:, :2]
    return float(np.sqrt((d ** 2).sum(1)).mean())


def train_task(model, pack, task: str):
    from synergynet_tpu.core.checkpoint import (restore_checkpoint,
                                                save_checkpoint)
    state_path = f"/tmp/diag_state_{task}.npz"
    optimizer = make_optimizer(lambda s: LR, weight_decay=5e-4)
    augment = None
    if AUGMENT:
        from synergynet_tpu.data.device_augment import device_augment
        augment = device_augment
    step = jax.jit(make_train_step(model, pack, optimizer, augment=augment),
                   donate_argnums=(0,))
    state = create_train_state(model, jax.random.PRNGKey(0), optimizer)

    train = make_crops_with_params(N_TRAIN, pack, seed=0, appearance=task)
    imgs, tgts = train["images"], train["params"]

    if LOAD and os.path.exists(state_path):
        template = {"params": jax.device_get(state.params),
                    "batch_stats": jax.device_get(state.batch_stats)}
        variables = restore_checkpoint(state_path, template)
        print(f"[{task}] loaded {state_path}", flush=True)
        return variables, train

    rng = np.random.default_rng(3)
    key = jax.random.PRNGKey(1)
    steps_per_epoch = N_TRAIN // BATCH
    t0 = time.time()
    for epoch in range(EPOCHS):
        order = rng.permutation(N_TRAIN)
        tot = lmk_l = 0.0
        for i in range(steps_per_epoch):
            idx = order[i * BATCH:(i + 1) * BATCH]
            state, m = step(state, jnp.asarray(imgs[idx]),
                            jnp.asarray(tgts[idx]), key)
            tot += float(m["loss_total"])
            lmk_l += float(m["loss_LMK_f0"])
        print(f"[{task}] epoch {epoch + 1:3d} "
              f"loss_total {tot / steps_per_epoch:.4f} "
              f"loss_LMK_f0 {lmk_l / steps_per_epoch:.4f} "
              f"({time.time() - t0:.0f}s)", flush=True)

    variables = {"params": jax.device_get(state.params),
                 "batch_stats": jax.device_get(state.batch_stats)}
    save_checkpoint(state_path, variables)
    return variables, train


def run_reports(model, pack, variables, train, task: str):
    import functools

    @functools.partial(jax.jit, static_argnames=("train_mode",))
    def fwd(images_u8, std, train_mode):
        x = (images_u8.astype(jnp.float32) - 127.5) / std
        if train_mode:
            (p62, _), _ = model.apply(
                variables, x, train=True, mutable=["batch_stats"],
                rngs={"dropout": jax.random.PRNGKey(42)})
        else:
            p62, _ = model.apply(variables, x, train=False)
        return p62.astype(jnp.float32)

    def extract(images_u8, train_mode=False, std=128.0):
        out = []
        for s in range(0, len(images_u8), BATCH):
            chunk = images_u8[s:s + BATCH]
            pad = BATCH - len(chunk)
            if pad:
                chunk = np.concatenate(
                    [chunk, np.zeros((pad,) + chunk.shape[1:], chunk.dtype)])
            p62 = fwd(jnp.asarray(chunk), jnp.float32(std),
                      train_mode=train_mode)
            out.append(np.asarray(p62, np.float32)[:BATCH - pad])
        return np.concatenate(out)

    gt_lmk_train = train["landmarks"]

    def report(name, params_pred, lmk_gt):
        lmk = np.asarray(decode_landmarks(jnp.asarray(params_pred), pack))
        gt = np.asarray(lmk_gt)
        minx, maxx = gt[:, 0].min(1), gt[:, 0].max(1)
        miny, maxy = gt[:, 1].min(1), gt[:, 1].max(1)
        diag = np.sqrt((maxx - minx) * (maxy - miny))
        dis = np.sqrt(((lmk[:, :2] - gt[:, :2]) ** 2).sum(1)).mean(1)
        nme = float((dis / diag).mean() * 100)
        print(f"[{task}] {name:50s} px_err {px_err(lmk, gt):7.2f}  "
              f"NME {nme:6.2f}%", flush=True)

    n_eval = min(512, N_TRAIN)
    sub = slice(0, n_eval)

    report("mean-collapse (zero params) on train",
           np.zeros((n_eval, 62), np.float32), gt_lmk_train[sub])
    report("train-mode fwd, train crops, std=128",
           extract(train["images"][sub], train_mode=True),
           gt_lmk_train[sub])
    report("EVAL-mode fwd, train crops, std=128",
           extract(train["images"][sub], train_mode=False),
           gt_lmk_train[sub])
    report("EVAL-mode fwd, train crops, std=130",
           extract(train["images"][sub], train_mode=False, std=130.0),
           gt_lmk_train[sub])

    held = make_crops_with_params(n_eval, pack, seed=77, appearance=task)
    report("EVAL-mode fwd, HELD-OUT crops, std=128",
           extract(held["images"], train_mode=False), held["landmarks"])
    report("train-mode fwd, HELD-OUT crops, std=128",
           extract(held["images"], train_mode=True), held["landmarks"])

    from synergynet_tpu.data import TestTransform
    from synergynet_tpu.evals import benchmark_pipeline
    ep = make_synthetic_aflw2000(n_eval, seed=11, appearance=task)
    r = benchmark_pipeline(model, variables, ep, pack, std=130.0,
                           batch=BATCH, transform=TestTransform())
    print(f"[{task}] {'eval-hook protocol (TestTransform, std=130)':50s} "
          f"NME {r['nme_mean']:6.2f}%  FOE {r['foe']['mae_mean']:.2f}",
          flush=True)


def main():
    pack = load_param_pack()
    model = SynergyNet(arch="mobilenet_v2", dtype=jnp.dtype(DTYPE))
    for task in TASKS:
        variables, train = train_task(model, pack, task)
        run_reports(model, pack, variables, train, task)


if __name__ == "__main__":
    main()

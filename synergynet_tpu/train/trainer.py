"""Training driver: epochs, meters, logging, checkpoints, in-train eval.

The runtime equivalent of the reference's ``main_train.main``/``train``
(reference main_train.py:103-239) on the SPMD step of
:mod:`synergynet_tpu.train.step`:

- one jitted train step (loss + grads + psum + SGD/NaN-skip) over a
  ``(data, model)`` mesh; batches host-sharded onto the data axis;
- the reference's step-decay schedule with flat damped "warmup"
  (main_train.py:74-94) driven per-step;
- ``AverageMeter`` progress logging (main_train.py:106-153);
- pytree checkpoints every ``save_val_freq`` epochs + final, with resume
  (main_train.py:187-194,225-236);
- optional per-epoch AFLW2000-protocol validation hook
  (benchmark_validate.py:243-266 equivalent).

Without real 300W-LP data the driver falls back to the synthetic
landmark-painted dataset so a full run exercises every subsystem.
"""

from __future__ import annotations

import logging
import os
import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from synergynet_tpu.core import mesh as meshlib
from synergynet_tpu.core.checkpoint import (restore_checkpoint,
                                            save_checkpoint,
                                            checkpoint_metadata)
from synergynet_tpu.core.config import Config
from synergynet_tpu.data import (ArrayDataset, FileListDataset,
                                 PrefetchLoader, TrainTransform,
                                 make_crops_with_params)
from synergynet_tpu.mm3d import load_param_pack
from synergynet_tpu.nn import SynergyNet
from synergynet_tpu.train.meters import AverageMeter, MeterBank
from synergynet_tpu.train.schedule import lr_per_step
from synergynet_tpu.train.step import (create_train_state, jit_train_step,
                                       make_optimizer)

log = logging.getLogger("synergynet_tpu.train")


def build_dataset(cfg: Config):
    d = cfg.data
    transform = (None if d.device_augment
                 else TrainTransform(d.jitter, d.border, d.occlusion_prob))
    if d.filelists_train and os.path.exists(d.filelists_train):
        return FileListDataset(d.root, d.filelists_train, d.param_fp_train,
                               transform=transform)
    log.info("no 300W-LP filelist configured; using synthetic dataset "
             "(%d crops)", d.synthetic_size)
    if d.synthetic_size > 100_000 or d.streaming:
        # 300W-LP scale cannot be materialized (~29 GB at 680K crops);
        # stream bit-stable crops generated per index instead.
        from synergynet_tpu.data import GeneratedCropDataset
        return GeneratedCropDataset(d.synthetic_size, seed=cfg.train.seed,
                                    transform=transform,
                                    appearance=d.appearance)
    syn = make_crops_with_params(d.synthetic_size, seed=cfg.train.seed,
                                 appearance=d.appearance)
    return ArrayDataset(syn["images"], syn["params"], transform=transform)


def build_augment(cfg: Config):
    """The fused device-side augmentation callable for a config (or None)
    — single construction point for both the host-loop and
    device-resident training paths."""
    if not cfg.data.device_augment:
        return None
    from functools import partial
    from synergynet_tpu.data.device_augment import device_augment
    d = cfg.data
    return partial(device_augment, jitter=tuple(d.jitter), border=d.border,
                   occlusion_prob=d.occlusion_prob)


class Trainer:
    def __init__(self, cfg: Optional[Config] = None,
                 eval_hook: Optional[Callable] = None,
                 mesh=None):
        self.cfg = cfg or Config()
        t = self.cfg.train
        self.pack = load_param_pack()
        self.model = SynergyNet(
            arch=self.cfg.model.arch,
            dtype=jnp.dtype(self.cfg.model.compute_dtype))
        self.mesh = mesh if mesh is not None else meshlib.make_mesh()
        nproc = jax.process_count()
        if nproc > 1:
            # Multi-host SPMD: every process loads a disjoint dataset shard
            # and feeds batch_size/nproc local rows per global step; the
            # collective contexts are warmed serially first (gVisor
            # deadlocks on concurrent gloo context creation).
            from synergynet_tpu.parallel import warm_mesh_cliques
            warm_mesh_cliques(self.mesh)
            if t.batch_size % nproc:
                raise ValueError(f"global batch {t.batch_size} must divide "
                                 f"across {nproc} processes")
        self.dataset = build_dataset(self.cfg)
        self.loader = PrefetchLoader(
            self.dataset, t.batch_size // nproc, shuffle=True,
            drop_last=True, num_workers=t.num_workers, seed=t.seed,
            process_index=jax.process_index(), process_count=nproc)
        steps_per_epoch = max(len(self.loader), 1)
        self.lr_fn = lr_per_step(t.base_lr, t.milestones, t.warmup,
                                 steps_per_epoch)
        self.optimizer = make_optimizer(
            self.lr_fn, momentum=t.momentum, nesterov=t.nesterov,
            weight_decay=t.weight_decay)
        self.state = create_train_state(
            self.model, jax.random.PRNGKey(t.seed), self.optimizer)
        self.augment = build_augment(self.cfg)
        self.bn_groups = (self.mesh.shape[meshlib.DATA_AXIS]
                          if t.per_replica_bn else 1)
        self.step_fn = jit_train_step(self.model, self.pack, self.optimizer,
                                      self.mesh, augment=self.augment,
                                      bn_groups=self.bn_groups,
                                      accum_steps=t.accum_steps)
        self.state = meshlib.replicate(self.mesh, self.state)
        self.eval_hook = eval_hook
        self.start_epoch = 1
        if t.resume:
            self.resume(t.resume)

    # -- checkpointing ----------------------------------------------------
    def ckpt_path(self, epoch: int) -> str:
        d = self.cfg.train.snapshot_dir
        return os.path.join(d, f"synergynet_epoch_{epoch}.npz")

    def save(self, epoch: int) -> Optional[str]:
        if jax.process_index() != 0:     # one writer per multi-host job
            return None
        path = self.ckpt_path(epoch)
        save_checkpoint(path, jax.device_get(self.state),
                        step=int(self.state.step),
                        metadata={"epoch": epoch,
                                  "arch": self.cfg.model.arch})
        log.info("Save checkpoint to %s", path)
        return path

    def emergency_save(self, last_epoch: int) -> None:
        """Failure containment: persist the live state so a crashed run can
        resume (the reference loses everything since the last periodic
        torch.save). Used by both fit() and fit_resident()."""
        if jax.process_index() != 0:
            return
        path = os.path.join(self.cfg.train.snapshot_dir,
                            "synergynet_emergency.npz")
        try:
            save_checkpoint(path, jax.device_get(self.state),
                            step=int(self.state.step),
                            metadata={"epoch": last_epoch,
                                      "emergency": True,
                                      "arch": self.cfg.model.arch})
            log.error("training failed; emergency checkpoint at %s", path)
        except Exception:
            log.exception("emergency checkpoint failed")

    def resume(self, path: str) -> None:
        template = jax.device_get(self.state)
        restored = restore_checkpoint(path, template)
        self.state = meshlib.replicate(self.mesh, restored)
        meta = checkpoint_metadata(path)
        self.start_epoch = int(meta.get("epoch", 0)) + 1
        log.info("Resumed from %s (epoch %d)", path, self.start_epoch - 1)

    # -- loops ------------------------------------------------------------
    def train_epoch(self, epoch: int) -> MeterBank:
        t = self.cfg.train
        self.loader.set_epoch(epoch)
        bank = MeterBank()
        data_time = AverageMeter()
        batch_time = AverageMeter()
        rng = jax.random.fold_in(jax.random.PRNGKey(t.seed), epoch)
        # Metric fetches are deferred to print boundaries: a per-step
        # float() is a device sync, which on a remote-TPU link serializes
        # every step on the round-trip. Keeping up to print_freq metric
        # pytrees on device lets XLA pipeline the steps back to back.
        # state.step increments once per batch (even NaN-skipped ones), so
        # the global step of batch i is start_step + i + 1.
        start_step = int(jax.device_get(self.state.step))
        pending = []

        def flush():
            for metrics, n, step_no in pending:
                host = {k: float(v) for k, v in metrics.items()}
                bank.update(host, n=n)
                if host.get("skipped"):
                    log.warning("[NAN case] skipped step %d", step_no)
            pending.clear()

        end = time.time()
        for i, (images, params) in enumerate(self.loader):
            data_time.update(time.time() - end)
            batch = meshlib.shard_batch(
                self.mesh, (images, params.astype(np.float32)))
            self.state, metrics = self.step_fn(self.state, batch[0],
                                               batch[1], rng)
            pending.append((metrics, images.shape[0], start_step + i + 1))
            batch_time.update(time.time() - end)
            end = time.time()
            if i % t.print_freq == 0:
                flush()
                lr = float(self.lr_fn(int(self.state.step) - 1))
                log.info("[%d][%d/%d] LR: %.8f Time: %.3f(%.3f) %s",
                         epoch, i, len(self.loader), lr, batch_time.val,
                         batch_time.avg, bank.format())
                end = time.time()
        flush()
        return bank

    def fit(self, epochs: Optional[int] = None) -> dict:
        t = self.cfg.train
        epochs = epochs if epochs is not None else t.epochs
        if t.test_initial and self.eval_hook:
            log.info("Testing from initial")
            self.eval_hook(self)
        history = {}
        epoch = self.start_epoch
        try:
            for epoch in range(self.start_epoch, epochs + 1):
                bank = self.train_epoch(epoch)
                history[epoch] = bank.averages()
                if epoch % t.save_val_freq == 0 or epoch == epochs:
                    self.save(epoch)
                    if self.eval_hook:
                        log.info("Val[%d]", epoch)
                        history[epoch]["eval"] = self.eval_hook(self)
        except Exception:
            self.emergency_save(epoch - 1)
            raise
        return history


def make_synthetic_eval_hook(n: int = 256, seed: int = 11,
                             std: float = 130.0,
                             appearance: str = "dots") -> Callable:
    """In-train validation on the synthetic AFLW2000 pack (std=130 mirrors
    the reference's in-training normalization — quirk Q6). ``appearance``
    must match the training data's (data/shaded.py vs dot-painted).

    The pack is self-checked at construction: scoring the GT parameters
    through the full protocol must give ~0 NME, or the pack's host-side
    GT is numerically corrupted and every in-train eval would be garbage
    while training converges — the exact signature of the round-3 "74%
    plateau" artifact (stale cross-host XLA:CPU AOT cache entries
    perturbing the GT decode; see core/profiling.cache_fingerprint)."""
    from synergynet_tpu.data import make_synthetic_aflw2000, TestTransform
    from synergynet_tpu.evals import benchmark_params, benchmark_pipeline
    ep = make_synthetic_aflw2000(n, seed=seed, appearance=appearance)
    gt = benchmark_params(ep["params"], ep)
    if not (gt["nme_mean"] < 0.5 and gt["foe"]["mae_mean"] < 0.5):
        raise RuntimeError(
            "synthetic eval pack failed its GT self-check "
            f"(GT-params NME {gt['nme_mean']:.3f}%, "
            f"FOE MAE {gt['foe']['mae_mean']:.3f} deg; both should be ~0). "
            "The host-side GT decode is numerically corrupted — most "
            "likely a poisoned persistent compile cache; delete "
            "/tmp/synergy_jax_cache-* and rerun.")
    tf = TestTransform()

    def hook(trainer: Trainer) -> dict:
        variables = {"params": jax.device_get(trainer.state.params),
                     "batch_stats": jax.device_get(trainer.state.batch_stats)}
        r = benchmark_pipeline(trainer.model, variables, ep, trainer.pack,
                               std=std, batch=min(128, n), transform=tf)
        log.info("%s", r["report"])
        return {"nme_mean": r["nme_mean"], "foe_mae": r["foe"]["mae_mean"]}

    return hook

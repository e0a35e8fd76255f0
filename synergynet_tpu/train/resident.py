"""Device-resident training: the whole dataset in HBM, one dispatch per epoch.

The reference (and round-1's Trainer) feed the chip one host batch at a
time (reference main_train.py:103-153). For datasets that fit device
memory — 300W-LP's ~680K 120x120 crops are 29 GB, i.e. HBM-resident when
sharded over >=4 chips, and a 128K-crop shard (5.5 GB) fits ONE chip —
the TPU-native design removes the host from the loop entirely:

- the crop/param arrays are uploaded once, sharded over the mesh's
  ``data`` axis (leading shard axis D);
- every epoch compiles to ONE program: each data-shard draws its own
  on-device permutation (``jax.random.permutation`` per shard row, fully
  local), and a ``lax.fori_loop`` over steps gathers (D, B/D) local
  batches with ``take_along_axis`` — no cross-shard traffic, no host
  round-trips, no input pipeline to starve the MXU;
- the existing :func:`make_train_step` runs unchanged inside the loop
  (5-loss synergy criterion, fused device augmentation, NaN-skip), so
  data-parallel gradient psums still cross the mesh each step;
- per-epoch mean metrics come back with a single host sync per epoch.

Over this environment's remote-TPU tunnel the host loop pays ~1.2 s/step
re-uploading each 44 MB batch (37 MB/s link); device-resident epochs run
at the step's native ~58 ms with one upload total.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import NamedSharding, PartitionSpec as P

from synergynet_tpu.core import mesh as meshlib
from synergynet_tpu.mm3d.assets import ParamPack
from synergynet_tpu.train.step import make_train_step


def make_epoch_program(model, pack: ParamPack, optimizer, mesh,
                       batch_size: int, augment: Optional[Callable] = None,
                       bn_groups: int = 1, accum_steps: int = 1):
    """Compile ``epoch(state, images, params62, key) -> (state, metrics)``.

    ``images``: (D, n_local, H, W, C) uint8, sharded ``P('data')``;
    ``params62``: (D, n_local, 62) float32, sharded the same;
    ``metrics``: per-epoch means of the train-step metrics.
    D is the mesh's data-axis size and B must divide D * n_local.
    """
    step = make_train_step(model, pack, optimizer, augment=augment,
                           bn_groups=bn_groups, accum_steps=accum_steps)
    d = mesh.shape[meshlib.DATA_AXIS]
    if batch_size % d:
        raise ValueError(f"batch {batch_size} not divisible by data={d}")
    b_local = batch_size // d

    def epoch(state, images, params62, key, hwc):
        # ``images`` is (D, n_local, H*W*C) uint8: row gathers on a 2-D
        # (per shard) layout are tile-natural; a 5-D image array made XLA
        # materialize two full transposed-layout copies (~11 GB of HLO
        # temps for a 5.3 GB dataset) to serve the same gather.
        nl = images.shape[1]
        steps = (d * nl) // batch_size
        # One independent permutation per data shard (vmap over the shard
        # row keeps the sampling local to each chip).
        # fold_in above the int32 range: step keys are fold_in(key, i)
        # with i an int32 >= 0 (< 2**31), so the permutation stream can
        # never collide with a step's augmentation stream (ADVICE round 4).
        shard_keys = jax.random.split(jax.random.fold_in(key, 2 ** 31), d)
        perms = jax.vmap(lambda k: jax.random.permutation(k, nl))(shard_keys)
        perms = lax.with_sharding_constraint(
            perms, NamedSharding(mesh, P(meshlib.DATA_AXIS)))

        def run_step(i, state):
            idx = lax.dynamic_slice_in_dim(perms, i * b_local, b_local, 1)
            bimg = jnp.take_along_axis(images, idx[:, :, None], axis=1)
            btgt = jnp.take_along_axis(params62, idx[:, :, None], axis=1)
            return step(state,
                        bimg.reshape(batch_size, *hwc),
                        btgt.reshape(batch_size, 62), key)

        state, m0 = run_step(0, state)

        def body(i, carry):
            state, acc = carry
            state, m = run_step(i, state)
            return state, jax.tree.map(jnp.add, acc, m)

        state, acc = lax.fori_loop(1, steps, body, (state, m0))
        return state, jax.tree.map(lambda a: a / steps, acc)

    rep = meshlib.replicated(mesh)
    dsh = NamedSharding(mesh, P(meshlib.DATA_AXIS))
    return jax.jit(epoch,
                   in_shardings=(rep, dsh, dsh, rep),
                   out_shardings=(rep, rep),
                   donate_argnums=(0,),
                   static_argnums=(4,))


def make_generative_epoch_program(model, pack: ParamPack, optimizer, mesh,
                                  batch_size: int,
                                  augment: Optional[Callable] = None,
                                  bn_groups: int = 1, accum_steps: int = 1):
    """Device-*generative* resident training: only the (D, n_local, 62)
    whitened parameters live in HBM; every batch's crops are SYNTHESIZED
    on device inside the epoch program (``data/shaded.py``'s scatter-free
    lit blob-surface render: landmark decode -> separable-Gaussian matmul
    splat -> shading -> exact landmark dots).

    This is what makes the reference's full ~680K-crop scale
    (reference README.md:111) single-chip trainable here: 680K uint8 crops
    are 29 GB (>HBM), but their parameters are 170 MB, and the render adds
    only a few ms/batch of MXU/VPU work next to the ~60 ms train step.

    Geometry (params -> surface) is fixed per index; lighting and
    background noise re-roll per epoch (keyed by fold_in(epoch_key, index))
    — the synthesis-side analogue of photometric augmentation. The host
    syncs once per epoch, exactly like :func:`make_epoch_program`.

    The shuffle rides in as an argument: ``perms`` (D, n_local) int32, one
    host-generated permutation per data shard, uploaded per epoch (64 KB
    at 16K crops, 2.7 MB at 680K). Unlike :func:`make_epoch_program`,
    which draws its permutation on device, this program must NOT carry an
    in-program ``jax.random.permutation``: its bitonic-sort lowering grows
    ~log^2(n) HLO stages, and stacked on the render+train body the
    combined program reproducibly crashed this environment's remote
    compile server at 16K crops (the 2K-crop build of the identical
    instruction stream compiles fine; measured round 4). Host
    ``np.random.permutation`` is also simply faster at the 680K scale.

    Returns ``epoch(state, params62, perms, key) -> (state, metrics)``
    with ``params62``/``perms`` sharded ``P('data')``.
    """
    from synergynet_tpu.data.shaded import _render_shaded
    from synergynet_tpu.mm3d.codec import decode_landmarks

    step = make_train_step(model, pack, optimizer, augment=augment,
                           bn_groups=bn_groups, accum_steps=accum_steps)
    d = mesh.shape[meshlib.DATA_AXIS]
    if batch_size % d:
        raise ValueError(f"batch {batch_size} not divisible by data={d}")
    b_local = batch_size // d

    def epoch(state, params62, perms, key):
        nl = params62.shape[1]
        steps = (d * nl) // batch_size
        # Fold domain above the int32 range: step keys are fold_in(key, i)
        # with i an int32 >= 0 (< 2**31), so the epoch's lighting/
        # background render stream can never equal a step's augmentation
        # stream (ADVICE round 4: the old fold_in(23) collided with step
        # 23's key).
        render_key = jax.random.fold_in(key, 2 ** 31 + 1)
        row0 = jnp.arange(d, dtype=jnp.int32)[:, None] * nl

        def run_step(i, state):
            idx = lax.dynamic_slice_in_dim(perms, i * b_local, b_local, 1)
            btgt = jnp.take_along_axis(params62, idx[:, :, None], axis=1
                                       ).reshape(batch_size, 62)
            gidx = (row0 + idx).reshape(batch_size)   # global crop indices
            lmk = decode_landmarks(btgt, pack)
            images = _render_shaded(lmk, render_key, idx=gidx)
            return step(state, images, btgt, jax.random.fold_in(key, i))

        state, m0 = run_step(0, state)

        def body(i, carry):
            state, acc = carry
            state, m = run_step(i, state)
            return state, jax.tree.map(jnp.add, acc, m)

        state, acc = lax.fori_loop(1, steps, body, (state, m0))
        return state, jax.tree.map(lambda a: a / steps, acc)

    rep = meshlib.replicated(mesh)
    dsh = NamedSharding(mesh, P(meshlib.DATA_AXIS))
    return jax.jit(epoch,
                   in_shardings=(rep, dsh, dsh, rep),
                   out_shardings=(rep, rep),
                   donate_argnums=(0,))


def shard_resident_params(mesh, params62: np.ndarray) -> jax.Array:
    """Upload only the (n, 62) whitened parameters, sharded over ``data``
    — the generative path's entire resident dataset."""
    d = mesh.shape[meshlib.DATA_AXIS]
    n = (len(params62) // d) * d
    tgts = params62[:n].reshape(d, n // d, params62.shape[1]
                                ).astype(np.float32)
    dsh = NamedSharding(mesh, P(meshlib.DATA_AXIS))
    nproc = jax.process_count()
    if nproc > 1:
        pid = jax.process_index()
        rows = slice(pid * d // nproc, (pid + 1) * d // nproc)
        return jax.make_array_from_process_local_data(dsh, tgts[rows])
    return jax.device_put(tgts, dsh)


def shard_resident_arrays(mesh, images: np.ndarray, params62: np.ndarray
                          ) -> Tuple[jax.Array, jax.Array, Tuple[int, ...]]:
    """Upload (n, H, W, C) crops + (n, 62) params once, flattened to the
    (D, n/D, H*W*C) shard layout the epoch program consumes. Returns the
    device arrays and the static per-crop (H, W, C) shape."""
    d = mesh.shape[meshlib.DATA_AXIS]
    n = (len(images) // d) * d
    hwc = tuple(images.shape[1:])
    imgs = images[:n].reshape(d, n // d, -1)
    tgts = params62[:n].reshape(d, n // d, params62.shape[1]
                                ).astype(np.float32)
    dsh = NamedSharding(mesh, P(meshlib.DATA_AXIS))
    nproc = jax.process_count()
    if nproc > 1:
        # Every process holds the (bit-stable) full dataset; upload only
        # the row block its local mesh rows own.
        pid = jax.process_index()
        rows = slice(pid * d // nproc, (pid + 1) * d // nproc)
        return (jax.make_array_from_process_local_data(dsh, imgs[rows]),
                jax.make_array_from_process_local_data(dsh, tgts[rows]),
                hwc)
    return (jax.device_put(imgs, dsh), jax.device_put(tgts, dsh), hwc)


def _drive_epochs(trainer, epochs: Optional[int], log_fn,
                  run_one: Callable) -> Dict[int, dict]:
    """Shared epoch loop (checkpoints/eval hooks/history contract of
    ``Trainer.fit``, one dispatch + one metric sync per epoch)."""
    t = trainer.cfg.train
    epochs = epochs if epochs is not None else t.epochs
    key = jax.random.PRNGKey(t.seed)
    history: Dict[int, dict] = {}
    if t.test_initial and trainer.eval_hook:
        trainer.eval_hook(trainer)
    epoch = trainer.start_epoch
    try:
        for epoch in range(trainer.start_epoch, epochs + 1):
            trainer.state, metrics = run_one(
                trainer.state, jax.random.fold_in(key, epoch))
            host = {k: float(v) for k, v in metrics.items()}
            history[epoch] = host
            if log_fn:
                log_fn(epoch, host)
            if epoch % t.save_val_freq == 0 or epoch == epochs:
                trainer.save(epoch)
                if trainer.eval_hook:
                    history[epoch]["eval"] = trainer.eval_hook(trainer)
    except Exception:
        trainer.emergency_save(epoch - 1)
        raise
    return history


def fit_resident(trainer, images: np.ndarray, params62: np.ndarray,
                 epochs: Optional[int] = None,
                 log_fn: Optional[Callable] = None) -> Dict[int, dict]:
    """Drive a :class:`synergynet_tpu.train.trainer.Trainer`'s state through
    device-resident epochs (same checkpoints/eval hooks/history contract as
    ``Trainer.fit``, one dispatch + one metric sync per epoch)."""
    t = trainer.cfg.train
    epoch_fn = make_epoch_program(trainer.model, trainer.pack,
                                  trainer.optimizer, trainer.mesh,
                                  t.batch_size, augment=trainer.augment,
                                  bn_groups=getattr(trainer, "bn_groups", 1),
                                  accum_steps=t.accum_steps)
    g_imgs, g_tgts, hwc = shard_resident_arrays(trainer.mesh, images,
                                                params62)
    return _drive_epochs(
        trainer, epochs, log_fn,
        lambda state, k: epoch_fn(state, g_imgs, g_tgts, k, hwc))


def _shard_epoch_perms(mesh, key, nl: int) -> jax.Array:
    """One host-drawn uniform permutation per data-shard row, seeded from
    the epoch key (bit-stable across processes/runs), uploaded sharded
    ``P('data')``. Host numpy replaces the in-program bitonic sort — see
    :func:`make_generative_epoch_program`."""
    d = mesh.shape[meshlib.DATA_AXIS]
    seed_words = np.asarray(jax.random.key_data(key)).reshape(-1)
    perms = np.stack([
        np.random.default_rng(
            np.concatenate([seed_words, [row]]).astype(np.uint32)
        ).permutation(nl).astype(np.int32)
        for row in range(d)])
    dsh = NamedSharding(mesh, P(meshlib.DATA_AXIS))
    nproc = jax.process_count()
    if nproc > 1:
        pid = jax.process_index()
        rows = slice(pid * d // nproc, (pid + 1) * d // nproc)
        return jax.make_array_from_process_local_data(dsh, perms[rows])
    return jax.device_put(perms, dsh)


def fit_resident_generative(trainer, params62: np.ndarray,
                            epochs: Optional[int] = None,
                            log_fn: Optional[Callable] = None
                            ) -> Dict[int, dict]:
    """Device-generative resident training: upload only the whitened
    parameters; crops are synthesized on device every step
    (:func:`make_generative_epoch_program`). The path that runs the full
    680K-crop reference scale on one chip."""
    t = trainer.cfg.train
    epoch_fn = make_generative_epoch_program(
        trainer.model, trainer.pack, trainer.optimizer, trainer.mesh,
        t.batch_size, augment=trainer.augment,
        bn_groups=getattr(trainer, "bn_groups", 1),
        accum_steps=t.accum_steps)
    g_tgts = shard_resident_params(trainer.mesh, params62)
    nl = g_tgts.shape[1]

    def run_one(state, k):
        perms = _shard_epoch_perms(trainer.mesh, k, nl)
        return epoch_fn(state, g_tgts, perms, k)

    return _drive_epochs(trainer, epochs, log_fn, run_one)

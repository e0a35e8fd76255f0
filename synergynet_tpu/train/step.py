"""SPMD training step: SGD(momentum, nesterov) with NaN-step-skip, under jit.

Replaces the reference's ``SGD_NanHandler`` (utils/ddfa.py:297-340) and the
per-batch loop body (main_train.py:103-153). The reference scans gradients on
the host and aborts mid-update when it finds a NaN; here the whole update is
computed on device and the *entire* step is atomically skipped via
``jnp.where`` when any gradient is non-finite — same protective intent, no
host sync, and no partially-applied update (the reference could update the
parameters ordered before the NaN — an unintended partial step).

Parallelism: the step function is pure; ``jit_train_step`` binds it to a mesh
with the batch sharded over ``data`` and state replicated. XLA inserts the
gradient ``psum`` over ICI. BatchNorm statistics are computed per global
batch (sync-BN semantics) — the reference trains per-replica BN under
DataParallel; per-device stats can be recovered by wrapping the criterion in
``shard_map``, but global stats are strictly more stable and match at
1-device parity.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from synergynet_tpu.core import mesh as meshlib
from synergynet_tpu.mm3d.assets import ParamPack
from synergynet_tpu.nn.synergy import SynergyNet, synergy_criterion


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


def make_optimizer(lr_fn: Callable, momentum: float = 0.9,
                   nesterov: bool = True, weight_decay: float = 0.0
                   ) -> optax.GradientTransformation:
    """SGD+momentum+nesterov with optional decoupled weight decay, matching
    the reference optimizer config (main_train.py:180-184)."""
    parts = []
    if weight_decay:
        parts.append(optax.add_decayed_weights(weight_decay))
    parts.append(optax.trace(decay=momentum, nesterov=nesterov))
    parts.append(optax.scale_by_learning_rate(lr_fn))
    return optax.chain(*parts)


def create_train_state(model: SynergyNet, rng: jax.Array,
                       optimizer: optax.GradientTransformation,
                       batch: int = 1) -> TrainState:
    from synergynet_tpu.nn.synergy import init_synergy_variables
    variables = init_synergy_variables(model, rng, batch=batch)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=optimizer.init(variables["params"]),
    )


def make_train_step(model: SynergyNet, pack: ParamPack,
                    optimizer: optax.GradientTransformation,
                    augment: Callable | None = None,
                    bn_groups: int = 1, accum_steps: int = 1):
    """Returns ``step(state, images, target62, rng) -> (state, metrics)``.

    ``metrics['skipped']`` is 1.0 when the step was skipped due to non-finite
    gradients (the reference's NaN flag, main_train.py:139-142).
    ``augment``: optional device-side batched augmentation
    ``(images_u8, key) -> float [0, 255]`` fused into the step
    (:func:`synergynet_tpu.data.device_augment.device_augment`).

    ``bn_groups``: 1 = sync-BN (global batch statistics — the SPMD default,
    strictly more stable). >1 = per-replica BN train-parity mode
    (SURVEY.md §7): the batch splits into ``bn_groups`` contiguous groups
    and BatchNorm statistics are computed per group via ``vmap``, exactly
    the reference's ``nn.DataParallel`` semantics (each GPU normalizes its
    own shard, model_building.py:98-101 / main_train.py:176). The
    persisted running stats are group 0's — torch DataParallel broadcasts
    buffers from the master each forward, so only the master replica's
    (= first shard's) updates survive. Loss = mean of per-group means,
    which equals the global mean for equal group sizes. Set ``bn_groups``
    to the mesh's data-axis size so groups coincide with device shards.

    ``accum_steps``: >1 runs the batch as that many sequential microbatches
    under ``lax.scan``, averaging gradients — the update is the exact mean
    of per-microbatch gradients and BatchNorm statistics chain through the
    microbatches sequentially (torch semantics for accumulated steps).
    Motivation is measured, not semantic: at bs1024 XLA's per-crop
    throughput drops ~14% vs bs512 (the activation working set outgrows
    what fits close to the compute — forward temp memory grows 2.4x for a
    2x batch, scripts/prof_train_bs.py), so the reference recipe's bs1024
    (train_script.sh:14) runs fastest as 2 x bs512 microbatches. Mutually
    exclusive with ``bn_groups``.
    """
    if accum_steps > 1 and bn_groups > 1:
        raise ValueError("accum_steps and bn_groups are mutually exclusive")

    def train_step(state: TrainState, images: jnp.ndarray,
                   target62: jnp.ndarray, rng: jax.Array
                   ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        dropout_rng = jax.random.fold_in(rng, state.step)
        if augment is not None:
            aug_rng = jax.random.fold_in(
                jax.random.fold_in(rng, state.step), 7)
            images = augment(images, aug_rng)
            images = (images - 127.5) / 128.0
        elif images.dtype == jnp.uint8:
            # Reference input normalization (utils/ddfa.py Normalize:
            # (x - 127.5) / 128), fused on device; float inputs are assumed
            # pre-normalized.
            images = (images.astype(jnp.float32) - 127.5) / 128.0

        if accum_steps > 1:
            b = images.shape[0]
            if b % accum_steps:
                raise ValueError(f"batch {b} not divisible into "
                                 f"{accum_steps} microbatches")
            mb = b // accum_steps
            im_mb = images.reshape(accum_steps, mb, *images.shape[1:])
            tg_mb = target62.reshape(accum_steps, mb, -1)
            keys = jax.random.split(dropout_rng, accum_steps)

            def loss_mb(params, stats, im, tg, key):
                total, losses, updates = synergy_criterion(
                    model, {"params": params, "batch_stats": stats},
                    im, tg, pack, train=True, dropout_rng=key)
                return total, (losses, updates)

            def scan_body(carry, xs):
                stats, gacc, tacc, lacc = carry
                im, tg, key = xs
                (t_, (l_, upd)), g = jax.value_and_grad(
                    loss_mb, has_aux=True)(state.params, stats, im, tg, key)
                return (upd.get("batch_stats", stats),
                        jax.tree.map(jnp.add, gacc, g),
                        tacc + t_, jax.tree.map(jnp.add, lacc, l_)), None

            from synergynet_tpu.nn.synergy import LOSS_WEIGHTS
            l0 = {k: jnp.float32(0.0) for k in LOSS_WEIGHTS}
            g0 = jax.tree.map(jnp.zeros_like, state.params)
            (stats, gacc, tacc, lacc), _ = jax.lax.scan(
                scan_body, (state.batch_stats, g0, jnp.float32(0.0), l0),
                (im_mb, tg_mb, keys))
            inv = 1.0 / accum_steps
            total = tacc * inv
            losses = jax.tree.map(lambda l: l * inv, lacc)
            updates = {"batch_stats": stats}
            grads = jax.tree.map(lambda g: g * inv, gacc)
            return _apply_update(state, total, losses, updates, grads)

        def loss_fn(params):
            if bn_groups > 1:
                b = images.shape[0]
                if b % bn_groups:
                    raise ValueError(f"batch {b} not divisible into "
                                     f"{bn_groups} BN groups")
                gi = images.reshape(bn_groups, b // bn_groups,
                                    *images.shape[1:])
                gt = target62.reshape(bn_groups, b // bn_groups, -1)
                grngs = jax.random.split(dropout_rng, bn_groups)

                def per_group(im, tg, key):
                    return synergy_criterion(
                        model, {"params": params,
                                "batch_stats": state.batch_stats},
                        im, tg, pack, train=True, dropout_rng=key)

                totals, losses_g, updates_g = jax.vmap(per_group)(
                    gi, gt, grngs)
                # master-replica running stats (group 0) persist
                return jnp.mean(totals), (
                    jax.tree.map(jnp.mean, losses_g),
                    jax.tree.map(lambda s: s[0], updates_g))
            total, losses, updates = synergy_criterion(
                model, {"params": params, "batch_stats": state.batch_stats},
                images, target62, pack, train=True, dropout_rng=dropout_rng)
            return total, (losses, updates)

        (total, (losses, updates)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        return _apply_update(state, total, losses, updates, grads)

    def _apply_update(state, total, losses, updates, grads):
        grads_finite = jnp.all(jnp.asarray(
            [jnp.all(jnp.isfinite(g)) for g in jax.tree.leaves(grads)]))

        upd, new_opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        new_params = optax.apply_updates(state.params, upd)

        def select(new, old):
            return jax.tree.map(
                lambda a, b: jnp.where(grads_finite, a, b), new, old)

        new_state = TrainState(
            step=state.step + 1,
            params=select(new_params, state.params),
            batch_stats=select(updates.get("batch_stats", state.batch_stats),
                               state.batch_stats),
            opt_state=select(new_opt_state, state.opt_state),
        )
        metrics = {**losses, "loss_total": total,
                   "skipped": (~grads_finite).astype(jnp.float32)}
        return new_state, metrics

    return train_step


def jit_train_step(model: SynergyNet, pack: ParamPack,
                   optimizer: optax.GradientTransformation,
                   mesh, augment: Callable | None = None,
                   bn_groups: int = 1, accum_steps: int = 1) -> Callable:
    """jit the train step over a mesh: batch sharded on data, state replicated."""
    step = make_train_step(model, pack, optimizer, augment=augment,
                           bn_groups=bn_groups, accum_steps=accum_steps)
    rep = meshlib.replicated(mesh)
    bsh = meshlib.batch_sharding(mesh)
    return jax.jit(
        step,
        in_shardings=(rep, bsh, bsh, rep),
        out_shardings=(rep, rep),
        donate_argnums=(0,),
    )

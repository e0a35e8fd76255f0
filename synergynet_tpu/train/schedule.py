"""Learning-rate schedule: the reference's step decay, exactly.

Reference main_train.py:74-94 ``adjust_learning_rate``: the factor exponent is
1 during the first ``warmup`` epochs (i.e. lr = base * 0.2 — the reference's
"warmup" is a flat damped phase, not a ramp), 0 from warmup to the first
milestone, then i after milestone i. Canonical hyperparameters
(train_script.sh:9-27): base_lr 0.08, milestones (48, 64), warmup 5,
80 epochs.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax.numpy as jnp


def step_decay_lr(base_lr: float = 0.08,
                  milestones: Sequence[int] = (48, 64),
                  warmup: int = 5, gamma: float = 0.2
                  ) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Returns epoch -> lr (works on traced integer epochs)."""
    ms = jnp.asarray(list(milestones))

    def lr_for_epoch(epoch):
        epoch = jnp.asarray(epoch)
        n_past = jnp.sum(epoch > ms)           # milestones passed
        in_warmup = epoch <= warmup
        n = jnp.where(in_warmup, 1, n_past)
        return base_lr * gamma ** n

    return lr_for_epoch


def lr_per_step(base_lr: float, milestones: Sequence[int], warmup: int,
                steps_per_epoch: int, gamma: float = 0.2
                ) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Step-indexed wrapper (epoch = step // steps_per_epoch + 1, matching the
    reference's 1-based epoch loop at main_train.py:218)."""
    epoch_fn = step_decay_lr(base_lr, milestones, warmup, gamma)

    def lr_for_step(step):
        return epoch_fn(step // steps_per_epoch + 1)

    return lr_for_step

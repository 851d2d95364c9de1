"""Learning-rate schedules.

FISRnet schedules (main.py:67-73, FISRnet.py:232-248, 636-638):
  * stair_decay  — piecewise constant: lr * factor**k after epoch boundary k
  * linear_decay — init until `decay_point` epoch, then linear to 0 at the
                   final epoch (computed per-epoch in the reference's Python
                   loop; here a pure function of the global step)
  * no_decay

PWC-Net schedules (missing upstream `lr.py`, model_base.py:307-334):
  * multisteps  — piecewise constant on global step (long/fine variants are
                  just different boundary lists, passed by the caller)
  * cyclic      — triangular cyclic between base and max bounds

All return step -> lr callables usable as optax schedules.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp

__all__ = ["stair_decay", "linear_decay", "no_decay", "multisteps", "cyclic"]


def stair_decay(init_lr: float, boundaries_steps: Sequence[int], factor: float):
    bounds = jnp.asarray(list(boundaries_steps))

    def schedule(step):
        # tf.train.piecewise_constant keeps the LEFT value AT a boundary
        # step (switches at step > boundary) — pinned by
        # tests/test_schedule_oracle.py against TF's own evaluation
        k = jnp.sum(step > bounds)
        return init_lr * factor ** k.astype(jnp.float32)

    return schedule


def linear_decay(init_lr: float, total_epochs: int, decay_point_epoch: int,
                 steps_per_epoch: int):
    def schedule(step):
        epoch = step // steps_per_epoch
        frac = (total_epochs - epoch).astype(jnp.float32) / float(
            total_epochs - decay_point_epoch
        )
        return jnp.where(epoch < decay_point_epoch, init_lr, init_lr * frac)

    return schedule


def no_decay(init_lr: float):
    def schedule(step):
        del step
        return jnp.asarray(init_lr, jnp.float32)

    return schedule


def multisteps(lr_values: Sequence[float], boundaries: Sequence[int]):
    """lr_values has len(boundaries)+1 entries (model_pwcnet.py:67-68)."""
    vals = jnp.asarray(list(lr_values), jnp.float32)
    bounds = jnp.asarray(list(boundaries))

    def schedule(step):
        # boundary-inclusive-left, as tf.train.piecewise_constant (see
        # stair_decay / tests/test_schedule_oracle.py)
        k = jnp.sum(step > bounds)
        return vals[k]

    return schedule


def cyclic(base_lr: float, max_lr: float, stepsize: int):
    """Triangular cyclic lr (Smith 2015; model_base.py lr_cyclic_*)."""

    def schedule(step):
        cycle = jnp.floor(1.0 + step / (2.0 * stepsize))
        x = jnp.abs(step / float(stepsize) - 2.0 * cycle + 1.0)
        return base_lr + (max_lr - base_lr) * jnp.maximum(0.0, 1.0 - x)

    return schedule

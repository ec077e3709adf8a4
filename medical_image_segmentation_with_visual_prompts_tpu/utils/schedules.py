"""Learning-rate schedules.

JAX-idiomatic (pure functions of the step count, composable with optax)
equivalents of the reference's torch schedulers:

* ``warmup_cosine`` — linear warmup then cosine decay, exactly the
  ``WarmupCosineSchedule`` lambda from /root/reference/src/modules/
  utils.py:67-89 (itself taken from SwinMM).  The phase-1/2 trainers step
  it per optimizer step (multi_view.py:190, students_teacher.py:207).
* ``step_decay`` — torch ``lr_scheduler.StepLR`` semantics
  (segmentation.py:36), stepped per *epoch* by the downstream trainer
  (segmentation.py:155); the returned schedule is therefore a function of
  the epoch index.
"""

from __future__ import annotations

import math


def warmup_cosine(base_lr: float, warmup_steps: int, t_total: int,
                  cycles: float = 0.5):
    """Linear warmup to ``base_lr`` over ``warmup_steps``, then cosine decay.

    Matches reference modules/utils.py:83-89 bit-for-bit (including the
    ``max(1.0, warmup_steps)`` and ``max(1, t_total - warmup_steps)``
    guards and clamping at zero).
    """

    def schedule(step):
        # jnp-traceable: optax passes a traced step count inside jit.
        import jax.numpy as jnp
        step = jnp.asarray(step, jnp.float32)
        warm = base_lr * step / max(1.0, float(warmup_steps))
        progress = (step - warmup_steps) / float(max(1, t_total - warmup_steps))
        cos = base_lr * jnp.maximum(
            0.0, 0.5 * (1.0 + jnp.cos(math.pi * float(cycles) * 2.0 * progress)))
        return jnp.where(step < warmup_steps, warm, cos)

    return schedule


def step_decay(base_lr: float, step_size: int = 100, gamma: float = 0.8):
    """torch StepLR: lr = base_lr * gamma ** (epoch // step_size).

    Reference segmentation.py:36 uses step_size=100, gamma=0.8, stepped
    once per epoch (segmentation.py:155).
    """

    def schedule(epoch) -> float:
        return base_lr * gamma ** (int(epoch) // step_size)

    return schedule

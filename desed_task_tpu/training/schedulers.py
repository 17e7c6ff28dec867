"""Step-wise schedules (TPU-native re-design of desed_task/utils/schedulers.py).

The reference's ExponentialWarmup (:60-104) mutates optimizer param groups from
a Python loop; here the same curve is a pure function of the step that works
both as an optax learning-rate schedule and, evaluated inside the jitted train
step, as the mean-teacher consistency-weight ramp (the reference reuses
`_get_scaling_factor` for both, sed_trainer_pretrained.py:402-405).

Curve (schedulers.py:85-101):
    ramp:      exp(exponent * (1 - min(step, L)/L)^2),  exponent = -5
    annealing: max(min_lr/max_lr, cos((step - S) * pi / (2 * (max_steps - S))))
               once step >= S = start_annealing.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class ExponentialWarmup:
    max_lr: float
    rampup_length: int
    exponent: float = -5.0
    start_annealing: int | None = None
    max_steps: int | None = None
    min_lr: float = 1e-8

    def scaling_factor(self, step):
        """Ramp factor in [0, 1]; `step` may be a python int or a traced jnp
        int (works inside jit and as an optax schedule)."""
        step = jnp.asarray(step, jnp.float32)
        if self.rampup_length == 0:
            ramp = jnp.ones_like(step)
        else:
            current = jnp.clip(step, 0.0, float(self.rampup_length))
            phase = 1.0 - current / float(self.rampup_length)
            ramp = jnp.exp(self.exponent * phase * phase)
        if self.start_annealing is None:
            return ramp
        assert self.max_steps is not None, "annealing needs max_steps"
        one = step - float(self.start_annealing)
        zero = float(self.max_steps - self.start_annealing)
        anneal = jnp.maximum(
            self.min_lr / self.max_lr, jnp.cos(one * jnp.pi / (2.0 * zero))
        )
        return jnp.where(step >= self.start_annealing, anneal, ramp)

    def __call__(self, step):
        """Learning rate at `step` (optax schedule signature)."""
        return self.max_lr * self.scaling_factor(step)

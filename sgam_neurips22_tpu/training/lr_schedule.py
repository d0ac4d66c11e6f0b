"""LR schedules.

Rebuild of reference sgam/generative_sensing_module/lr_scheduler.py
`LambdaWarmUpCosineScheduler` (:4-33) as an optax-compatible schedule
function. Note the reference defines this but never wires it into
`configure_optimizers` (constant LR in practice, SURVEY.md section 2.5);
here it is available via `TrainConfig`-level opt-in.
"""
from __future__ import annotations

import jax.numpy as jnp


def lambda_warmup_cosine(
    warm_up_steps: int,
    lr_min: float,
    lr_max: float,
    lr_start: float,
    max_decay_steps: int,
):
    """Linear warmup lr_start -> lr_max, then cosine decay to lr_min.

    Returns a multiplier schedule f(step) (the reference multiplies
    base_learning_rate by this lambda)."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = lr_start + (lr_max - lr_start) / max(warm_up_steps, 1) * step
        t = (step - warm_up_steps) / max(max_decay_steps - warm_up_steps, 1)
        t = jnp.clip(t, 0.0, 1.0)
        cos = lr_min + 0.5 * (lr_max - lr_min) * (1 + jnp.cos(t * jnp.pi))
        return jnp.where(step < warm_up_steps, warm, cos)

    return schedule

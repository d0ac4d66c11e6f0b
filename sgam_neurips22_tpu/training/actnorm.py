"""ActNorm: flow-style per-channel affine norm with data-dependent init.

Rebuild of reference modules/util.py `ActNorm` (:10-92): scale/shift
initialized from the first batch's per-channel statistics (zero mean, unit
variance after the transform), then trained as free parameters. Used as the
discriminator's norm when `use_actnorm=True` (reference
discriminator/model.py:31-33).

Functional form: state carries an `initialized` flag; the first training
apply returns updated params (data-dependent init is an explicit state
transition, not a hidden side effect).
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp


def init_actnorm(c: int) -> Dict[str, jnp.ndarray]:
    return {
        "loc": jnp.zeros((c,), jnp.float32),
        "scale": jnp.ones((c,), jnp.float32),
        "initialized": jnp.zeros((), jnp.bool_),
    }


def actnorm_data_init(params, x: jnp.ndarray):
    """Per-channel standardization from the batch (reference util.py:21-37)."""
    mean = jnp.mean(x, axis=(0, 1, 2))
    std = jnp.std(x, axis=(0, 1, 2))
    return {
        "loc": -mean,
        "scale": 1.0 / (std + 1e-6),
        "initialized": jnp.ones((), jnp.bool_),
    }


def apply_actnorm(
    params: Dict[str, jnp.ndarray], x: jnp.ndarray, train: bool = True
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """x: [B, H, W, C] -> (normalized, possibly-updated params)."""
    if train:
        data = actnorm_data_init(params, x)
        init = params["initialized"]
        params = {
            "loc": jnp.where(init, params["loc"], data["loc"]),
            "scale": jnp.where(init, params["scale"], data["scale"]),
            "initialized": jnp.ones((), jnp.bool_),
        }
    y = params["scale"] * (x + params["loc"])
    return y, params

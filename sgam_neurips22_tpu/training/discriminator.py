"""PatchGAN discriminator (pix2pix NLayerDiscriminator), functional NHWC.

Rebuild of reference modules/discriminator/model.py:17-67: Conv(k4,s2)+
LeakyReLU(0.2), then n_layers of Conv+BatchNorm+LeakyReLU with doubling
filters, a stride-1 block, and a final 1-channel logit conv. Init is
normal(0, 0.02) for convs and normal(1, 0.02)/0 for BN (weights_init, :8-14).

Parameters are stored as a `main` list indexed like the torch nn.Sequential
(param-bearing indices only), so reference checkpoints convert directly.
BatchNorm uses batch statistics in training (torch semantics) and running
stats in eval; running stats live in a separate `state` tree.
"""
from __future__ import annotations

from typing import Any, Dict, List, NamedTuple, Tuple

import jax
import jax.numpy as jnp

Params = Dict[str, Any]


class DiscConfig(NamedTuple):
    input_nc: int = 4
    ndf: int = 64
    n_layers: int = 3
    kernel_width: int = 4


def _layer_plan(cfg: DiscConfig):
    """(seq_index, kind, cin, cout, stride, use_bias) for param-bearing layers."""
    plan = []
    idx = 0
    plan.append((idx, "conv", cfg.input_nc, cfg.ndf, 2, True))
    idx += 2  # conv, lrelu
    nf_mult = 1
    for n in range(1, cfg.n_layers):
        nf_prev, nf_mult = nf_mult, min(2**n, 8)
        plan.append((idx, "conv", cfg.ndf * nf_prev, cfg.ndf * nf_mult, 2, False))
        plan.append((idx + 1, "bn", cfg.ndf * nf_mult, None, None, None))
        idx += 3
    nf_prev, nf_mult = nf_mult, min(2**cfg.n_layers, 8)
    plan.append((idx, "conv", cfg.ndf * nf_prev, cfg.ndf * nf_mult, 1, False))
    plan.append((idx + 1, "bn", cfg.ndf * nf_mult, None, None, None))
    idx += 3
    plan.append((idx, "conv", cfg.ndf * nf_mult, 1, 1, True))
    return plan, idx + 1


from functools import partial


@partial(jax.jit, static_argnames=("cfg", "dtype"))
def init_discriminator(key: jax.Array, cfg: DiscConfig = DiscConfig(), dtype=jnp.float32):
    """Returns (params, state). Init matches reference weights_init."""
    plan, length = _layer_plan(cfg)
    main: List[Any] = [None] * length
    state: List[Any] = [None] * length
    kw = cfg.kernel_width
    keys = jax.random.split(key, len(plan))
    for k, (idx, kind, cin, cout, stride, use_bias) in zip(keys, plan):
        if kind == "conv":
            p = {"weight": 0.02 * jax.random.normal(k, (kw, kw, cin, cout), dtype)}
            if use_bias:
                p["bias"] = jnp.zeros((cout,), dtype)
            main[idx] = p
        else:  # bn
            main[idx] = {
                "weight": 1.0 + 0.02 * jax.random.normal(k, (cin,), dtype),
                "bias": jnp.zeros((cin,), dtype),
            }
            state[idx] = {
                "running_mean": jnp.zeros((cin,), jnp.float32),
                "running_var": jnp.ones((cin,), jnp.float32),
            }
    return {"main": main}, {"main": state}


def _batch_norm(x, p, s, train: bool, momentum: float = 0.1, eps: float = 1e-5):
    if train:
        mean = jnp.mean(x, axis=(0, 1, 2))
        var = jnp.var(x, axis=(0, 1, 2))
        n = x.shape[0] * x.shape[1] * x.shape[2]
        unbiased = var * n / max(n - 1, 1)
        new_s = {
            "running_mean": (1 - momentum) * s["running_mean"] + momentum * mean,
            "running_var": (1 - momentum) * s["running_var"] + momentum * unbiased,
        }
    else:
        mean, var = s["running_mean"], s["running_var"]
        new_s = s
    y = (x - mean) * jax.lax.rsqrt(var + eps) * p["weight"] + p["bias"]
    return y, new_s


def apply_discriminator(
    params: Params,
    state: Params,
    x: jnp.ndarray,
    cfg: DiscConfig = DiscConfig(),
    train: bool = True,
) -> Tuple[jnp.ndarray, Params]:
    """x: [B, H, W, C] -> (patch logits [B, h', w', 1], new_state)."""
    plan, length = _layer_plan(cfg)
    plan_by_idx = {idx: rest for idx, *rest in plan}
    main = params["main"]
    st = list(state["main"])
    h = x
    for idx in range(length):
        if idx not in plan_by_idx:
            continue
        kind, cin, cout, stride, use_bias = plan_by_idx[idx]
        p = main[idx]
        if kind == "conv":
            h = jax.lax.conv_general_dilated(
                h, p["weight"].astype(h.dtype), (stride, stride),
                ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            if "bias" in p:
                h = h + p["bias"].astype(h.dtype)
            is_last = idx == length - 1
            if not is_last and plan_by_idx.get(idx + 1, (None,))[0] != "bn":
                h = jax.nn.leaky_relu(h, 0.2)
        else:
            h, st[idx] = _batch_norm(h, p, st[idx], train)
            h = jax.nn.leaky_relu(h, 0.2)
    return h, {"main": st}

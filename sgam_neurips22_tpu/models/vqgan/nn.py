"""Functional neural-net primitives (NHWC, fp32-param, bf16-compute ready).

These are the building blocks of the taming-transformers VQGAN backbone
(reference: sgam/generative_sensing_module/modules/diffusionmodules/model.py:
`nonlinearity` :29, `Normalize` :34, `Upsample` :38, `Downsample` :56,
`ResnetBlock` :78, `AttnBlock` :140), re-expressed as pure functions over
parameter pytrees. Parameter tree keys mirror the torch module names so that
torch checkpoints convert one-to-one (core/torch_convert.py).

Conv kernels are HWIO (TPU-native); torch OIHW kernels transpose on import.
"""
from __future__ import annotations

import math
from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name

Params = Dict[str, Any]


def swish(x: jnp.ndarray) -> jnp.ndarray:
    return x * jax.nn.sigmoid(x)


# ---------------------------------------------------------------- init utils
def _conv_init(key, kh, kw, cin, cout, dtype=jnp.float32) -> Params:
    """torch Conv2d default init: kaiming_uniform(a=sqrt(5)) for the kernel,
    uniform(+-1/sqrt(fan_in)) for the bias."""
    wkey, bkey = jax.random.split(key)
    fan_in = kh * kw * cin
    gain = math.sqrt(2.0 / (1 + 5.0))  # leaky_relu gain with a=sqrt(5)
    bound = gain * math.sqrt(3.0 / fan_in)
    w = jax.random.uniform(wkey, (kh, kw, cin, cout), dtype, -bound, bound)
    bb = 1.0 / math.sqrt(fan_in)
    b = jax.random.uniform(bkey, (cout,), dtype, -bb, bb)
    return {"weight": w, "bias": b}


def _norm_init(c, dtype=jnp.float32) -> Params:
    return {"weight": jnp.ones((c,), dtype), "bias": jnp.zeros((c,), dtype)}


# ------------------------------------------------------------------- applies
def conv2d(
    x: jnp.ndarray,
    p: Params,
    stride: int = 1,
    padding="SAME",
) -> jnp.ndarray:
    w = p["weight"]
    y = jax.lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(stride, stride),
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    # tagged for the selective remat policy (autoencoder._maybe_remat):
    # under jax.checkpoint, conv outputs are SAVED for the backward pass and
    # only the cheap elementwise ops (group_norm, swish, adds) recompute —
    # convs carry ~all the FLOPs here, elementwise ops ~all the residency.
    # checkpoint_name is a no-op outside a policied jax.checkpoint.
    return checkpoint_name(y + p["bias"].astype(x.dtype), "conv_out")


def group_norm(
    x: jnp.ndarray, p: Params, num_groups: int = 32, eps: float = 1e-6
) -> jnp.ndarray:
    """GroupNorm(32, eps=1e-6) over NHWC (reference Normalize, model.py:34).

    Group statistics are composed from per-CHANNEL moments instead of
    reshaping the activation to [B, H, W, G, C/G]: splitting the lane
    (channel) axis retiles the tensor, and XLA materialized that relayout
    as a physical copy of every conv output — measured 80 ms/step of pure
    'data formatting' copies on the bs-16 conditional train trace (round-5
    roofline, the largest single block). A group's mean is the mean of its
    channels' means (equal pixel counts), and the variance comes from the
    standard two-pass form E[(x - mean_g)^2] composed the same way — so
    the math is the torch semantics exactly, up to fp summation order
    (parity pinned at 1e-4 vs torch.nn.functional.group_norm,
    tests/test_vqgan.py)."""
    b, h, w, c = x.shape
    if c % num_groups != 0:
        raise ValueError(
            f"GroupNorm: channels ({c}) must be divisible by num_groups "
            f"({num_groups}); pick ch as a multiple of 32 (reference model.py:34)"
        )
    cg = c // num_groups
    xf = x.astype(jnp.float32)
    s1 = xf.mean(axis=(1, 2))  # [B, C] per-channel means, native layout
    gm = s1.reshape(b, num_groups, cg).mean(axis=2)  # [B, G]
    mean_c = jnp.repeat(gm, cg, axis=1)[:, None, None, :]  # [B, 1, 1, C]
    d = xf - mean_c
    v1 = (d * d).mean(axis=(1, 2))  # [B, C] per-channel second moments
    gv = v1.reshape(b, num_groups, cg).mean(axis=2)  # [B, G]
    inv_c = jnp.repeat(jax.lax.rsqrt(gv + eps), cg, axis=1)[:, None, None, :]
    return ((d * inv_c) * p["weight"] + p["bias"]).astype(x.dtype)


def upsample_nearest2x(x: jnp.ndarray) -> jnp.ndarray:
    """Nearest x2 (reference Upsample, model.py:49-53)."""
    b, h, w, c = x.shape
    x = jnp.repeat(x, 2, axis=1)
    x = jnp.repeat(x, 2, axis=2)
    return x


def downsample_conv(x: jnp.ndarray, p: Params) -> jnp.ndarray:
    """Asymmetric (0,1)x(0,1) zero pad + 3x3 stride-2 VALID conv
    (reference Downsample, model.py:68-72)."""
    return conv2d(x, p, stride=2, padding=((0, 1), (0, 1)))


def init_resnet_block(key, cin: int, cout: int, dtype=jnp.float32) -> Params:
    k1, k2, k3 = jax.random.split(key, 3)
    p: Params = {
        "norm1": _norm_init(cin, dtype),
        "conv1": _conv_init(k1, 3, 3, cin, cout, dtype),
        "norm2": _norm_init(cout, dtype),
        "conv2": _conv_init(k2, 3, 3, cout, cout, dtype),
    }
    if cin != cout:
        p["nin_shortcut"] = _conv_init(k3, 1, 1, cin, cout, dtype)
    return p


def resnet_block(x: jnp.ndarray, p: Params, dropout_rate: float = 0.0, rng=None) -> jnp.ndarray:
    """GroupNorm -> swish -> 3x3 conv, twice, + (1x1-projected) skip
    (reference ResnetBlock, model.py:117-137; temb unused: temb_channels=0)."""
    h = group_norm(x, p["norm1"])
    h = swish(h)
    h = conv2d(h, p["conv1"])
    h = group_norm(h, p["norm2"])
    h = swish(h)
    if dropout_rate > 0.0 and rng is not None:
        keep = jax.random.bernoulli(rng, 1.0 - dropout_rate, h.shape)
        h = jnp.where(keep, h / (1.0 - dropout_rate), 0.0)
    h = conv2d(h, p["conv2"])
    if "nin_shortcut" in p:
        x = conv2d(x, p["nin_shortcut"])
    return x + h


def init_attn_block(key, c: int, dtype=jnp.float32) -> Params:
    kq, kk, kv, kp = jax.random.split(key, 4)
    return {
        "norm": _norm_init(c, dtype),
        "q": _conv_init(kq, 1, 1, c, c, dtype),
        "k": _conv_init(kk, 1, 1, c, c, dtype),
        "v": _conv_init(kv, 1, 1, c, c, dtype),
        "proj_out": _conv_init(kp, 1, 1, c, c, dtype),
    }


def _use_flash_attention(override=None) -> bool:
    """Pallas flash attention selection: SGAM_TPU_FLASH_ATTN=0/1 wins, then
    the caller's override (DDConfig.flash_attention — the batched inference
    pipeline sets True), else off.

    Measured on v5e at S=4096/C=256 (NOTES.md round 4): at batch 1 XLA's
    fused attention wins end-to-end (96.7 vs 88.2 frames/sec — each
    flash q-tile program re-streams the full K/V, which at B=1 costs more
    than the 64 MB [S, S] logits round-trip it saves). At batch 8 the
    naive path's [B, S, S] einsums blow up to 9x the per-scene time of
    batch 1 (1.46 ms vs 0.16 ms per scene per step) and flash attention
    flips the batched unroll from LOSING to single-scene (89.0 aggregate)
    to BEATING it (106.4 vs 96.7). The kernel carries a custom
    FlashAttention VJP, so training can enable it as well (see the
    measured decision in bench.py/NOTES.md round 4)."""
    import os

    flag = os.environ.get("SGAM_TPU_FLASH_ATTN")
    if flag is not None:
        return flag not in ("0", "false", "False")
    if override is not None:
        return bool(override)
    return False


def attn_block(x: jnp.ndarray, p: Params, flash=None) -> jnp.ndarray:
    """Single-head full self-attention over H*W tokens
    (reference AttnBlock, model.py:168-192).

    At 256^2 input this runs at 64x64 spatial (4096 tokens, C=256): the
    attention matrix is [B, 4096, 4096]. On TPU the Pallas flash-attention
    kernel (ops/attention_pallas.py) streams K/V tiles instead of
    materializing it; `flash` (from DDConfig.flash_attention) selects it —
    see _use_flash_attention for the measured batch-1/batch-8 defaults.
    """
    b, h, w, c = x.shape
    hn = group_norm(x, p["norm"])
    q = conv2d(hn, p["q"]).reshape(b, h * w, c)
    k = conv2d(hn, p["k"]).reshape(b, h * w, c)
    v = conv2d(hn, p["v"]).reshape(b, h * w, c)
    if _use_flash_attention(flash):
        from sgam_neurips22_tpu.ops.attention_pallas import flash_attention

        # off-TPU the kernel runs in Pallas interpret mode (slow but
        # correct) so flash-selected configs stay testable on CPU
        out = flash_attention(
            q, k, v, interpret=jax.default_backend() != "tpu"
        ).reshape(b, h, w, c)
    else:
        scale = 1.0 / math.sqrt(c)
        logits = jnp.einsum(
            "bqc,bkc->bqk", q, k, preferred_element_type=jnp.float32
        ) * scale
        weights = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        out = jnp.einsum("bqk,bkc->bqc", weights, v).reshape(b, h, w, c)
    out = conv2d(out, p["proj_out"])
    return x + out


__all__ = [
    "Params",
    "swish",
    "conv2d",
    "group_norm",
    "upsample_nearest2x",
    "downsample_conv",
    "resnet_block",
    "attn_block",
    "init_resnet_block",
    "init_attn_block",
    "_conv_init",
    "_norm_init",
]

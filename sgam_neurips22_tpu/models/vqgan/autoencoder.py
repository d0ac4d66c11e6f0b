"""VQGAN Encoder/Decoder (taming architecture), functional NHWC JAX.

Rebuild of reference modules/diffusionmodules/model.py: Encoder (:342-433)
and Decoder (:437-539). With the shipped configs
(ddconfig: ch=128, ch_mult=[1,1,2,2,4], num_res_blocks=2,
attn_resolutions=[16], resolution=64, z_channels=256, double_z=False) a
256x256x4 input maps to a 16x16x256 latent through 4 downsamples, with
attention at the tracked-16 level (=64x64 actual for 256^2 inputs) and in
the mid blocks.

Note: ``resolution`` is the *tracking* resolution used to place attention
blocks, exactly as in the reference — the network itself is fully
convolutional and input-size agnostic.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, List

import jax
import jax.numpy as jnp

from sgam_neurips22_tpu.models.vqgan.nn import (
    Params,
    _conv_init,
    _norm_init,
    attn_block,
    conv2d,
    downsample_conv,
    group_norm,
    init_attn_block,
    init_resnet_block,
    resnet_block,
    swish,
    upsample_nearest2x,
)


@dataclass(frozen=True)
class DDConfig:
    """Mirror of the reference's ddconfig YAML node."""

    ch: int = 128
    out_ch: int = 4
    ch_mult: tuple = (1, 1, 2, 2, 4)
    num_res_blocks: int = 2
    attn_resolutions: tuple = (16,)
    dropout: float = 0.0
    resamp_with_conv: bool = True
    in_channels: int = 4
    resolution: int = 64
    z_channels: int = 256
    double_z: bool = False
    # rematerialize each resolution level on the backward pass
    # (jax.checkpoint): trades ~1 extra forward for O(levels) activation
    # memory instead of O(layers) — the flagship GAN step OOMs at batch 8
    # on one v5e without it. No reference counterpart (torch keeps all
    # activations); numerics are identical.
    remat: bool = False
    # activation dtype through the conv stack ('float32' = reference parity).
    # 'bfloat16' halves the HBM bytes of every 256^2-resolution activation
    # pass — the measured bottleneck of the GAN training step (NOTES.md) —
    # while group_norm statistics stay f32 (nn.group_norm) and the VQ
    # distance/codebook path stays f32 (quantize.codeword_distances).
    compute_dtype: str = "float32"
    # Pallas flash attention in attn_block (None = off / SGAM_TPU_FLASH_ATTN
    # env). The batched inference pipeline sets True (measured win at
    # batch >= 2, see nn._use_flash_attention); differentiable (custom
    # FlashAttention VJP, ops/attention_pallas.py) so training configs may
    # enable it too.
    flash_attention: object = None

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "DDConfig":
        known = {f for f in cls.__dataclass_fields__}
        kw = {k: tuple(v) if isinstance(v, list) else v for k, v in d.items() if k in known}
        return cls(**kw)


# ----------------------------------------------------------------- encoder
def init_encoder(key, cfg: DDConfig, dtype=jnp.float32) -> Params:
    keys = iter(jax.random.split(key, 256))
    p: Params = {"conv_in": _conv_init(next(keys), 3, 3, cfg.in_channels, cfg.ch, dtype)}
    in_ch_mult = (1,) + tuple(cfg.ch_mult)
    num_res = len(cfg.ch_mult)
    curr_res = cfg.resolution
    down: List[Params] = []
    block_in = cfg.ch
    for i_level in range(num_res):
        level: Params = {"block": [], "attn": []}
        block_in = cfg.ch * in_ch_mult[i_level]
        block_out = cfg.ch * cfg.ch_mult[i_level]
        for _ in range(cfg.num_res_blocks):
            level["block"].append(init_resnet_block(next(keys), block_in, block_out, dtype))
            block_in = block_out
            if curr_res in cfg.attn_resolutions:
                level["attn"].append(init_attn_block(next(keys), block_in, dtype))
        if i_level != num_res - 1:
            level["downsample"] = {"conv": _conv_init(next(keys), 3, 3, block_in, block_in, dtype)}
            curr_res //= 2
        down.append(level)
    p["down"] = down
    p["mid"] = {
        "block_1": init_resnet_block(next(keys), block_in, block_in, dtype),
        "attn_1": init_attn_block(next(keys), block_in, dtype),
        "block_2": init_resnet_block(next(keys), block_in, block_in, dtype),
    }
    out_ch = 2 * cfg.z_channels if cfg.double_z else cfg.z_channels
    p["norm_out"] = _norm_init(block_in, dtype)
    p["conv_out"] = _conv_init(next(keys), 3, 3, block_in, out_ch, dtype)
    return p


def _maybe_remat(fn, cfg: DDConfig):
    """Selective rematerialization: conv outputs (tagged 'conv_out' in
    nn.conv2d) are saved; group-norm/swish/attention intermediates recompute
    on the backward pass. Convs hold ~all the level FLOPs but only ~1/4 of
    its live tensors, so this costs a few percent recompute (vs ~40% for
    full per-level remat) while still fitting the flagship GAN step at the
    reference batch sizes on one v5e."""
    if not cfg.remat:
        return fn
    policy = jax.checkpoint_policies.save_only_these_names("conv_out")
    return jax.checkpoint(fn, policy=policy)


def apply_encoder(p: Params, cfg: DDConfig, x: jnp.ndarray) -> jnp.ndarray:
    """x: [B, H, W, in_channels] -> [B, H/2^k, W/2^k, z_channels]
    (reference Encoder.forward, model.py:405-433)."""
    num_res = len(cfg.ch_mult)
    h = conv2d(x.astype(jnp.dtype(cfg.compute_dtype)), p["conv_in"])

    def level_fn(h, level):
        for i_block in range(cfg.num_res_blocks):
            h = resnet_block(h, level["block"][i_block])
            if level["attn"]:
                h = attn_block(h, level["attn"][i_block], flash=cfg.flash_attention)
        if "downsample" in level:
            h = downsample_conv(h, level["downsample"]["conv"])
        return h

    level_fn = _maybe_remat(level_fn, cfg)
    for i_level in range(num_res):
        h = level_fn(h, p["down"][i_level])
    h = resnet_block(h, p["mid"]["block_1"])
    h = attn_block(h, p["mid"]["attn_1"], flash=cfg.flash_attention)
    h = resnet_block(h, p["mid"]["block_2"])
    h = group_norm(h, p["norm_out"])
    h = swish(h)
    # the latent leaves in f32 regardless of compute dtype: quantization
    # argmin ties are precision-sensitive (SURVEY.md hard part #1)
    return conv2d(h, p["conv_out"]).astype(jnp.float32)


# ----------------------------------------------------------------- decoder
def init_decoder(key, cfg: DDConfig, dtype=jnp.float32) -> Params:
    keys = iter(jax.random.split(key, 256))
    num_res = len(cfg.ch_mult)
    block_in = cfg.ch * cfg.ch_mult[num_res - 1]
    curr_res = cfg.resolution // 2 ** (num_res - 1)
    p: Params = {"conv_in": _conv_init(next(keys), 3, 3, cfg.z_channels, block_in, dtype)}
    p["mid"] = {
        "block_1": init_resnet_block(next(keys), block_in, block_in, dtype),
        "attn_1": init_attn_block(next(keys), block_in, dtype),
        "block_2": init_resnet_block(next(keys), block_in, block_in, dtype),
    }
    up: List[Params] = [None] * num_res  # type: ignore[list-item]
    for i_level in reversed(range(num_res)):
        level: Params = {"block": [], "attn": []}
        block_out = cfg.ch * cfg.ch_mult[i_level]
        for _ in range(cfg.num_res_blocks + 1):
            level["block"].append(init_resnet_block(next(keys), block_in, block_out, dtype))
            block_in = block_out
            if curr_res in cfg.attn_resolutions:
                level["attn"].append(init_attn_block(next(keys), block_in, dtype))
        if i_level != 0:
            level["upsample"] = {"conv": _conv_init(next(keys), 3, 3, block_in, block_in, dtype)}
            curr_res *= 2
        up[i_level] = level
    p["up"] = up
    p["norm_out"] = _norm_init(block_in, dtype)
    p["conv_out"] = _conv_init(next(keys), 3, 3, block_in, cfg.out_ch, dtype)
    return p


def apply_decoder_features(p: Params, cfg: DDConfig, z: jnp.ndarray) -> jnp.ndarray:
    """Decoder up to (and including) the final norm+swish, EXCLUDING conv_out.

    Split out so the adaptive GAN weight (training/losses.py) can take
    gradients w.r.t. the last conv kernel alone without a second full
    backward pass (reference uses autograd.grad on decoder.conv_out.weight,
    vqperceptual.py:65-76).
    """
    num_res = len(cfg.ch_mult)
    h = conv2d(z.astype(jnp.dtype(cfg.compute_dtype)), p["conv_in"])
    h = resnet_block(h, p["mid"]["block_1"])
    h = attn_block(h, p["mid"]["attn_1"], flash=cfg.flash_attention)
    h = resnet_block(h, p["mid"]["block_2"])

    def level_fn(h, level):
        for i_block in range(cfg.num_res_blocks + 1):
            h = resnet_block(h, level["block"][i_block])
            if level["attn"]:
                h = attn_block(h, level["attn"][i_block], flash=cfg.flash_attention)
        if "upsample" in level:
            h = upsample_nearest2x(h)
            h = conv2d(h, level["upsample"]["conv"])
        return h

    level_fn = _maybe_remat(level_fn, cfg)
    for i_level in reversed(range(num_res)):
        h = level_fn(h, p["up"][i_level])
    h = group_norm(h, p["norm_out"])
    # back to f32 before conv_out: the adaptive GAN weight differentiates
    # w.r.t. the last kernel alone (training/losses.py) in f32
    return swish(h).astype(jnp.float32)


def apply_decoder(p: Params, cfg: DDConfig, z: jnp.ndarray) -> jnp.ndarray:
    """z: [B, h, w, z_channels] -> [B, H, W, out_ch]
    (reference Decoder.forward, model.py:508-539)."""
    h = apply_decoder_features(p, cfg, z)
    return conv2d(h, p["conv_out"])

"""VQModel: the generative sensing module (functional JAX).

Rebuild of reference sgam/generative_sensing_module/model.py `VQModel`
(:18-472) minus the Lightning harness (training steps live in
training/train_step.py, conditioning assembly in models/conditioning.py).

Parameter tree layout mirrors the torch state_dict:
  conv_in (optional 5->4 1x1, folds the extrapolation mask into the input,
           reference model.py:53-54)
  encoder / decoder (taming backbone, autoencoder.py)
  quant_conv / post_quant_conv (1x1, reference model.py:62-63)
  quantize.embedding ([n_embed, embed_dim] codebook)
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from sgam_neurips22_tpu.models.vqgan.autoencoder import (
    DDConfig,
    apply_decoder,
    apply_decoder_features,
    apply_encoder,
    init_decoder,
    init_encoder,
)
from sgam_neurips22_tpu.models.vqgan.nn import Params, _conv_init, conv2d
from sgam_neurips22_tpu.models.vqgan.quantize import (
    QuantizeResult,
    TopKSampleResult,
    init_codebook,
    quantize,
    quantize_topk,
)


@dataclass(frozen=True)
class VQModelConfig:
    ddconfig: DDConfig
    n_embed: int
    embed_dim: int
    phase: str = "codebook"  # 'codebook' | 'conditional_generation'
    use_extrapolation_mask: bool = True
    vq_step_threshold: int = 0
    beta: float = 0.25
    dataset: str = "clevr-infinite"
    depth_range: Optional[tuple] = None

    @classmethod
    def from_config(cls, model_params: dict, data_params: dict | None = None) -> "VQModelConfig":
        """Build from a reference-schema YAML node (model.params + data.params)."""
        data_params = data_params or {}
        return cls(
            ddconfig=DDConfig.from_dict(dict(model_params["ddconfig"])),
            n_embed=model_params["n_embed"],
            embed_dim=model_params["embed_dim"],
            phase=model_params.get("phase", "codebook"),
            use_extrapolation_mask=model_params.get("use_extrapolation_mask", True),
            vq_step_threshold=model_params.get("vq_step_threshold", 0),
            dataset=data_params.get("dataset", "clevr-infinite"),
            depth_range=tuple(data_params["depth_range"]) if "depth_range" in data_params else None,
        )


class ForwardResult(NamedTuple):
    xrec: jnp.ndarray  # [B, H, W, 4] or [B, S, H, W, 4] with topk sampling
    qloss: jnp.ndarray  # scalar codebook loss (0 when pre-VQ or topk)
    indices: Optional[jnp.ndarray]  # [B, h, w] or [B, S, h, w]
    pre_quant: jnp.ndarray  # [B, h, w, D]
    quant: jnp.ndarray  # same shape family as xrec's latents


@partial(jax.jit, static_argnames=("cfg", "dtype"))
def init_vqmodel(key: jax.Array, cfg: VQModelConfig, dtype=jnp.float32) -> Params:
    k0, k1, k2, k3, k4, k5 = jax.random.split(key, 6)
    p: Params = {}
    if cfg.use_extrapolation_mask:
        p["conv_in"] = _conv_init(k0, 1, 1, cfg.ddconfig.in_channels + 1, cfg.ddconfig.in_channels, dtype)
    p["encoder"] = init_encoder(k1, cfg.ddconfig, dtype)
    p["decoder"] = init_decoder(k2, cfg.ddconfig, dtype)
    p["quant_conv"] = _conv_init(k3, 1, 1, cfg.ddconfig.z_channels, cfg.embed_dim, dtype)
    p["post_quant_conv"] = _conv_init(k4, 1, 1, cfg.embed_dim, cfg.ddconfig.z_channels, dtype)
    p["quantize"] = {"embedding": init_codebook(k5, cfg.n_embed, cfg.embed_dim, dtype)}
    return p


def _fold_mask(
    params: Params,
    cfg: VQModelConfig,
    x: jnp.ndarray,
    extrapolation_mask: Optional[jnp.ndarray],
) -> jnp.ndarray:
    """Concat the mask channel and apply conv_in (reference model.py:107-113;
    zeros when no mask is given)."""
    if not cfg.use_extrapolation_mask:
        return x
    if extrapolation_mask is None:
        m = jnp.zeros((*x.shape[:3], 1), x.dtype)
    else:
        m = extrapolation_mask.astype(x.dtype)
        if m.ndim == 3:
            m = m[..., None]
    return conv2d(jnp.concatenate([x, m], axis=-1), params["conv_in"])


def encode_prequant(
    params: Params,
    cfg: VQModelConfig,
    x: jnp.ndarray,
    extrapolation_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """conv_in -> encoder -> quant_conv (reference model.py:106-116)."""
    h = _fold_mask(params, cfg, x, extrapolation_mask)
    h = apply_encoder(params["encoder"], cfg.ddconfig, h)
    return conv2d(h, params["quant_conv"])


def decode(params: Params, cfg: VQModelConfig, quant: jnp.ndarray) -> jnp.ndarray:
    """post_quant_conv -> decoder (reference model.py:131-134)."""
    h = conv2d(quant, params["post_quant_conv"])
    return apply_decoder(params["decoder"], cfg.ddconfig, h)


def decode_features(params: Params, cfg: VQModelConfig, quant: jnp.ndarray) -> jnp.ndarray:
    """Decoder features before the final conv_out (for the adaptive GAN
    weight; see autoencoder.apply_decoder_features)."""
    h = conv2d(quant, params["post_quant_conv"])
    return apply_decoder_features(params["decoder"], cfg.ddconfig, h)


def decode_code(params: Params, cfg: VQModelConfig, indices: jnp.ndarray) -> jnp.ndarray:
    """Indices -> image (reference model.py:136-139)."""
    quant = params["quantize"]["embedding"][indices]
    return decode(params, cfg, quant)


def forward(
    params: Params,
    cfg: VQModelConfig,
    x: jnp.ndarray,
    extrapolation_mask: Optional[jnp.ndarray] = None,
    use_vq: bool = True,
    topk: Optional[int] = None,
    rng: Optional[jax.Array] = None,
    sample_number: int = 1,
    encoding_indices: Optional[jnp.ndarray] = None,
    topk_position0_bug: bool = False,
) -> ForwardResult:
    """Full encode -> (quantize | sample) -> decode (reference model.py:141-167).

    With ``topk`` set, decodes each of ``sample_number`` sampled latents
    (vmapped rather than the reference's Python loop, model.py:157-159) and
    returns xrec with a leading sample axis after batch: [B, S, H, W, 4].
    ``topk_position0_bug`` opts into the reference's position-0 sampling bug
    for capability-exact topk>1 unrolls (see quantize.quantize_topk).
    """
    pre_quant = encode_prequant(params, cfg, x, extrapolation_mask)
    codebook = params["quantize"]["embedding"]

    if not use_vq:
        # pre-VQ passthrough while global_step < vq_step_threshold
        # (reference model.py:117-118,144-147)
        xrec = decode(params, cfg, pre_quant)
        return ForwardResult(xrec, jnp.zeros((), pre_quant.dtype), None, pre_quant, pre_quant)

    if topk is None:
        q: QuantizeResult = quantize(codebook, pre_quant, cfg.beta, encoding_indices)
        xrec = decode(params, cfg, q.z_q)
        return ForwardResult(xrec, q.loss, q.indices, pre_quant, q.z_q)

    if rng is None:
        raise ValueError("topk sampling requires an rng key")
    s: TopKSampleResult = quantize_topk(
        codebook, pre_quant, rng, topk, sample_number, extrapolation_mask,
        position0_bug=topk_position0_bug,
    )
    xrec = jax.vmap(lambda zq: decode(params, cfg, zq), in_axes=1, out_axes=1)(s.z_q)
    return ForwardResult(xrec, jnp.zeros((), pre_quant.dtype), s.indices, pre_quant, s.z_q)


def get_last_layer(params: Params) -> jnp.ndarray:
    """decoder.conv_out.weight, the anchor for the adaptive GAN weight
    (reference model.py:437-438)."""
    return params["decoder"]["conv_out"]["weight"]

"""VQ-LPIPS-GAN loss (generator + discriminator sides).

Rebuild of reference modules/losses/vqperceptual.py
`VQLPIPSWithDiscriminator` (:34-137): L1 reconstruction over all 4 channels
+ LPIPS on RGB, non-saturating generator loss -E[D(recon)] with the
*adaptive* weight ||grad nll|| / ||grad g|| measured at the decoder's final
conv kernel (:65-76), hinge (or vanilla) discriminator loss gated by a
global-step threshold (`adopt_weight`, :14), and the codebook loss term.

The adaptive weight is computed with two cheap `jax.grad`s through the
final 3x3 conv only (decoder features stop-gradiented) — mathematically
identical to the reference's `autograd.grad(..., decoder.conv_out.weight)`
because that kernel only affects the losses through the final conv, but it
avoids two full backward passes through the decoder.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from sgam_neurips22_tpu.models.vqgan.nn import conv2d
from sgam_neurips22_tpu.training.discriminator import DiscConfig, apply_discriminator
from sgam_neurips22_tpu.training.lpips import lpips


@dataclass(frozen=True)
class LossConfig:
    disc_start: int = 10_000
    codebook_weight: float = 1.0
    pixelloss_weight: float = 1.0
    disc_num_layers: int = 3
    disc_in_channels: int = 4
    disc_factor: float = 1.0
    disc_weight: float = 0.8
    perceptual_weight: float = 1.0
    disc_ndf: int = 64
    disc_loss: str = "hinge"
    use_discriminative_loss: bool = True
    kernel_width: int = 4

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "LossConfig":
        known = set(cls.__dataclass_fields__)
        return cls(**{k: v for k, v in d.items() if k in known})

    @property
    def disc_config(self) -> DiscConfig:
        return DiscConfig(
            input_nc=self.disc_in_channels,
            ndf=self.disc_ndf,
            n_layers=self.disc_num_layers,
            kernel_width=self.kernel_width,
        )


def adopt_weight(weight: float, global_step: jnp.ndarray, threshold: int) -> jnp.ndarray:
    """0 before `threshold` steps (reference vqperceptual.py:14-17)."""
    return jnp.where(global_step < threshold, 0.0, weight)


def hinge_d_loss(logits_real: jnp.ndarray, logits_fake: jnp.ndarray) -> jnp.ndarray:
    return 0.5 * (
        jnp.mean(jax.nn.relu(1.0 - logits_real))
        + jnp.mean(jax.nn.relu(1.0 + logits_fake))
    )


def vanilla_d_loss(logits_real: jnp.ndarray, logits_fake: jnp.ndarray) -> jnp.ndarray:
    return 0.5 * (
        jnp.mean(jax.nn.softplus(-logits_real))
        + jnp.mean(jax.nn.softplus(logits_fake))
    )


def _nll(x_dst: jnp.ndarray, xrec: jnp.ndarray, lpips_params, cfg: LossConfig):
    """mean(|x - xrec| + w_p * LPIPS(rgb)) (reference vqperceptual.py:80-89).

    Returns (nll, rec_l1_mean, p_loss_mean)."""
    rec = jnp.abs(x_dst - xrec)
    if cfg.perceptual_weight > 0 and lpips_params is not None:
        p = lpips(lpips_params, x_dst[..., :3], xrec[..., :3])  # [B,1,1,1]
        # the logged rec_loss IS nll: the reference logs it AFTER adding
        # the perceptual term (:83)
        nll = jnp.mean(rec + cfg.perceptual_weight * p)
        return nll, nll, jnp.mean(p)
    nll = jnp.mean(rec)
    return nll, nll, jnp.zeros((), rec.dtype)


def generator_loss(
    x_dst: jnp.ndarray,
    h_pre: jnp.ndarray,
    conv_out_params: Dict[str, jnp.ndarray],
    qloss: jnp.ndarray,
    global_step: jnp.ndarray,
    disc_params,
    disc_state,
    lpips_params,
    cfg: LossConfig,
) -> Tuple[jnp.ndarray, jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Optimizer-0 (autoencoder) loss (reference vqperceptual.py:92-119).

    Args:
      h_pre: decoder features before the final conv (models.decode_features).
      conv_out_params: {'weight','bias'} of decoder.conv_out — the adaptive
        weight anchor (reference model.py:437-438).
    Returns:
      (loss, xrec, log dict).
    """
    xrec = conv2d(h_pre, conv_out_params)
    nll, rec_log, p_log = _nll(x_dst, xrec, lpips_params, cfg)

    if cfg.use_discriminative_loss:
        logits_fake, _ = apply_discriminator(
            disc_params, disc_state, xrec, cfg.disc_config, train=True
        )
        g_loss = -jnp.mean(logits_fake)

        # Adaptive weight: gradients w.r.t. conv_out.weight only, decoder
        # features held fixed (see module docstring).
        h_sg = jax.lax.stop_gradient(h_pre)
        b_sg = jax.lax.stop_gradient(conv_out_params["bias"])

        def nll_of_w(w):
            xr = conv2d(h_sg, {"weight": w, "bias": b_sg})
            return _nll(x_dst, xr, lpips_params, cfg)[0]

        def g_of_w(w):
            xr = conv2d(h_sg, {"weight": w, "bias": b_sg})
            lf, _ = apply_discriminator(
                jax.lax.stop_gradient(disc_params), disc_state, xr,
                cfg.disc_config, train=True,
            )
            return -jnp.mean(lf)

        w = conv_out_params["weight"]
        nll_grad = jax.grad(nll_of_w)(jax.lax.stop_gradient(w))
        g_grad = jax.grad(g_of_w)(jax.lax.stop_gradient(w))
        d_weight = jnp.linalg.norm(nll_grad.ravel()) / (
            jnp.linalg.norm(g_grad.ravel()) + 1e-4
        )
        d_weight = jnp.clip(d_weight, 0.0, 1e4) * cfg.disc_weight
        d_weight = jax.lax.stop_gradient(d_weight)
    else:
        g_loss = jnp.zeros((), xrec.dtype)
        d_weight = jnp.zeros((), xrec.dtype)

    disc_factor = adopt_weight(cfg.disc_factor, global_step, cfg.disc_start)
    loss = nll + d_weight * disc_factor * g_loss + cfg.codebook_weight * jnp.mean(qloss)
    log = {
        "total_loss": loss,
        "quant_loss": jnp.mean(qloss),
        "rec_loss": rec_log,
        "p_loss": p_log,
        "d_weight": d_weight,
        "disc_factor": disc_factor,
        "g_loss": g_loss,
    }
    return loss, xrec, log


def discriminator_loss(
    x_dst: jnp.ndarray,
    xrec: jnp.ndarray,
    global_step: jnp.ndarray,
    disc_params,
    disc_state,
    cfg: LossConfig,
) -> Tuple[jnp.ndarray, Any, Dict[str, jnp.ndarray]]:
    """Optimizer-1 (discriminator) loss (reference vqperceptual.py:121-137).
    Returns (loss, new_disc_state, log)."""
    logits_real, st1 = apply_discriminator(
        disc_params, disc_state, jax.lax.stop_gradient(x_dst),
        cfg.disc_config, train=True,
    )
    logits_fake, st2 = apply_discriminator(
        disc_params, st1, jax.lax.stop_gradient(xrec),
        cfg.disc_config, train=True,
    )
    d_fn = hinge_d_loss if cfg.disc_loss == "hinge" else vanilla_d_loss
    disc_factor = adopt_weight(cfg.disc_factor, global_step, cfg.disc_start)
    d_loss = disc_factor * d_fn(logits_real, logits_fake)
    log = {
        "disc_loss": d_loss,
        "logits_real": jnp.mean(logits_real),
        "logits_fake": jnp.mean(logits_fake),
    }
    return d_loss, st2, log

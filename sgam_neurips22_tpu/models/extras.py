"""Small auxiliary modules from the reference inventory.

These are NOT used by the main SGAM path (SURVEY.md section 2.5 marks them
"unused by the main path") but exist in the reference as part of its module
surface; they are provided here for API completeness:

- `positional_embedder`: NeRF-style sin/cos embedding
  (reference modules/util.py:135-182 `Embedder`).
- `kld_loss`: KL(N(mu, sigma) || N(0, 1))
  (reference modules/losses/kld.py:6).
- `bce_loss` / `bce_loss_with_quant`: segmentation losses
  (reference modules/losses/segmentation.py:5,11).
- `Labelator` / `SOSProvider`: conditioning-stage stubs for class labels /
  start-of-sequence tokens (reference modules/util.py:103-130).
- `CoordStage`: fake-VQ interface over coordinate maps
  (reference modules/misc/coord.py:3-31).
- `DummyCondStage` (reference modules/dummy_cond_stage.py:4-22).

chamfer distance (reference modules/losses/chamfer_distance.py needs
pytorch3d) is provided as a pure-JAX O(N*M) implementation.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


def reparameterize(rng: jax.Array, mu: jnp.ndarray, logvar: jnp.ndarray) -> jnp.ndarray:
    """VAE reparameterization trick (reference model.py:126-129, unused by
    the main VQ path)."""
    std = jnp.exp(0.5 * logvar)
    return mu + std * jax.random.normal(rng, std.shape, std.dtype)


def positional_embedder(num_freqs: int, include_input: bool = True, log_sampling: bool = True):
    """Returns (embed_fn, out_dim_multiplier_per_channel)."""
    if log_sampling:
        freqs = 2.0 ** jnp.arange(num_freqs)
    else:
        freqs = jnp.linspace(1.0, 2.0 ** (num_freqs - 1), num_freqs)

    def embed(x: jnp.ndarray) -> jnp.ndarray:
        parts = [x] if include_input else []
        for f in freqs:
            parts.append(jnp.sin(x * f))
            parts.append(jnp.cos(x * f))
        return jnp.concatenate(parts, axis=-1)

    mult = (1 if include_input else 0) + 2 * num_freqs
    return embed, mult


def kld_loss(mu: jnp.ndarray, logvar: jnp.ndarray) -> jnp.ndarray:
    """-0.5 * sum(1 + logvar - mu^2 - e^logvar), batch-meaned."""
    return jnp.mean(
        -0.5 * jnp.sum(1 + logvar - mu**2 - jnp.exp(logvar), axis=-1)
    )


def bce_loss(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Sigmoid BCE with logits, mean-reduced."""
    return jnp.mean(
        jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )


def bce_loss_with_quant(
    logits: jnp.ndarray, targets: jnp.ndarray, qloss: jnp.ndarray,
    codebook_weight: float = 1.0,
):
    loss = bce_loss(logits, targets)
    return loss + codebook_weight * jnp.mean(qloss), {
        "bce_loss": loss,
        "quant_loss": jnp.mean(qloss),
    }


def chamfer_distance(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Symmetric chamfer distance between point sets [N, 3] and [M, 3]."""
    d2 = jnp.sum((a[:, None, :] - b[None, :, :]) ** 2, axis=-1)
    return jnp.mean(jnp.min(d2, axis=1)) + jnp.mean(jnp.min(d2, axis=0))


class CondStageResult(NamedTuple):
    quant: jnp.ndarray
    loss: jnp.ndarray
    indices: jnp.ndarray


def labelator(labels: jnp.ndarray, n_classes: int) -> CondStageResult:
    """Class label -> itself as a 'code' (reference Labelator)."""
    idx = labels.astype(jnp.int32).reshape(labels.shape[0], -1)
    return CondStageResult(idx.astype(jnp.float32), jnp.zeros(()), idx)


def sos_provider(batch_size: int, sos_token: int) -> CondStageResult:
    """Constant start-of-sequence token (reference SOSProvider)."""
    idx = jnp.full((batch_size, 1), sos_token, jnp.int32)
    return CondStageResult(idx.astype(jnp.float32), jnp.zeros(()), idx)


def coord_stage(coords: jnp.ndarray, n_embed: int) -> CondStageResult:
    """Quantize [0,1] coordinate maps to n_embed integer buckets
    (reference CoordStage.encode)."""
    idx = jnp.clip((coords * n_embed).astype(jnp.int32), 0, n_embed - 1)
    quant = (idx.astype(jnp.float32) + 0.5) / n_embed
    return CondStageResult(quant, jnp.zeros(()), idx)


def dummy_cond_stage(x: jnp.ndarray) -> CondStageResult:
    """Identity conditioning (reference DummyCondStage)."""
    return CondStageResult(x, jnp.zeros(()), jnp.zeros(x.shape[:1], jnp.int32))

"""Vector quantization: nearest-codeword VQ + top-k stochastic sampling.

Rebuild of reference modules/vqvae/quantize.py `VectorQuantizer2`
(:213-381): L2-nearest codeword via the expanded-distance matmul (MXU
friendly: one [BHW, D] x [D, K] matmul dominates), straight-through
estimator, legacy commitment loss (beta on the second term, :296-301),
`update_codebook` for online k-means refresh (:321-325), and
`get_multiple_codewords` top-k categorical sampling (:344-381).

Known reference bug (SURVEY.md section 2.5): the reference samples every
latent position from position 0's top-k distribution
(`min_encoding_dist[0]`, quantize.py:358). Here each position samples from
its own distribution; `topk=1` is deterministic argmin in both codebases so
the parity mode (the inference CLI default) is unaffected.

A fused Pallas distance+argmin kernel for large codebooks lives in
ops/vq_pallas.py, selectable via SGAM_TPU_VQ_PALLAS=1 (see
`_use_vq_pallas` for the measured default); this module is the XLA
reference implementation.
"""
from __future__ import annotations

import os
from typing import NamedTuple

import jax
import jax.numpy as jnp


class QuantizeResult(NamedTuple):
    z_q: jnp.ndarray  # [B, h, w, D] straight-through quantized latents
    loss: jnp.ndarray  # scalar codebook + commitment loss
    indices: jnp.ndarray  # [B, h, w] int32 codeword ids


def init_codebook(key, n_embed: int, embed_dim: int, dtype=jnp.float32) -> jnp.ndarray:
    """uniform(-1/n, 1/n) init (reference quantize.py:232)."""
    return jax.random.uniform(
        key, (n_embed, embed_dim), dtype, -1.0 / n_embed, 1.0 / n_embed
    )


def codeword_distances(z_flat: jnp.ndarray, codebook: jnp.ndarray) -> jnp.ndarray:
    """Squared L2 distances [P, K] = |z|^2 + |e|^2 - 2 z.e
    (reference quantize.py:285-288). fp32 accumulation — bf16 matmul would
    break argmin ties."""
    z32 = z_flat.astype(jnp.float32)
    e32 = codebook.astype(jnp.float32)
    return (
        jnp.sum(z32**2, axis=1, keepdims=True)
        + jnp.sum(e32**2, axis=1)[None, :]
        # full f32 matmul: TPU's default bf16 MXU passes would perturb
        # argmin ties vs the torch reference (SURVEY.md hard part #1)
        - 2.0 * jnp.dot(
            z32, e32.T,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    )


def _use_vq_pallas() -> bool:
    """Opt-in Pallas fused nearest-codeword search (SGAM_TPU_VQ_PALLAS=1).

    Measured on v5e (tools/bench_vq_pallas.py, NOTES.md round 4): indices
    match the XLA path 1.0000 at every production shape (the kernel's
    bf16x3 contraction reproduces XLA's HIGHEST-precision algorithm), and
    the op itself is ~1.5x faster at the flagship inference shape (P=256,
    K=16384, D=256: ~1.0 ms vs ~1.5 ms) with O(P) instead of O(P*K) HBM
    traffic. But the op is ~1 ms inside a ~10 ms frame, so the end-to-end
    flythrough is unchanged within noise — it stays opt-in rather than
    default (off-TPU it would run in slow interpret mode, and default-on
    would put an unexercised Mosaic compile in every user's first run)."""
    flag = os.environ.get("SGAM_TPU_VQ_PALLAS")
    if flag is not None:
        return flag not in ("0", "false", "False")
    return False


def nearest_codeword_indices(z_flat: jnp.ndarray, codebook: jnp.ndarray) -> jnp.ndarray:
    """argmin_k ||z - e_k||^2 per row: the production nearest-codeword
    search (reference quantize.py:285-289). Dispatches to the fused Pallas
    kernel on TPU when SGAM_TPU_VQ_PALLAS=1, else one XLA distance matmul
    + argmin."""
    if _use_vq_pallas():
        from sgam_neurips22_tpu.ops.vq_pallas import nearest_codeword

        # indices are integer/non-differentiable (exactly like argmin), but
        # quantize() runs inside the differentiated training forward
        # (model.py) and pallas_call has no VJP rule — stop the tangents
        # here so jax.grad works with the flag on
        z_flat = jax.lax.stop_gradient(z_flat)
        codebook = jax.lax.stop_gradient(codebook)
        # off-TPU the kernel runs in Pallas interpret mode (slow but
        # correct) so the flag stays testable on the CPU mesh
        idx, _ = nearest_codeword(
            z_flat, codebook, interpret=jax.default_backend() != "tpu"
        )
        return idx
    return jnp.argmin(codeword_distances(z_flat, codebook), axis=1).astype(jnp.int32)


def quantize(
    codebook: jnp.ndarray,
    z: jnp.ndarray,
    beta: float = 0.25,
    encoding_indices: jnp.ndarray | None = None,
) -> QuantizeResult:
    """Standard straight-through VQ (reference quantize.py:275-319).

    Args:
      codebook: [K, D]; z: [B, h, w, D].
      encoding_indices: optional [B, h, w] to bypass the nearest search.
    """
    b, h, w, d = z.shape
    if encoding_indices is None:
        indices = nearest_codeword_indices(z.reshape(-1, d), codebook).reshape(b, h, w)
    else:
        indices = encoding_indices
    z_q = codebook[indices].astype(z.dtype)
    # legacy loss form (quantize.py:300-301): beta multiplies the
    # codebook-update term.
    loss = jnp.mean((jax.lax.stop_gradient(z_q) - z) ** 2) + beta * jnp.mean(
        (z_q - jax.lax.stop_gradient(z)) ** 2
    )
    z_q = z + jax.lax.stop_gradient(z_q - z)
    return QuantizeResult(z_q=z_q, loss=loss, indices=indices.astype(jnp.int32))


def resize_mask_nearest(mask: jnp.ndarray, h_out: int, w_out: int) -> jnp.ndarray:
    """Nearest-neighbor mask resize matching torch F.interpolate(mode='nearest')
    (reference quantize.py:345 resizes the extrapolation mask to the latent
    grid): out[i] = in[floor(i * H_in / H_out)]."""
    b, h_in, w_in = mask.shape[:3]
    ys = jnp.floor(jnp.arange(h_out) * (h_in / h_out)).astype(jnp.int32)
    xs = jnp.floor(jnp.arange(w_out) * (w_in / w_out)).astype(jnp.int32)
    return mask[:, ys][:, :, xs]


class TopKSampleResult(NamedTuple):
    z_q: jnp.ndarray  # [B, S, h, w, D]
    indices: jnp.ndarray  # [B, S, h, w]


def quantize_topk(
    codebook: jnp.ndarray,
    z: jnp.ndarray,
    rng: jax.Array,
    topk: int,
    sample_number: int = 1,
    extrapolation_mask: jnp.ndarray | None = None,
    temperature: float = 1.0,
    position0_bug: bool = False,
) -> TopKSampleResult:
    """Top-k stochastic codeword sampling (reference quantize.py:344-381).

    Per latent position: take the k nearest codewords, sample
    ``sample_number`` draws from softmax(-d/T) over them — except positions
    that are *visible* in the warped conditioning (extrapolation_mask False),
    which deterministically take the nearest codeword (reference :364-367).
    One fused distance matmul + top_k + categorical; no Python loops.

    Args:
      z: [B, h, w, D] pre-quantized latents.
      extrapolation_mask: [B, H, W] or [B, H, W, 1] bool at image resolution
        (True = unseen region, free to sample).
      position0_bug: opt-in bug-compatible mode reproducing the reference's
        `min_encoding_dist[0]` indexing (quantize.py:358): every position
        draws its top-k SLOT from position 0's softmax distribution (but
        still maps it through its own top-k codeword ids), and the
        temperature argument is ignored (the reference hardcodes
        temperature=1 at :353 and never uses its `temp` parameter). Default
        False = each position samples from its own distribution.
    """
    b, h, w, d = z.shape
    if topk == 1:
        # single-candidate distribution == argmin: skip the (expensive)
        # top_k sort over K and the categorical draw entirely. This is the
        # inference CLI's default parity mode (reference
        # inference_pipeline.py:24 topk=1).
        idx = nearest_codeword_indices(z.reshape(-1, d), codebook)
        sampled = jnp.broadcast_to(idx[:, None], (idx.shape[0], sample_number))
        sampled = sampled.reshape(b, h, w, sample_number)
        z_q = jnp.moveaxis(codebook[sampled].astype(z.dtype), 3, 1)
        return TopKSampleResult(z_q=z_q, indices=jnp.moveaxis(sampled, 3, 1).astype(jnp.int32))
    dist = codeword_distances(z.reshape(-1, d), codebook)  # [P, K]
    neg_topk, top_idx = jax.lax.top_k(-dist, topk)  # [P, k] nearest first
    if position0_bug:
        # reference :353,:358: temperature fixed at 1; every position's slot
        # drawn (independently) from position 0's distribution
        logits = jnp.broadcast_to(neg_topk[:1], neg_topk.shape)
    else:
        logits = neg_topk / temperature
    draws = jax.random.categorical(
        rng, logits[:, None, :], axis=-1, shape=(b * h * w, sample_number)
    )  # [P, S] positions in 0..k-1
    sampled = jnp.take_along_axis(top_idx, draws, axis=1)  # [P, S]

    if extrapolation_mask is not None:
        m = extrapolation_mask
        if m.ndim == 4:
            m = m[..., 0]
        m = resize_mask_nearest(m.astype(jnp.float32), h, w) > 0.0
        free = m.reshape(-1, 1)  # True = sample; False = take argmin
        sampled = jnp.where(free, sampled, top_idx[:, :1])

    sampled = sampled.reshape(b, h, w, sample_number)
    z_q = codebook[sampled].astype(z.dtype)  # [B, h, w, S, D]
    z_q = jnp.moveaxis(z_q, 3, 1)  # [B, S, h, w, D]
    indices = jnp.moveaxis(sampled, 3, 1).astype(jnp.int32)
    return TopKSampleResult(z_q=z_q, indices=indices)


def load_codebook_init(path: str, n_embed: int, embed_dim: int) -> jnp.ndarray:
    """Codebook initialization from a k-means .npy file (reference
    quantize.py:231-235 `kmean_init_codebook_path`)."""
    import numpy as np

    kd = np.load(path)
    if kd.shape != (n_embed, embed_dim):
        raise ValueError(
            f"codebook init {path} has shape {kd.shape}, expected {(n_embed, embed_dim)}"
        )
    return jnp.asarray(kd.astype(np.float32))


def remap_to_used(
    indices: jnp.ndarray, used: jnp.ndarray, rng: jax.Array | None = None,
    unknown_index: int | str = "random",
) -> jnp.ndarray:
    """Map full-codebook indices onto a reduced `used` subset (reference
    quantize.py:251-263): positions whose code is not in `used` get a random
    used-index (or a fixed `unknown_index`)."""
    n_used = used.shape[0]
    match = indices[..., None] == used  # [..., n_used]
    new = jnp.argmax(match, axis=-1)
    unknown = ~jnp.any(match, axis=-1)
    if unknown_index == "random":
        if rng is None:
            raise ValueError("unknown_index='random' needs an rng")
        rand = jax.random.randint(rng, indices.shape, 0, n_used)
        return jnp.where(unknown, rand, new)
    return jnp.where(unknown, int(unknown_index), new)


def unmap_to_all(indices: jnp.ndarray, used: jnp.ndarray) -> jnp.ndarray:
    """Inverse of remap_to_used (reference quantize.py:265-273); indices
    beyond the used table clamp to entry 0."""
    safe = jnp.where(indices >= used.shape[0], 0, indices)
    return used[safe]


def embed_code(codebook: jnp.ndarray, indices: jnp.ndarray) -> jnp.ndarray:
    """Codeword lookup (reference quantize.py:327-342), NHWC output."""
    return codebook[indices]


def update_codebook(
    codebook: jnp.ndarray, features: jnp.ndarray, indices: jnp.ndarray
) -> jnp.ndarray:
    """Replace rows `indices` with `features` (online k-means refresh,
    reference quantize.py:321-325)."""
    return codebook.at[indices].set(features.astype(codebook.dtype))


def codebook_usage(indices: jnp.ndarray, n_embed: int) -> jnp.ndarray:
    """Per-codeword usage counts (on-device histogram; reference tracks this
    host-side in model.py:313-323 / :357-376)."""
    flat = indices.reshape(-1)
    return jnp.zeros((n_embed,), jnp.int32).at[flat].add(1)

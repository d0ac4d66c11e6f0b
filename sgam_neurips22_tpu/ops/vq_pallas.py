"""Pallas TPU kernel: fused nearest-codeword search.

The VQ bottleneck is argmin_k ||z_p - e_k||^2 over a [P, D] batch of latents
and a [K, D] codebook (K up to 16384, reference configs). The XLA version
(models/vqgan/quantize.py) materializes the full [P, K] distance matrix in
HBM; this kernel streams codebook tiles through VMEM, does the z @ e^T
contraction on the MXU, and keeps only the running (min, argmin) per
latent — O(P) HBM traffic instead of O(P*K).

Grid: one program per K-tile. Scratch carries the running best distance and
index across grid steps (TPU grid dimensions execute sequentially on a
core, so scratch accumulation over the grid is well-defined).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _vq_kernel(z_ref, e_ref, idx_ref, dist_ref, best_d, best_i, *, tile_k, k_total):
    step = pl.program_id(0)
    z = z_ref[:]  # [P, D] fp32
    e = e_ref[:]  # [TILE_K, D] fp32

    # ||z - e||^2 = ||z||^2 + ||e||^2 - 2 z.e ; ||z||^2 is constant across
    # codewords so it does not affect the argmin — skip it in-kernel and add
    # it back only if the caller needs true distances.
    e2 = jnp.sum(e * e, axis=1)[None, :]  # [1, TILE_K]
    ze = jax.lax.dot_general(
        z, e, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [P, TILE_K]
    d = e2 - 2.0 * ze

    # mask padded codebook rows (last tile may exceed K)
    col = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1) + step * tile_k
    d = jnp.where(col < k_total, d, jnp.inf)

    tile_min = jnp.min(d, axis=1, keepdims=True)  # [P, 1]
    tile_arg = jnp.argmin(d, axis=1).astype(jnp.int32)[:, None] + step * tile_k

    @pl.when(step == 0)
    def _():
        best_d[:] = tile_min
        best_i[:] = tile_arg

    @pl.when(step > 0)
    def _():
        better = tile_min < best_d[:]
        best_d[:] = jnp.where(better, tile_min, best_d[:])
        best_i[:] = jnp.where(better, tile_arg, best_i[:])

    @pl.when(step == pl.num_programs(0) - 1)
    def _():
        idx_ref[:] = best_i[:]
        dist_ref[:] = best_d[:]


@functools.partial(jax.jit, static_argnames=("tile_k", "interpret"))
def nearest_codeword(
    z_flat: jnp.ndarray,
    codebook: jnp.ndarray,
    tile_k: int = 1024,
    interpret: bool = False,
):
    """argmin_k ||z - e_k||^2 for each row of z.

    Args:
      z_flat: [P, D] latents; codebook: [K, D].
    Returns:
      (indices [P] int32, min squared distances [P] f32 — true distances,
      including the ||z||^2 term).
    """
    p, d = z_flat.shape
    k, d2 = codebook.shape
    assert d == d2
    p_pad = _round_up(max(p, 8), 8)
    k_pad = _round_up(k, tile_k)
    z32 = jnp.zeros((p_pad, d), jnp.float32).at[:p].set(z_flat.astype(jnp.float32))
    e32 = jnp.zeros((k_pad, d), jnp.float32).at[:k].set(codebook.astype(jnp.float32))

    grid = (k_pad // tile_k,)
    idx, dist = pl.pallas_call(
        functools.partial(_vq_kernel, tile_k=tile_k, k_total=k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((p_pad, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_k, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((p_pad, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((p_pad, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((p_pad, 1), jnp.int32),
            jax.ShapeDtypeStruct((p_pad, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((p_pad, 1), jnp.float32),
            pltpu.VMEM((p_pad, 1), jnp.int32),
        ],
        interpret=interpret,
    )(z32, e32)
    z2 = jnp.sum(z_flat.astype(jnp.float32) ** 2, axis=1)
    return idx[:p, 0], dist[:p, 0] + z2

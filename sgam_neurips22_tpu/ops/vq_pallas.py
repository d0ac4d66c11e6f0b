"""Pallas TPU kernel: fused nearest-codeword search.

The VQ bottleneck is argmin_k ||z_p - e_k||^2 over a [P, D] batch of latents
and a [K, D] codebook (K up to 16384, reference configs; reference
quantize.py:285-289 materializes the [P, K] distance matrix). The XLA
version (models/vqgan/quantize.py) does the same in HBM; this kernel
streams codebook tiles through VMEM, does the e @ z^T contraction on the
MXU, and keeps only the running (min, argmin) per latent — O(P) HBM
traffic instead of O(P*K).

TPU-lowering notes (measured on v5e, round 4 — see NOTES.md):
- Distances are computed TRANSPOSED, [TILE_K, TILE_P]: the min/argmin then
  reduces over SUBLANES (axis 0). Reducing a [P, TILE_K] tile over the
  LANE axis made Mosaic's register allocator spill 128 MB of VMEM (hard
  compile failure on the v5e toolchain); the sublane orientation compiles
  and runs clean.
- argmin itself is expressed as two min-reductions (value min, then masked
  row-index min), which preserves jnp.argmin's first-occurrence tie rule.
- The contraction runs as the 6-pass bf16x3 decomposition (split each f32
  operand into three bf16 terms, sum the dot products with i+j<=2) — the
  same algorithm XLA:TPU uses for Precision.HIGHEST f32 matmuls, so the
  kernel's distances agree with the XLA path's pinned-precision distances
  to f32 rounding and the argmin matches on every tested input (1-pass
  bf16 flipped ~0.4% of indices on random data).
- P is tiled too (TILE_P = 256 lanes): one un-tiled P=2048 block pushed
  the kernel's scoped-VMEM stack past the 16 MB limit.

Grid: (P tiles, K tiles), K innermost — TPU grid dimensions execute
sequentially on a core, so the scratch running (min, argmin) accumulates
over the K tiles of each P tile and is flushed to the output block on the
last K step.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _split3_bf16(x: jnp.ndarray):
    """f32 -> (b0, b1, b2) bf16 with x ~= b0 + b1 + b2 (top 24 mantissa
    bits in three 8-bit chunks; the HIGHEST-precision matmul decomposition)."""
    b0 = x.astype(jnp.bfloat16)
    r1 = x - b0.astype(jnp.float32)
    b1 = r1.astype(jnp.bfloat16)
    b2 = (r1 - b1.astype(jnp.float32)).astype(jnp.bfloat16)
    return b0, b1, b2


def _dot_f32x3(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """a [M, D] @ b [N, D]^T at ~f32 precision via 6 bf16 MXU passes
    (terms a_i · b_j with i + j <= 2), accumulating smallest-first."""
    a0, a1, a2 = _split3_bf16(a)
    b0, b1, b2 = _split3_bf16(b)

    def dot(x, y):
        return jax.lax.dot_general(
            x, y, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )

    return (
        ((dot(a2, b0) + dot(a0, b2)) + (dot(a1, b1)))
        + (dot(a1, b0) + dot(a0, b1))
    ) + dot(a0, b0)


def _vq_kernel(z_ref, e_ref, idx_ref, dist_ref, best_d, best_i, *, tile_k, k_total):
    step_k = pl.program_id(1)
    z = z_ref[:]  # [TILE_P, D] fp32
    e = e_ref[:]  # [TILE_K, D] fp32

    # ||z - e||^2 = ||z||^2 + ||e||^2 - 2 z.e ; ||z||^2 is constant across
    # codewords so it does not affect the argmin — skip it in-kernel and add
    # it back only if the caller needs true distances. Distances are laid
    # out TRANSPOSED [TILE_K, TILE_P] so every reduction below runs over
    # sublanes (see module docstring).
    e2 = jnp.sum(e * e, axis=1, keepdims=True)  # [TILE_K, 1]
    ze = _dot_f32x3(e, z)  # [TILE_K, TILE_P]
    d = e2 - 2.0 * ze

    # mask padded codebook rows (last tile may exceed K)
    row = jax.lax.broadcasted_iota(jnp.int32, d.shape, 0) + step_k * tile_k
    d = jnp.where(row < k_total, d, jnp.inf)

    tile_min = jnp.min(d, axis=0, keepdims=True)  # [1, TILE_P]
    # first-occurrence argmin == smallest row index among the minima
    tile_arg = jnp.min(
        jnp.where(d <= tile_min, row, 2**30), axis=0, keepdims=True
    )  # [1, TILE_P]

    @pl.when(step_k == 0)
    def _():
        best_d[:] = tile_min
        best_i[:] = tile_arg

    @pl.when(step_k > 0)
    def _():
        # strict < : the earlier tile keeps ties (argmin semantics)
        better = tile_min < best_d[:]
        best_d[:] = jnp.where(better, tile_min, best_d[:])
        best_i[:] = jnp.where(better, tile_arg, best_i[:])

    @pl.when(step_k == pl.num_programs(1) - 1)
    def _():
        idx_ref[:] = best_i[:]
        dist_ref[:] = best_d[:]


@functools.partial(jax.jit, static_argnames=("tile_k", "tile_p", "interpret"))
def nearest_codeword(
    z_flat: jnp.ndarray,
    codebook: jnp.ndarray,
    tile_k: int = 1024,
    tile_p: int = 256,
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
    # P is the LANE axis of the transposed distance tile: pad to the 128
    # lane width (padded rows are all-zero latents; sliced away below)
    tile_p = max(128, min(tile_p, _round_up(p, 128)))
    p_pad = _round_up(max(p, tile_p), tile_p)
    k_pad = _round_up(k, tile_k)
    z32 = jnp.zeros((p_pad, d), jnp.float32).at[:p].set(z_flat.astype(jnp.float32))
    e32 = jnp.zeros((k_pad, d), jnp.float32).at[:k].set(codebook.astype(jnp.float32))

    grid = (p_pad // tile_p, k_pad // tile_k)
    idx, dist = pl.pallas_call(
        functools.partial(_vq_kernel, tile_k=tile_k, k_total=k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_p, d), lambda pi, ki: (pi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_k, d), lambda pi, ki: (ki, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tile_p), lambda pi, ki: (0, pi), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_p), lambda pi, ki: (0, pi), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, p_pad), jnp.int32),
            jax.ShapeDtypeStruct((1, p_pad), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, tile_p), jnp.float32),
            pltpu.VMEM((1, tile_p), jnp.int32),
        ],
        interpret=interpret,
    )(z32, e32)
    z2 = jnp.sum(z_flat.astype(jnp.float32) ** 2, axis=1)
    return idx[0, :p], dist[0, :p] + z2

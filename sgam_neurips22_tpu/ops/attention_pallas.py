"""Pallas TPU kernel: single-head flash attention (forward + custom VJP).

The VQGAN AttnBlock (models/vqgan/nn.py, reference
modules/diffusionmodules/model.py:140-192) attends over all H*W tokens —
4096 tokens at the 64x64 level for 256^2 inputs. The XLA path materializes
the [B, 4096, 4096] probability matrix (67 MB fp32) in HBM per block; this
kernel streams K/V tiles through VMEM with the standard online-softmax
recurrence, so HBM traffic is O(S*C) instead of O(S^2).

Kernel structure (v5e-measured constraints, NOTES.md round 4): a 3-D grid
(batch, q-tile, k-tile) with the k axis innermost and the online-softmax
state (acc, m, l) carried in VMEM scratch across k steps — TPU grid axes
execute sequentially per core, so scratch accumulation is well-defined.
An earlier 2-D-grid version held the full [S, C] K/V rows in VMEM per
program; at train shapes (B=16) its double-buffered 4 MB K/V windows blew
the 16 MB scoped-VMEM stack (hard compile failure). Tiling K to 512 rows
keeps every window at 0.5 MB.

Differentiable: `flash_attention` carries a jax.custom_vjp. The forward
kernel additionally writes the per-row logsumexp; the backward pass is the
standard FlashAttention recomputation — D = rowsum(dO * O) in plain XLA
(dense O(S*C)), then one kernel producing dQ (k innermost, scratch acc)
and one producing dK/dV (q innermost, scratch acc). No [S, S] tensor ever
reaches HBM in either direction, which is what lets training (batch 8/16)
use the kernel — the naive path's [B, S, S] einsums are the dominant
attention cost there.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _flash_kernel(
    q_ref, k_ref, v_ref, o_ref, lse_ref, acc_ref, m_ref, l_ref,
    *, scale, block_k, s_total
):
    step_k = pl.program_id(2)

    @pl.when(step_k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[:] = jnp.zeros_like(l_ref)

    q = q_ref[0] * scale  # [Bq, C]
    k = k_ref[0]  # [Bk, C]
    v = v_ref[0]
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [Bq, Bk]
    col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1) + step_k * block_k
    logits = jnp.where(col < s_total, logits, -jnp.inf)
    m_prev, l_prev = m_ref[:], l_ref[:]
    m_new = jnp.maximum(m_prev, jnp.max(logits, axis=1, keepdims=True))
    p = jnp.exp(logits - m_new)
    alpha = jnp.exp(m_prev - m_new)
    l_ref[:] = l_prev * alpha + jnp.sum(p, axis=1, keepdims=True)
    m_ref[:] = m_new
    acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(step_k == pl.num_programs(2) - 1)
    def _():
        l = jnp.maximum(l_ref[:], 1e-30)
        o_ref[0] = (acc_ref[:] / l).astype(o_ref.dtype)
        # logsumexp residual for the backward pass: p = exp(logits - lse)
        lse_ref[0] = m_ref[:] + jnp.log(l)


def _flash_fwd_impl(q, k, v, block_q, block_k, interpret):
    b, s, c = q.shape
    scale = 1.0 / (c**0.5)
    s_pad_q = _round_up(s, block_q)
    s_pad_k = _round_up(s, block_k)

    def pad(x, s_pad):
        return jnp.pad(x.astype(jnp.float32), ((0, 0), (0, s_pad - s), (0, 0)))

    qp, kp, vp = pad(q, s_pad_q), pad(k, s_pad_k), pad(v, s_pad_k)
    grid = (b, s_pad_q // block_q, s_pad_k // block_k)
    out, lse = pl.pallas_call(
        functools.partial(
            _flash_kernel, scale=scale, block_k=block_k, s_total=s
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, c), lambda i, j, kk: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, c), lambda i, j, kk: (i, kk, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, c), lambda i, j, kk: (i, kk, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, c), lambda i, j, kk: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, 1), lambda i, j, kk: (i, j, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, s_pad_q, c), q.dtype),
            jax.ShapeDtypeStruct((b, s_pad_q, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, c), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
        ],
        interpret=interpret,
    )(qp, kp, vp)
    return out[:, :s], lse[:, :s, 0]


def _dq_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, dd_ref, dq_ref, acc_ref,
    *, scale, block_k, s_total
):
    """dQ: grid (b, q tiles, k tiles), k innermost; dS = P * (dO V^T - D)."""
    step_k = pl.program_id(2)

    @pl.when(step_k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0]  # [Bq, C] (unscaled)
    do = do_ref[0]  # [Bq, C]
    lse = lse_ref[0]  # [Bq, 1]
    dd = dd_ref[0]  # [Bq, 1]
    k = k_ref[0]  # [Bk, C]
    v = v_ref[0]
    logits = scale * jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1) + step_k * block_k
    p = jnp.where(col < s_total, jnp.exp(logits - lse), 0.0)  # [Bq, Bk]
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [Bq, Bk]
    ds = p * (dp - dd)
    acc_ref[:] = acc_ref[:] + jax.lax.dot_general(
        ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(step_k == pl.num_programs(2) - 1)
    def _():
        dq_ref[0] = (scale * acc_ref[:]).astype(dq_ref.dtype)


def _dkv_kernel(
    k_ref, v_ref, q_ref, do_ref, lse_ref, dd_ref, dk_ref, dv_ref,
    dk_acc, dv_acc, *, scale, block_q, s_total
):
    """dK/dV: grid (b, k tiles, q tiles), q innermost; P^T per q tile."""
    step_q = pl.program_id(2)

    @pl.when(step_q == 0)
    def _():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    k = k_ref[0]  # [Bk, C]
    v = v_ref[0]
    q = q_ref[0]  # [Bq, C]
    do = do_ref[0]
    lse = lse_ref[0]  # [Bq, 1]
    dd = dd_ref[0]
    # pt: [Bk, Bq] = P^T — padded q rows carry lse from padded forward
    # rows; mask them out explicitly
    logits_t = scale * jax.lax.dot_general(
        k, q, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [Bk, Bq]
    col_q = jax.lax.broadcasted_iota(jnp.int32, logits_t.shape, 1) + step_q * block_q
    pt = jnp.where(col_q < s_total, jnp.exp(logits_t - lse[:, 0][None, :]), 0.0)
    dv_acc[:] = dv_acc[:] + jax.lax.dot_general(
        pt, do, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # [Bk, C]
    dp_t = jax.lax.dot_general(
        v, do, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [Bk, Bq]
    ds_t = pt * (dp_t - dd[:, 0][None, :])
    dk_acc[:] = dk_acc[:] + jax.lax.dot_general(
        ds_t, q, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(step_q == pl.num_programs(2) - 1)
    def _():
        dk_ref[0] = (scale * dk_acc[:]).astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[:].astype(dv_ref.dtype)


def _flash_bwd_impl(q, k, v, out, lse, g, block_q, block_k, interpret):
    b, s, c = q.shape
    scale = 1.0 / (c**0.5)
    s_pad_q = _round_up(s, block_q)
    s_pad_k = _round_up(s, block_k)

    def pad(x, s_pad):
        return jnp.pad(x.astype(jnp.float32), ((0, 0), (0, s_pad - s), (0, 0)))

    qp, dop = pad(q, s_pad_q), pad(g, s_pad_q)
    kp, vp = pad(k, s_pad_k), pad(v, s_pad_k)
    # D = rowsum(dO * O): dense O(S*C), fine in XLA
    dd = jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1)
    ddp = jnp.pad(dd, ((0, 0), (0, s_pad_q - s)))[..., None]  # [B, Sq, 1]
    lsep = jnp.pad(lse, ((0, 0), (0, s_pad_q - s)))[..., None]

    dq = pl.pallas_call(
        functools.partial(_dq_kernel, scale=scale, block_k=block_k, s_total=s),
        grid=(b, s_pad_q // block_q, s_pad_k // block_k),
        in_specs=[
            pl.BlockSpec((1, block_q, c), lambda i, j, kk: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, c), lambda i, j, kk: (i, kk, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, c), lambda i, j, kk: (i, kk, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, c), lambda i, j, kk: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, 1), lambda i, j, kk: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, 1), lambda i, j, kk: (i, j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, c), lambda i, j, kk: (i, j, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, s_pad_q, c), q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, c), jnp.float32)],
        interpret=interpret,
    )(qp, kp, vp, dop, lsep, ddp)

    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel, scale=scale, block_q=block_q, s_total=s),
        grid=(b, s_pad_k // block_k, s_pad_q // block_q),
        in_specs=[
            pl.BlockSpec((1, block_k, c), lambda i, j, kk: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, c), lambda i, j, kk: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, c), lambda i, j, kk: (i, kk, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, c), lambda i, j, kk: (i, kk, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, 1), lambda i, j, kk: (i, kk, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, 1), lambda i, j, kk: (i, kk, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, block_k, c), lambda i, j, kk: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, c), lambda i, j, kk: (i, j, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, s_pad_k, c), k.dtype),
            jax.ShapeDtypeStruct((b, s_pad_k, c), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_k, c), jnp.float32),
            pltpu.VMEM((block_k, c), jnp.float32),
        ],
        interpret=interpret,
    )(kp, vp, qp, dop, lsep, ddp)
    return dq[:, :s], dk[:, :s], dv[:, :s]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _flash_attention(q, k, v, block_q, block_k, interpret):
    out, _ = _flash_fwd_impl(q, k, v, block_q, block_k, interpret)
    return out


def _flash_fwd(q, k, v, block_q, block_k, interpret):
    out, lse = _flash_fwd_impl(q, k, v, block_q, block_k, interpret)
    return out, (q, k, v, out, lse)


def _flash_bwd(block_q, block_k, interpret, res, g):
    q, k, v, out, lse = res
    return _flash_bwd_impl(q, k, v, out, lse, g, block_q, block_k, interpret)


_flash_attention.defvjp(_flash_fwd, _flash_bwd)


@functools.partial(jax.jit, static_argnames=("block_q", "block_k", "interpret"))
def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    block_q: int | None = None,
    block_k: int | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """softmax(q k^T / sqrt(C)) v for single-head [B, S, C] tensors.

    Differentiable (custom VJP, FlashAttention-style recomputation): usable
    in training steps; no [S, S] buffer in forward or backward.

    Block sizes default to 512x512 and can be overridden per-call or via
    SGAM_TPU_FLASH_BLOCK_Q / SGAM_TPU_FLASH_BLOCK_K for sweeps."""
    if block_q is None:
        block_q = int(os.environ.get("SGAM_TPU_FLASH_BLOCK_Q", "512"))
    if block_k is None:
        block_k = int(os.environ.get("SGAM_TPU_FLASH_BLOCK_K", "512"))
    return _flash_attention(q, k, v, block_q, block_k, interpret)

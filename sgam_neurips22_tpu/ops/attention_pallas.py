"""Pallas TPU kernel: single-head flash attention.

The VQGAN AttnBlock (models/vqgan/nn.py, reference
modules/diffusionmodules/model.py:140-192) attends over all H*W tokens —
4096 tokens at the 64x64 level for 256^2 inputs. The XLA path materializes
the [B, 4096, 4096] probability matrix (67 MB fp32) in HBM per block; this
kernel streams K/V tiles through VMEM with the standard online-softmax
recurrence, so HBM traffic is O(S*C) instead of O(S^2).

Single head, modest sequence: one grid axis over (batch, q-tile) pairs and
a sequential inner fori_loop over K tiles (simpler than a 2-D grid and fast
enough at S<=4096).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, block_k, s_total):
    q = q_ref[0] * scale  # [Bq, C]
    bq, c = q.shape
    s_pad = k_ref.shape[1]
    num_k = s_pad // block_k

    def body(i, carry):
        acc, m, l = carry
        k = k_ref[0, pl.ds(i * block_k, block_k), :]  # [Bk, C]
        v = v_ref[0, pl.ds(i * block_k, block_k), :]
        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [Bq, Bk]
        col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1) + i * block_k
        logits = jnp.where(col < s_total, logits, -jnp.inf)
        m_new = jnp.maximum(m, jnp.max(logits, axis=1, keepdims=True))
        p = jnp.exp(logits - m_new)
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + jnp.sum(p, axis=1, keepdims=True)
        acc_new = acc * alpha + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return acc_new, m_new, l_new

    acc = jnp.zeros((bq, c), jnp.float32)
    m = jnp.full((bq, 1), -jnp.inf, jnp.float32)
    l = jnp.zeros((bq, 1), jnp.float32)
    acc, m, l = jax.lax.fori_loop(0, num_k, body, (acc, m, l))
    o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_q", "block_k", "interpret"))
def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    block_q: int = 512,
    block_k: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """softmax(q k^T / sqrt(C)) v for single-head [B, S, C] tensors."""
    b, s, c = q.shape
    scale = 1.0 / (c**0.5)
    s_pad_q = _round_up(s, block_q)
    s_pad_k = _round_up(s, block_k)

    def pad(x, s_pad):
        return jnp.pad(x.astype(jnp.float32), ((0, 0), (0, s_pad - s), (0, 0)))

    qp, kp, vp = pad(q, s_pad_q), pad(k, s_pad_k), pad(v, s_pad_k)
    grid = (b, s_pad_q // block_q)
    out = pl.pallas_call(
        functools.partial(
            _flash_kernel, scale=scale, block_k=block_k, s_total=s
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, c), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_pad_k, c), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_pad_k, c), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, c), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, s_pad_q, c), q.dtype),
        interpret=interpret,
    )(qp, kp, vp)
    return out[:, :s]

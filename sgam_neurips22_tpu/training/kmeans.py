"""k-means for online codebook refresh (replaces scipy.cluster.vq.kmeans2).

The reference re-clusters buffered pre-quantization features with
scipy kmeans2(minit='points') whenever too many codewords go inactive
(reference model.py:274-295) — computed on rank 0 only and never broadcast,
so DDP replicas silently diverge (SURVEY.md section 5.8). Here the refresh
is a pure function applied to replicated state, so every data-parallel
replica stays bit-identical by construction.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


def kmeans(
    key: jax.Array, data: jnp.ndarray, k: int, iters: int = 20
) -> jnp.ndarray:
    """Lloyd's algorithm, 'points' init (random rows, like scipy minit='points').

    Args:
      data: [M, D]; k: number of clusters (static).
    Returns:
      [k, D] centroids. Empty clusters keep their previous centroid.
    """
    m, d = data.shape
    idx = jax.random.choice(key, m, (k,), replace=False)
    centroids = data[idx]

    def step(centroids, _):
        # distances via the same expanded form as VQ (one MXU matmul)
        d2 = (
            jnp.sum(data**2, axis=1, keepdims=True)
            + jnp.sum(centroids**2, axis=1)[None, :]
            - 2.0 * data @ centroids.T
        )
        assign = jnp.argmin(d2, axis=1)
        sums = jnp.zeros((k, data.shape[1]), data.dtype).at[assign].add(data)
        counts = jnp.zeros((k,), jnp.int32).at[assign].add(1)
        new = jnp.where(counts[:, None] > 0, sums / jnp.maximum(counts, 1)[:, None], centroids)
        return new, None

    centroids, _ = jax.lax.scan(step, centroids, None, length=iters)
    return centroids


class KMeansState(NamedTuple):
    """On-device bookkeeping for the online refresh
    (reference model.py:75-80,313-323)."""

    timeout: jnp.ndarray  # [n_embed] int32, <=0 means inactive
    buffer: jnp.ndarray  # [buffer_size, P, D] ring buffer of pre-quant features
    ptr: jnp.ndarray  # scalar int32 write pointer (monotonic)


def init_kmeans_state(
    n_embed: int, buffer_size: int, positions: int, dim: int, word_timeout: int
) -> KMeansState:
    return KMeansState(
        timeout=jnp.full((n_embed,), word_timeout, jnp.int32),
        buffer=jnp.zeros((buffer_size, positions, dim), jnp.float32),
        ptr=jnp.zeros((), jnp.int32),
    )


def kmeans_bookkeeping(
    state: KMeansState,
    indices0: jnp.ndarray,
    pre_quant0: jnp.ndarray,
    word_timeout: int,
) -> KMeansState:
    """Per-step update inside the jitted train step: reset timeouts of codes
    used by batch element 0, decrement all, append element-0 features to the
    ring buffer (reference model.py:313-323 uses batch element 0 only)."""
    n_embed = state.timeout.shape[0]
    used = jnp.zeros((n_embed,), bool).at[indices0.reshape(-1)].set(True)
    timeout = jnp.where(used, word_timeout, state.timeout) - 1
    size = state.buffer.shape[0]
    feat = pre_quant0.reshape(-1, pre_quant0.shape[-1]).astype(jnp.float32)
    buffer = state.buffer.at[state.ptr % size].set(feat)
    return KMeansState(timeout=timeout, buffer=buffer, ptr=state.ptr + 1)


def should_refresh(
    state: KMeansState, step: int, inactive_threshold: float, frequency: int,
    start_global_step: int = 0,
) -> bool:
    """Host-side trigger (reference model.py:281-283). Cheap scalar pulls."""
    if step < start_global_step or frequency <= 0 or step % frequency != 0:
        return False
    if int(state.ptr) < state.buffer.shape[0]:
        return False
    n = state.timeout.shape[0]
    inactive = int(jnp.sum(state.timeout <= 0))
    return inactive / n > inactive_threshold


def refresh_codebook(
    key: jax.Array,
    codebook: jnp.ndarray,
    state: KMeansState,
    word_timeout: int,
):
    """Re-cluster buffered features into len(inactive) centroids and overwrite
    the inactive rows (reference model.py:285-293 + quantize.update_codebook).

    Runs eagerly (it fires at most every `frequency` steps). Returns
    (new_codebook, new_state).
    """
    inactive = jnp.nonzero(state.timeout <= 0)[0]  # eager: concrete
    k = int(inactive.shape[0])
    if k == 0:
        return codebook, state
    feats = state.buffer.reshape(-1, state.buffer.shape[-1])
    centroids = kmeans(key, feats, k)
    new_codebook = codebook.at[inactive].set(centroids.astype(codebook.dtype))
    new_timeout = state.timeout.at[inactive].set(word_timeout)
    return new_codebook, state._replace(timeout=new_timeout)

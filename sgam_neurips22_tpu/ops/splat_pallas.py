"""Pallas TPU kernel: binned z-buffer min-merge for the forward splat.

The splat's hot op (geometry/splat.py, rebuilt from reference
sgam/point_rendering/warp.py:194-286) is ONE scatter-min of a packed
(quantized-z << 19 | point-idx) int32 key over the target image. XLA lowers
that scatter to a serial issue loop at ~8.5 ns/element — 2.77 ms/frame for
the flagship 327k points (5 srcs x 256^2), ~32% of the whole generation
step (ARCHITECTURE.md roofline). The access pattern, however, is anything
but random: points arrive in SOURCE SCANLINE order, and a contiguous
scanline chunk projects into a narrow band of target rows (the camera
moves laterally/forward between grid anchors, so epipolar displacement is
bounded by the depth range). This kernel exploits that coherence:

- the whole winner-key image lives in VMEM for the duration (h*w*4 bytes,
  256 KB at 256^2 — far under the 16 MB budget);
- points are processed in scanline chunks; a cheap XLA pre-pass computes
  each chunk's target-row span [rmin, rmax] (scalar-prefetched, SMEM);
- per chunk, a column-match matrix (point-col == output-col — the only
  O(chunk x w) comparison, hoisted) positions every point, and for each
  target row in the span a masked min-reduce over SUBLANES folds the
  chunk's candidates into one [1, w] row, merged into the accumulator
  row read-modify-write. All VPU vector work — no serial scatter issue.
  (Sublane orientation deliberately matches the VQ kernel's lesson:
  lane-axis reductions made Mosaic spill, ops/vq_pallas.py docstring.)

Cost scales with the ACTUAL row coherence: sum over chunks of
(1 + 2*span) * chunk * w lane-ops. For coherent depth (span 2-4) that is
~0.4 M lane-ops per source row — ~0.5 ms for the flagship shape vs 2.77 ms
for the serial scatter. Worst-case incoherent depth widens spans and the
kernel degrades gracefully toward (and past) the XLA cost; the production
wiring is therefore measured-default, same policy as ops/vq_pallas.py.

The merge is EXACT and bit-identical to the XLA scatter-min: min over an
identical key multiset, and the packed key is unique per point, so the
winning point — and hence the downstream exact-z / feature gathers in
splat.py — is the same.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_IMAX = jnp.iinfo(jnp.int32).max


def _kernel(rmin_ref, rmax_ref, pix_ref, key_ref, out_ref, *,
            nchunks, group, chunk, h, w):
    b = pl.program_id(0)
    g = pl.program_id(1)

    @pl.when(g == 0)
    def _():
        out_ref[0] = jnp.full((h, w), _IMAX, jnp.int32)

    # output-column ids along lanes, point ids down sublanes
    iota_col = jax.lax.broadcasted_iota(jnp.int32, (chunk, w), 1)

    for i in range(group):  # static unroll over the group's chunks
        cidx = b * nchunks + g * group + i
        rmin = rmin_ref[cidx]
        rmax = rmax_ref[cidx]
        # pre-transposed [chunk, group] blocks: static lane slice per chunk
        pcol = pix_ref[0, 0, :, i : i + 1]  # [chunk, 1] linear pixel ids
        kcol = key_ref[0, 0, :, i : i + 1]  # [chunk, 1] packed keys
        rrow = pcol // w
        ccol = pcol - rrow * w
        cmatch = ccol == iota_col  # [chunk, w], hoisted out of the row loop

        def row_body(r, _, rrow=rrow, kcol=kcol, cmatch=cmatch):
            km = jnp.where(rrow == r, kcol, _IMAX)  # [chunk, 1]
            mk = jnp.where(cmatch, km, _IMAX)  # [chunk, w]
            red = jnp.min(mk, axis=0, keepdims=True)  # [1, w]
            cur = out_ref[0, pl.ds(r, 1), :]
            out_ref[0, pl.ds(r, 1), :] = jnp.minimum(cur, red)
            return 0

        # empty span (all-invalid chunk) => rmin > rmax => no iterations
        jax.lax.fori_loop(rmin, rmax + 1, row_body, 0)


@functools.partial(
    jax.jit, static_argnames=("h", "w", "chunk", "group", "interpret")
)
def zbuffer_min(
    pix: jnp.ndarray,
    key: jnp.ndarray,
    h: int,
    w: int,
    chunk: int = 256,
    group: int = 8,
    interpret: bool = False,
) -> jnp.ndarray:
    """Per-image scatter-min of int32 keys over linear pixel ids.

    Args:
      pix: [B, P] int32 linear pixel ids in [0, h*w). Invalid points must
        already be sanitized to pixel 0 (their key must be INT32_MAX).
      key: [B, P] int32 packed keys; smaller wins; INT32_MAX marks an
        invalid point / an empty pixel.
    Returns:
      [B, h*w] int32 winner keys (INT32_MAX where no point landed) —
      bit-identical to `full(IMAX).at[pix].min(key)` per image.
    """
    b, p = pix.shape
    pix = jax.lax.stop_gradient(pix)
    key = jax.lax.stop_gradient(key)
    block = chunk * group
    p_pad = ((p + block - 1) // block) * block
    if p_pad != p:
        pad = ((0, 0), (0, p_pad - p))
        pix = jnp.pad(pix, pad)  # pixel 0 ...
        key = jnp.pad(key, pad, constant_values=_IMAX)  # ... with empty key
    nchunks = p_pad // chunk
    ngroups = nchunks // group

    pc = pix.reshape(b, nchunks, chunk)
    kc = key.reshape(b, nchunks, chunk)
    rows = pc // w
    ok = kc != _IMAX
    rmin = jnp.min(jnp.where(ok, rows, 2**30), axis=2).reshape(-1)
    rmax = jnp.max(jnp.where(ok, rows, -1), axis=2).reshape(-1)
    # transposed chunk layout: point axis down sublanes, chunk-in-group
    # along lanes => the kernel slices one [chunk, 1] column per chunk with
    # a STATIC lane index (no in-kernel relayouts)
    pix_t = pc.reshape(b, ngroups, group, chunk).transpose(0, 1, 3, 2)
    key_t = kc.reshape(b, ngroups, group, chunk).transpose(0, 1, 3, 2)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, ngroups),
        in_specs=[
            pl.BlockSpec(
                (1, 1, chunk, group),
                lambda bi, gi, *_: (bi, gi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, chunk, group),
                lambda bi, gi, *_: (bi, gi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, h, w), lambda bi, gi, *_: (bi, 0, 0), memory_space=pltpu.VMEM
        ),
    )
    win = pl.pallas_call(
        functools.partial(
            _kernel, nchunks=nchunks, group=group, chunk=chunk, h=h, w=w
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, h, w), jnp.int32),
        interpret=interpret,
    )(rmin, rmax, pix_t, key_t)
    return win.reshape(b, h * w)

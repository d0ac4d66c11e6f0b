"""Forward point splatting: the core conditioning renderer.

TPU-native rebuild of the reference's
`render_projection_from_srcs_fast` (sgam/point_rendering/warp.py:194-286):
unproject every source pixel, rigidly transform into the target frame,
project through the target intrinsics, and z-buffer the points into a
target-view RGB + depth image, followed by 3x3 median hole filling and
extrapolation-mask computation.

Differences from the reference (deliberate, SURVEY.md section 5.2):
- The reference's parallel scatter is last-write-wins in an unspecified CUDA
  order; its serial fallback (warp.py:246-249) is source-major order. Here
  collision resolution is explicit:
    * ``collision='nearest'`` (default): the point with minimum z wins —
      deterministic and geometrically correct (hidden surfaces cannot
      overwrite visible ones).
    * ``collision='last'``: the highest flattened point index wins, exactly
      reproducing the reference's well-defined serial semantics.
- Everything is segment-reduction based (XLA scatter-min), no Python loops.
"""
from __future__ import annotations

import os
from typing import NamedTuple

import jax
import jax.numpy as jnp

from sgam_neurips22_tpu.geometry.camera import inv3x3, pixel2cam


def _use_splat_pallas(override: bool | None = None) -> bool:
    """Binned Pallas z-buffer merge for the nearest-collision splat —
    replaces XLA's serial-issue scatter-min (~8.5 ns/element, 2.77 ms/frame
    at the flagship 327k-point shape) with a VMEM-resident vectorized merge
    exploiting scanline coherence; output is bit-identical (ops/
    splat_pallas.py). The kernel's cost scales with the actual target-row
    spans, so the win is GEOMETRY-dependent (v5e, 2026-08-20, NOTES.md
    round 5): CLEVR's lateral grid motion keeps spans narrow (flythrough
    103.7 -> 118.1 fps) while google_earth's forward motion spreads them
    (123.4 -> 90.5 fps — the kernel LOSES there). Resolution order:
    SGAM_TPU_SPLAT_PALLAS=0/1 (overrides everything, both ways), then the
    caller's `override` (models/conditioning.py carries the per-dataset
    measured default), then the backend default (ON for TPU; off-TPU the
    kernel would run in interpret mode, so XLA scatter stays)."""
    flag = os.environ.get("SGAM_TPU_SPLAT_PALLAS")
    if flag is not None:
        return flag not in ("0", "false", "False")
    if override is not None:
        return override
    return jax.default_backend() == "tpu"


class SplatResult(NamedTuple):
    depth: jnp.ndarray  # [B, H, W, 1] merged target-view z-depth
    features: jnp.ndarray  # [B, H, W, C] merged target-view features
    extrapolation_mask: jnp.ndarray  # [B, H, W, 1] bool, True where unseen
    raw_depth: jnp.ndarray  # [B, H, W, 1] pre-median-fill depth
    raw_features: jnp.ndarray  # [B, H, W, C] pre-median-fill features


def median_blur_3x3(x: jnp.ndarray) -> jnp.ndarray:
    """3x3 median filter with zero padding, lower-median tie-breaking.

    Matches torch.median over the 9-patch axis (reference warp.py:306-347):
    for 9 values the median is sorted index 4, which IS the true median, so
    a median-of-9 min/max selection network (McGuire's 19-exchange network)
    computes it exactly with pure elementwise VPU ops. (jnp.sort over the
    9-wide axis hit a TPU sort path that cost 157 ms/frame at batch 8 —
    160x the batch-4 cost; the network is flat ~0.2 ms and batch-invariant.)

    Args:
      x: [B, H, W, C].
    """
    b, h, w, c = x.shape
    padded = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    p = [
        padded[:, dy : dy + h, dx : dx + w, :]
        for dy in range(3)
        for dx in range(3)
    ]

    def s2(i, j):
        lo = jnp.minimum(p[i], p[j])
        hi = jnp.maximum(p[i], p[j])
        p[i], p[j] = lo, hi

    # median-of-9 selection network (Morgan McGuire, ShaderX6)
    s2(1, 2); s2(4, 5); s2(7, 8)
    s2(0, 1); s2(3, 4); s2(6, 7)
    s2(1, 2); s2(4, 5); s2(7, 8)
    s2(0, 3); s2(5, 8); s2(4, 7)
    s2(3, 6); s2(1, 4); s2(2, 5)
    s2(4, 7); s2(4, 2); s2(6, 4)
    s2(4, 2)
    return p[4]


def _fill_from_nearest_neighbor(depth: jnp.ndarray, feats: jnp.ndarray):
    """One-pass hole fill for the strided splat: each empty pixel takes its
    3x3 neighbor with the SMALLEST nonzero depth (z-buffer-consistent
    dilation — the nearest surface wins, like the scatter itself).

    The median merge alone cannot close the strided splat's holes when few
    sources are valid (e.g. the first frames of an unroll): a regular
    1/s^2-density grid leaves >= 5 zeros in every 3x3 window, so the lower
    median is 0. One dilation pass fills any hole with >= 1 covered
    neighbor, which a phase-offset grid always has for s = 2."""
    b, h, w, _ = depth.shape
    big = jnp.float32(3.4e38)
    d = jnp.where(depth <= 0.0, big, depth)
    pad_d = jnp.pad(d, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=big)
    pad_f = jnp.pad(feats, ((0, 0), (1, 1), (1, 1), (0, 0)))
    # running elementwise min over the 9 neighbors: pure VPU select chains
    # that XLA fuses into the surrounding splat epilogue. (The first version
    # stacked [B,H,W,9(,C)] and take_along_axis'd the argmin — gathers that
    # alone cost more than the strided splat saved; measured 2026-08-17.)
    best_d = pad_d[:, 0:h, 0:w, :]
    best_f = pad_f[:, 0:h, 0:w, :]
    for dy in range(3):
        for dx in range(3):
            if dy == 0 and dx == 0:
                continue
            nd = pad_d[:, dy : dy + h, dx : dx + w, :]
            m = nd < best_d
            best_d = jnp.where(m, nd, best_d)
            best_f = jnp.where(m, pad_f[:, dy : dy + h, dx : dx + w, :], best_f)
    hole = depth <= 0.0
    ok = best_d < big
    return (
        jnp.where(hole & ok, best_d, depth),
        jnp.where(hole & ok, best_f, feats),
    )


def _zbuffer_scatter_batched_nearest(
    pix: jnp.ndarray,
    z: jnp.ndarray,
    feats: jnp.ndarray,
    valid: jnp.ndarray,
    h: int,
    w: int,
    pallas: bool | None = None,
):
    """Whole-batch packed z-buffer: ONE scatter-min over [B*H*W] with the
    batch folded into the pixel index (measured: vmapping the per-image
    scatter lowers to B serial scatters and regressed multi-scene unrolls
    ~3x, NOTES.md round 1). The packed key's index field only needs to
    address points WITHIN one image (each output pixel belongs to exactly
    one batch element), so the 19-bit capacity is per-image, any B.

    Args:
      pix: [B, P, 2] int32 (x, y); z: [B, P]; feats: [B, P, C]; valid: [B, P].
    Returns:
      (depth [B, H, W, 1], feats_img [B, H, W, C])
    """
    b, p_count = z.shape
    if p_count >= (1 << 19):
        raise ValueError("packed nearest-splat supports < 2^19 points per image")
    n_pix = h * w
    # per-image depth quantization range
    z_lo = jnp.min(jnp.where(valid, z, jnp.inf), axis=1, keepdims=True)
    z_hi = jnp.max(jnp.where(valid, z, -jnp.inf), axis=1, keepdims=True)
    scale = 4095.0 / jnp.maximum(z_hi - z_lo, 1e-6)
    z_q = jnp.clip((z - z_lo) * scale, 0, 4095).astype(jnp.int32)
    idx19 = jnp.broadcast_to(
        jnp.arange(p_count, dtype=jnp.int32)[None, :], (b, p_count)
    )
    key = (z_q << 19) | idx19
    imax = jnp.iinfo(jnp.int32).max
    key = jnp.where(valid, key, imax)
    if _use_splat_pallas(pallas):
        from sgam_neurips22_tpu.ops.splat_pallas import zbuffer_min

        p_local = jnp.where(valid, pix[..., 1] * w + pix[..., 0], 0)
        win = zbuffer_min(
            p_local, key, h, w, interpret=jax.default_backend() != "tpu"
        ).reshape(-1)
    else:
        batch_off = (jnp.arange(b, dtype=jnp.int32) * n_pix)[:, None]
        p = jnp.where(valid, pix[..., 1] * w + pix[..., 0] + batch_off, 0)
        win = (
            jnp.full((b * n_pix,), imax, jnp.int32)
            .at[p.reshape(-1)]
            .min(key.reshape(-1), mode="drop")
        )
    has_point = win != imax
    # reconstruct the global point id from (pixel's batch element, idx19)
    scene = jnp.arange(b * n_pix, dtype=jnp.int32) // n_pix
    safe_idx = jnp.where(has_point, scene * p_count + (win & ((1 << 19) - 1)), 0)
    # ONE [z | feats] row gather: the round-5 train roofline measured the
    # scalar depth gather at 22.4 ms/step (bs 16) while the same-size
    # 3-wide feats ROW gather ran 6.4 ms — row gathers move 16 B per issue,
    # scalar f32 gathers 4 B. Folding z into the rows makes the depth
    # column ride along for free.
    pay = jnp.concatenate(
        [z.reshape(-1, 1), feats.reshape(-1, feats.shape[-1])], axis=-1
    )
    won = jnp.where(has_point[:, None], pay[safe_idx], 0.0)
    depth = won[:, :1].reshape(b, h, w, 1)
    feats_img = won[:, 1:].reshape(b, h, w, feats.shape[-1])
    return depth, feats_img


def _zbuffer_scatter(
    pix_x: jnp.ndarray,
    pix_y: jnp.ndarray,
    z: jnp.ndarray,
    feats: jnp.ndarray,
    valid: jnp.ndarray,
    h: int,
    w: int,
    collision: str,
    last_priority: jnp.ndarray | None = None,
):
    """Scatter P points into an [H, W] image with explicit collision rules.

    Args:
      pix_x, pix_y: [P] int32 target pixel coords.
      z: [P] point depths in the target frame.
      feats: [P, C] point features.
      valid: [P] bool.
      last_priority: optional [P] int32 permutation giving the serial write
        order for collision='last' (highest priority wins). The reference
        flattens points PIXEL-MAJOR — `permute(0, 2, 3, 1)` puts the source
        axis last (warp.py:218), so its serial loop writes point
        (pixel p, source n) at step p*N + n.
    Returns:
      (depth [H, W, 1], feats_img [H, W, C])
    """
    p = pix_y * w + pix_x  # linear pixel id
    p = jnp.where(valid, p, 0)
    n_pix = h * w
    big = jnp.finfo(z.dtype).max

    if collision == "nearest":
        # ONE scatter-min over a packed int32 key: 12-bit quantized depth in
        # the high bits (winner = nearest surface, ties broken toward the
        # smallest point index in the low 19 bits). XLA TPU scatter runs
        # ~7.6 ns/element (serial), so collapsing the previous
        # scatter-min(z) + 327k-gather + scatter-min(idx) pipeline into one
        # op cut the splat cost roughly 3x (see NOTES.md trace analysis).
        # Depth quantization affects ONLY tie resolution between surfaces
        # closer than (far-near)/4096; the output depth is the winner's
        # exact f32 z.
        z_lo = jnp.min(jnp.where(valid, z, jnp.inf))
        z_hi = jnp.max(jnp.where(valid, z, -jnp.inf))
        scale = 4095.0 / jnp.maximum(z_hi - z_lo, 1e-6)
        z_q = jnp.clip(((z - z_lo) * scale), 0, 4095).astype(jnp.int32)
        idx31 = jnp.arange(z.shape[0], dtype=jnp.int32)
        if z.shape[0] >= (1 << 19):
            raise ValueError("packed nearest-splat supports < 2^19 points; use collision='nearest_exact'")
        key = (z_q << 19) | idx31
        imax = jnp.iinfo(jnp.int32).max
        key = jnp.where(valid, key, imax)
        win = jnp.full((n_pix,), imax, jnp.int32).at[p].min(key, mode="drop")
        has_point = win != imax
        safe_idx = jnp.where(has_point, win & ((1 << 19) - 1), 0)
    elif collision == "nearest_exact":
        key = jnp.where(valid, z, big)
        win_z = (
            jnp.full((n_pix,), big, z.dtype).at[p].min(key, mode="drop")
        )
        # Among equal-z ties pick the smallest point index (deterministic).
        is_win = valid & (z == win_z[p])
        idx_key = jnp.where(is_win, jnp.arange(z.shape[0], dtype=jnp.int32), jnp.iinfo(jnp.int32).max)
        win_idx = (
            jnp.full((n_pix,), jnp.iinfo(jnp.int32).max, jnp.int32)
            .at[p]
            .min(idx_key, mode="drop")
        )
        has_point = win_idx != jnp.iinfo(jnp.int32).max
        safe_idx = jnp.where(has_point, win_idx, 0)
    elif collision == "last":
        if last_priority is None:
            last_priority = jnp.arange(z.shape[0], dtype=jnp.int32)
        idx_key = jnp.where(valid, last_priority, -1)
        win_pri = jnp.full((n_pix,), -1, jnp.int32).at[p].max(idx_key, mode="drop")
        has_point = win_pri >= 0
        # map the winning priority back to the point index (priorities are a
        # permutation of point indices)
        inv = jnp.zeros((z.shape[0],), jnp.int32).at[last_priority].set(
            jnp.arange(z.shape[0], dtype=jnp.int32)
        )
        safe_idx = jnp.where(has_point, inv[jnp.where(has_point, win_pri, 0)], 0)
    else:
        raise ValueError(f"unknown collision mode {collision!r}")

    depth = jnp.where(has_point, z[safe_idx], 0.0).reshape(h, w, 1)
    feats_img = jnp.where(
        has_point[:, None], feats[safe_idx], 0.0
    ).reshape(h, w, feats.shape[-1])
    return depth, feats_img


def render_projection_from_srcs(
    src_features: jnp.ndarray,
    src_depths: jnp.ndarray,
    tgt_intrinsics: jnp.ndarray,
    src_intrinsics: jnp.ndarray,
    src2tgt: jnp.ndarray,
    src_masks: jnp.ndarray | None = None,
    depth_range: tuple[float, float] | None = None,
    collision: str = "nearest",
    splat_stride: int = 1,
    pallas: bool | None = None,
) -> SplatResult:
    """Forward-splat N source RGB(-D) views into the target view.

    Rebuild of reference warp.py:194-286 with NHWC layout.

    Args:
      src_features: [B, N, H, W, C] source images (C=3 RGB in [-1, 1]).
      src_depths: [B, N, H, W] source z-depths.
      tgt_intrinsics: [B, 3, 3].
      src_intrinsics: [B, N, 3, 3].
      src2tgt: [B, N, 4, 4] rigid transforms source cam -> target cam.
      src_masks: optional [B, N] float/bool validity of each (padded) source;
        invalid sources contribute no points (the reference pads batches with
        zero sources + src_masks, data/clevr-infinite.py:147-155).
      depth_range: optional (lo, hi); outside -> extrapolation region and
        features zeroed for z >= hi (reference warp.py:280-284).
      collision: 'nearest' | 'last' (see module docstring).
      splat_stride: opt-in production knob (s > 1 requires 'nearest' /
        'nearest_exact'): splat every s-th source pixel, with each source
        phase-shifted through the s x s offset cells — with >= s^2 sources
        the union of subsampled grids covers every phase, and the 3x3
        median pass fills residual holes. The z-buffer scatter is the
        splat's serial-floor cost and scales 1/s^2. s=1 is the reference
        behavior (every pixel, warp.py:218).
    """
    b, n, h, w, c = src_features.shape
    k_inv = inv3x3(src_intrinsics.reshape(b * n, 3, 3))
    pts = pixel2cam(src_depths.reshape(b * n, h, w), k_inv)  # [BN, H, W, 3]
    t = src2tgt.reshape(b * n, 4, 4)
    pts = (
        jnp.einsum("bij,bhwj->bhwi", t[:, :3, :3], pts)
        + t[:, None, None, :3, 3]
    )
    s = int(splat_stride)
    if s > 1:
        if collision == "last":
            raise ValueError("splat_stride > 1 requires collision='nearest'")
        # per-source phase offsets over the s x s cell: source k samples
        # pixels (oy + s*i, ox + s*j) with (oy, ox) cycling through the cell
        pts = pts.reshape(b, n, h, w, 3)
        fsub, psub = [], []
        for k in range(n):
            oy, ox = (k // s) % s, k % s
            psub.append(pts[:, k, oy::s, ox::s, :][:, : h // s, : w // s])
            fsub.append(
                src_features[:, k, oy::s, ox::s, :][:, : h // s, : w // s]
            )
        pts = jnp.stack(psub, axis=1)  # [B, N, H//s, W//s, 3]
        feats_src = jnp.stack(fsub, axis=1)
        hw_pts = (h // s) * (w // s)
        pts = pts.reshape(b, n * hw_pts, 3)
        feats = feats_src.reshape(b, n * hw_pts, c)
    else:
        hw_pts = h * w
        pts = pts.reshape(b, n * h * w, 3)
        feats = src_features.reshape(b, n * h * w, c)

    # Project with target intrinsics; pixel index = trunc(u + 0.5)
    # (reference warp.py:222-225: `(pix2d + 0.5).long()`; trunc==floor for
    # in-bounds pixels, and out-of-bounds are masked anyway).
    proj = jnp.einsum("bij,bpj->bpi", tgt_intrinsics, pts)
    zs = proj[..., 2]
    uv = proj[..., :2] / zs[..., None]
    pix = jnp.floor(uv + 0.5).astype(jnp.int32)
    valid = (
        (pix[..., 0] >= 0)
        & (pix[..., 0] < w)
        & (pix[..., 1] >= 0)
        & (pix[..., 1] < h)
    )
    if src_masks is not None:
        per_point = jnp.repeat(
            src_masks.astype(bool), hw_pts, axis=1, total_repeat_length=n * hw_pts
        )
        valid = valid & per_point
    if collision in ("nearest", "nearest_exact"):
        # Points behind the camera must not win the z-buffer (the reference's
        # last-write mode can scatter them; 'last' keeps that for parity).
        valid = valid & (zs > 0)

    if collision == "nearest":
        # one whole-batch scatter (vmap over the scatter serializes on TPU)
        raw_depth, raw_feats = _zbuffer_scatter_batched_nearest(
            pix, zs, feats, valid, h, w, pallas=pallas
        )
    else:
        # the reference's serial write order is pixel-major (point (p, n)
        # writes at step p*N + n; see _zbuffer_scatter docstring): our
        # flattening is source-major (index n*HW + p), so priority remaps
        last_priority = None
        if collision == "last":
            i = jnp.arange(n * h * w, dtype=jnp.int32)
            last_priority = (i % (h * w)) * n + i // (h * w)

        def splat_one(pix_b, z_b, feats_b, valid_b):
            return _zbuffer_scatter(
                pix_b[:, 0], pix_b[:, 1], z_b, feats_b, valid_b, h, w,
                collision, last_priority,
            )

        raw_depth, raw_feats = jax.vmap(splat_one)(pix, zs, feats, valid)

    fill_depth, fill_feats = raw_depth, raw_feats
    if s > 1:
        # strided mode: close the subsampling holes with a z-buffer-
        # consistent dilation BEFORE the median merge (see
        # _fill_from_nearest_neighbor — the median alone cannot close the
        # regular grid left by a single valid source). SplatResult.raw_*
        # stay truly raw (pre-fill), as in the s=1 path.
        fill_depth, fill_feats = _fill_from_nearest_neighbor(raw_depth, raw_feats)

    # Median hole filling: only zero pixels take the median value
    # (reference warp.py:271-279; note the reference masks features
    # per-channel with (feats == 0), replicated here).
    median_feats = median_blur_3x3(fill_feats)
    median_depth = median_blur_3x3(fill_depth)
    merge_feats = jnp.where(fill_feats == 0.0, median_feats, fill_feats)
    merge_depth = jnp.where(fill_depth == 0.0, median_depth, fill_depth)

    if depth_range is not None:
        lo, hi = depth_range
        extrapolation = ~((merge_depth >= lo) & (merge_depth <= hi))
        merge_feats = jnp.where(merge_depth >= hi, 0.0, merge_feats)
    else:
        extrapolation = merge_depth <= 0.0

    return SplatResult(
        depth=merge_depth,
        features=merge_feats,
        extrapolation_mask=extrapolation,
        raw_depth=raw_depth,
        raw_features=raw_feats,
    )

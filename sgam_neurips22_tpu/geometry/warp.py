"""Inverse warping: pull source pixels into the target view.

Rebuild of the reference's two inverse-warp variants:
- `inverse_warp` (sgam/point_rendering/warp.py:155-191): single source,
  bilinear sampling + depth-consistency validity mask.
- `InfiniteSceneGeneration.inverse_warping`
  (sgam/inference_pipeline.py:662-743): multi-source nearest sampling with a
  per-pixel z-buffer keyed on |warped_src_depth - src_depth|, used by the
  TSDF map-conditioned path.

grid_sample here is a gather (XLA lowers to dynamic-gather on TPU), with
torch's align_corners=False unnormalization and zero padding semantics.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from sgam_neurips22_tpu.geometry.camera import cam2pixel, inv3x3, pixel2cam


def _unnormalize(coord: jnp.ndarray, size: int) -> jnp.ndarray:
    """torch grid_sample align_corners=False: ((coord + 1) * size - 1) / 2."""
    return ((coord + 1.0) * size - 1.0) / 2.0


def _nearest_indices(grid: jnp.ndarray, h: int, w: int):
    """torch grid_sample(nearest, zeros, align_corners=False) index math:
    (ix, iy, in_bounds) for normalized coords [..., 2]. Single home — the
    winner-only gather in `inverse_warp_multi_src` relies on computing the
    EXACT same mask/indices as `grid_sample_nearest`."""
    ix = jnp.round(_unnormalize(grid[..., 0], w)).astype(jnp.int32)
    iy = jnp.round(_unnormalize(grid[..., 1], h)).astype(jnp.int32)
    inb = (ix >= 0) & (ix < w) & (iy >= 0) & (iy < h)
    return ix, iy, inb


def grid_sample_nearest(img: jnp.ndarray, grid: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbor grid sample with zero padding.

    Args:
      img: [B, H, W, C].
      grid: [B, Ho, Wo, 2] normalized (x, y) in [-1, 1].
    Returns:
      [B, Ho, Wo, C].
    """
    b, h, w, c = img.shape
    ix, iy, inb = _nearest_indices(grid, h, w)
    ixc = jnp.clip(ix, 0, w - 1)
    iyc = jnp.clip(iy, 0, h - 1)

    def gather_one(img_b, iy_b, ix_b, inb_b):
        vals = img_b[iy_b, ix_b]
        return jnp.where(inb_b[..., None], vals, 0.0)

    return jax.vmap(gather_one)(img, iyc, ixc, inb)


def grid_sample_bilinear(img: jnp.ndarray, grid: jnp.ndarray) -> jnp.ndarray:
    """Bilinear grid sample with zero padding, align_corners=False.

    Args:
      img: [B, H, W, C]; grid: [B, Ho, Wo, 2] normalized (x, y).
    """
    b, h, w, c = img.shape
    fx = _unnormalize(grid[..., 0], w)
    fy = _unnormalize(grid[..., 1], h)
    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    wx = fx - x0
    wy = fy - y0

    def sample_int(img_b, iy, ix):
        inb = (ix >= 0) & (ix < w) & (iy >= 0) & (iy < h)
        vals = img_b[jnp.clip(iy, 0, h - 1), jnp.clip(ix, 0, w - 1)]
        return jnp.where(inb[..., None], vals, 0.0)

    def gather_one(img_b, x0_b, y0_b, wx_b, wy_b):
        x0i = x0_b.astype(jnp.int32)
        y0i = y0_b.astype(jnp.int32)
        v00 = sample_int(img_b, y0i, x0i)
        v01 = sample_int(img_b, y0i, x0i + 1)
        v10 = sample_int(img_b, y0i + 1, x0i)
        v11 = sample_int(img_b, y0i + 1, x0i + 1)
        wxe = wx_b[..., None]
        wye = wy_b[..., None]
        return (
            v00 * (1 - wxe) * (1 - wye)
            + v01 * wxe * (1 - wye)
            + v10 * (1 - wxe) * wye
            + v11 * wxe * wye
        )

    return jax.vmap(gather_one)(img, x0, y0, wx, wy)


def inverse_warp(
    src_img: jnp.ndarray,
    tgt_depth: jnp.ndarray,
    src_depth: jnp.ndarray,
    pose: jnp.ndarray,
    tgt_intrinsics: jnp.ndarray,
    src_intrinsics: jnp.ndarray,
    depth_threshold: float = 1.0,
):
    """Single-source inverse warp with depth-consistency mask.

    Rebuild of reference warp.py:155-191 (bilinear sampling).

    Args:
      src_img: [B, H, W, C]; tgt_depth/src_depth: [B, H, W];
      pose: [B, 3, 4] target-cam -> source-cam; intrinsics [B, 3, 3].
    Returns:
      (projected_img [B, H, W, C], valid [B, H, W, 1] bool)
    """
    cam_pts = pixel2cam(tgt_depth, inv3x3(tgt_intrinsics))
    proj = src_intrinsics @ pose  # [B, 3, 4]
    coords, warped_src_depth = cam2pixel(cam_pts, proj[..., :3], proj[..., 3])
    valid_depth = (warped_src_depth - src_depth) <= depth_threshold
    projected = grid_sample_bilinear(src_img, coords)
    valid_pts = jnp.max(jnp.abs(coords), axis=-1) <= 1.0
    valid = (valid_pts & valid_depth)[..., None]
    return projected * valid, valid


def inverse_warp_multi_src(
    src_imgs: jnp.ndarray,
    src_depths: jnp.ndarray,
    tgt_depth: jnp.ndarray,
    src_intrinsics: jnp.ndarray,
    tgt_intrinsics: jnp.ndarray,
    tgt2srcs: jnp.ndarray,
):
    """Multi-source inverse warp with |warped - src| z-buffer merge.

    Rebuild of reference inference_pipeline.py:662-743 (the TSDF
    map-conditioned path): unproject the map-rendered target depth, project
    into each source view, sample nearest RGB (shifted +2 so that true-black
    content survives the `sum > 0` occupancy test, reference :707,:733),
    then per-pixel keep the source with the smallest depth discrepancy.

    Args:
      src_imgs: [B, N, H, W, 3] in [-1, 1].
      src_depths: [B, N, H, W].
      tgt_depth: [B, H, W] (rendered from the map).
      src_intrinsics: [B, N, 3, 3]; tgt_intrinsics: [B, 3, 3];
      tgt2srcs: [B, N, 4, 4].
    Returns:
      warped [B, H, W, 3] in [-1, 1]; zeros where no source is valid.
    """
    b, n, h, w, c = src_imgs.shape
    cam_pts = pixel2cam(tgt_depth, inv3x3(tgt_intrinsics))  # [B,H,W,3]

    # Flatten (B, N) like the reference does.
    cam_pts_r = jnp.repeat(cam_pts, n, axis=0).reshape(b, n, h, w, 3)
    proj = jnp.einsum("bnij,bnjk->bnik", src_intrinsics, tgt2srcs[..., :3, :])
    rot = proj[..., :3]
    tr = proj[..., 3]
    coords, warped_src_depth = cam2pixel(
        cam_pts_r.reshape(b * n, h, w, 3),
        rot.reshape(b * n, 3, 3),
        tr.reshape(b * n, 3),
        clamp_z=None,  # the pipeline's cam2pixel copy does not clamp (:653)
    )
    # The z-buffer key needs NO sampled pixel values: the reference's
    # `sum(src + 2) > 0` occupancy test (:733) is exactly the in-bounds mask
    # (in-bounds channels are >= 1 after the +2 shift, zero padding
    # otherwise), so the winner per pixel is decided from the projection
    # alone and only the WINNING source's RGB is gathered — one gather per
    # target pixel instead of one per source (the warp gather traced at
    # 2.9 ms/frame with 5 sources; gathers run ~9 ns/elem serial, NOTES.md).
    ix, iy, inb = _nearest_indices(coords, h, w)
    inb = inb.reshape(b, n, h, w)
    warped_src_depth = warped_src_depth.reshape(b, n, h, w)
    depth_diff = jnp.abs(
        warped_src_depth - src_depths
    )  # z-buffer key (reference :696)
    valid = inb & (warped_src_depth >= 0.0)
    key = jnp.where(valid, depth_diff, jnp.inf)
    # Reference scans sources in order with strict '<', so the FIRST source
    # achieving the min key wins; argmin picks the first min index too.
    winner = jnp.argmin(key, axis=1)  # [B, H, W]
    any_valid = jnp.any(valid, axis=1)  # [B, H, W]
    # one fused gather through the linearized [N*H*W] source stack: index
    # (winner, iy, ix); losers' clamped coords are masked by any_valid
    # (wherever any_valid holds, the winner is in-bounds by construction).
    # Per-source pixel offsets combine elementwise BEFORE the winner gather,
    # so the coordinates cost one take_along_axis, not two.
    lin_src = (
        jnp.clip(iy, 0, h - 1) * w + jnp.clip(ix, 0, w - 1)
    ).reshape(b, n, h, w)
    lin_win = jnp.take_along_axis(lin_src, winner[:, None], axis=1)[:, 0]
    lin = winner * (h * w) + lin_win  # [B, H, W]
    picked = jax.vmap(lambda im, li: im.reshape(-1, c)[li])(src_imgs, lin)
    # bit-parity with the reference's (img + 2) sample-then-subtract round
    # trip (:707): the +2/-2 costs the values one f32 ULP, and the parity
    # tests compare exactly
    picked = (picked + 2.0) - 2.0
    return jnp.where(any_valid[..., None], picked, 0.0)

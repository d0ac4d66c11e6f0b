"""Camera geometry primitives (pure JAX, NHWC).

TPU-native rebuild of the reference's point-rendering math
(reference: sgam/point_rendering/warp.py:12-69 `set_id_grid`/`pixel2cam`/
`cam2pixel`; sgam/inference_pipeline.py:840-858 ray<->z depth codecs).

Conventions:
- Images and depth maps are NHWC: depth [B, H, W], points [B, H, W, 3].
- Pixel lattice is (x=j, y=i, 1) in units of pixel index, matching the
  reference's `set_id_grid` (x varies along W).
- Normalized pixel coordinates are in [-1, 1] with the align-corners
  convention 2*(u/(W-1)) - 1 used by the reference's `cam2pixel`.
"""
from __future__ import annotations

import jax.numpy as jnp


def pixel_grid(h: int, w: int, dtype=jnp.float32) -> jnp.ndarray:
    """Homogeneous pixel lattice [H, W, 3] with rows (x, y, 1).

    reference: sgam/point_rendering/warp.py:12-18."""
    x = jnp.arange(w, dtype=dtype)[None, :].repeat(h, axis=0)
    y = jnp.arange(h, dtype=dtype)[:, None].repeat(w, axis=1)
    ones = jnp.ones((h, w), dtype=dtype)
    return jnp.stack([x, y, ones], axis=-1)


def pixel2cam(depth: jnp.ndarray, k_inv: jnp.ndarray) -> jnp.ndarray:
    """Unproject a depth map to camera-frame 3D points.

    Args:
      depth: [B, H, W] z-depth.
      k_inv: [B, 3, 3] inverse intrinsics.
    Returns:
      [B, H, W, 3] camera-frame points (reference: warp.py:28-40, which
      returns [B, 3, H, W]; layout here is channels-last for TPU).
    """
    b, h, w = depth.shape
    pix = pixel_grid(h, w, depth.dtype)  # [H, W, 3]
    rays = jnp.einsum("bij,hwj->bhwi", k_inv, pix)
    return rays * depth[..., None]


def cam2pixel(
    cam_points: jnp.ndarray,
    rot: jnp.ndarray,
    tr: jnp.ndarray,
    clamp_z: float | None = 1e-3,
):
    """Project camera-frame points through [rot|tr] and normalize to [-1, 1].

    Args:
      cam_points: [B, H, W, 3].
      rot: [B, 3, 3] (already includes intrinsics, i.e. K @ R).
      tr:  [B, 3] or [B, 3, 1].
      clamp_z: if not None, clamp depth from below before dividing
        (reference warp.py:63 clamps at 1e-3; the pipeline's copy at
        inference_pipeline.py:653 does not clamp).
    Returns:
      (norm_coords [B, H, W, 2] in [-1,1], z [B, H, W]).
    """
    b, h, w, _ = cam_points.shape
    if tr.ndim == 3:
        tr = tr[..., 0]
    p = jnp.einsum("bij,bhwj->bhwi", rot, cam_points) + tr[:, None, None, :]
    x, y, z = p[..., 0], p[..., 1], p[..., 2]
    zd = jnp.maximum(z, clamp_z) if clamp_z is not None else z
    x_norm = 2.0 * (x / zd) / (w - 1) - 1.0
    y_norm = 2.0 * (y / zd) / (h - 1) - 1.0
    return jnp.stack([x_norm, y_norm], axis=-1), z


def inv3x3(m: jnp.ndarray) -> jnp.ndarray:
    """Closed-form (adjugate/determinant) 3x3 inverse, any batch shape.

    jnp.linalg.inv routes even 3x3s through LU factorization + triangular
    solves, which XLA:TPU lowers to serial while-loops of
    dynamic-update-slices — traced at ~6 ms/frame of pure loop overhead in
    the map-requery step (NOTES.md round 2). The closed form is exact,
    elementwise, and fuses.
    """
    a, b, c = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    d, e, f = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    g, h, i = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    ca, cb, cc = e * i - f * h, c * h - b * i, b * f - c * e
    cd, ce, cf = f * g - d * i, a * i - c * g, c * d - a * f
    cg, ch, ci = d * h - e * g, b * g - a * h, a * e - b * d
    det = a * ca + b * cd + c * cg
    adj = jnp.stack(
        [
            jnp.stack([ca, cb, cc], axis=-1),
            jnp.stack([cd, ce, cf], axis=-1),
            jnp.stack([cg, ch, ci], axis=-1),
        ],
        axis=-2,
    )
    return adj / det[..., None, None]


def plane_z_depth(
    k: jnp.ndarray,
    w2c: jnp.ndarray,
    plane_n: jnp.ndarray,
    plane_d: jnp.ndarray,
    hw: tuple,
    lo: float,
    hi: float,
) -> jnp.ndarray:
    """Analytic z-depth of the world plane {x : n.x = d} from pose w2c.

    The world-consistent synthetic scene behind the bench's --coherent
    map-requery mode: every camera that looks at the plane sees depth that
    agrees exactly with every other camera, so TSDF fusion of consecutive
    generated frames converges the surface pool the way trained weights do
    (VERDICT r3 weak #1/#5: all random-weight map numbers are worst-case
    because generated depth is noise and dedup never fires).

    Args:
      k: [3, 3] intrinsics; w2c: [4, 4] world->camera.
      plane_n: [3] unit plane normal (world); plane_d: scalar n.x offset.
      hw: (H, W); lo/hi: clamp range for parallel/behind rays.
    Returns:
      [H, W] z-depth, clamped to [lo, hi].
    """
    h, w = hw
    r_c2w = w2c[:3, :3].T
    cam_center = -r_c2w @ w2c[:3, 3]
    pix = pixel_grid(h, w)  # [H, W, 3] rows (x, y, 1)
    rays_cam = jnp.einsum("ij,hwj->hwi", inv3x3(k), pix)  # z-component == 1
    rays_w = jnp.einsum("ij,hwj->hwi", r_c2w, rays_cam)
    denom = jnp.einsum("i,hwi->hw", plane_n, rays_w)
    num = plane_d - jnp.dot(plane_n, cam_center)
    # z-depth along the camera axis equals the ray parameter t because the
    # camera-frame ray has unit z (pixel2cam convention)
    d = num / jnp.where(jnp.abs(denom) < 1e-6, jnp.sign(denom) * 1e-6 + 1e-12, denom)
    return jnp.clip(d, lo, hi)


def make_intrinsics(fx: float, fy: float, cx: float, cy: float) -> jnp.ndarray:
    return jnp.array(
        [[fx, 0.0, cx], [0.0, fy, cy], [0.0, 0.0, 1.0]], dtype=jnp.float32
    )


def pose_matrix(r: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """[..., 4, 4] rigid transform from [..., 3, 3] rotation + [..., 3] translation.

    reference: model.py:192-195 builds T_src2tgt the same way."""
    batch = r.shape[:-2]
    eye = jnp.broadcast_to(jnp.eye(4, dtype=r.dtype), (*batch, 4, 4))
    top = jnp.concatenate([r, t[..., None]], axis=-1)  # [..., 3, 4]
    return eye.at[..., :3, :].set(top)


def relative_transform(t_tgt: jnp.ndarray, t_src: jnp.ndarray) -> jnp.ndarray:
    """T_rel = T_tgt @ inv(T_src) (reference: inference_pipeline.py:562)."""
    return t_tgt @ jnp.linalg.inv(t_src)


def opengl_to_opencv(c2w: jnp.ndarray) -> jnp.ndarray:
    """Flip Y/Z axes: c2w @ diag(1,-1,-1,1) (reference: inference_pipeline.py:180)."""
    flip = jnp.diag(jnp.array([1.0, -1.0, -1.0, 1.0], dtype=c2w.dtype))
    return c2w @ flip


def _ray_scale(k: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """sqrt(f^2 + (cx - y - .5)^2 + (cy - x - .5)^2) / f over a meshgrid with
    torch.meshgrid(x, y) indexing (i.e. xs varies along rows).

    Replicates the reference's ray<->z conversion including its transposed
    meshgrid quirk (inference_pipeline.py:840-858: `xs, ys = meshgrid(x, y)`
    gives xs[i,j]=i, ys[i,j]=j, then uses (cx - ys - .5) and (cy - xs - .5)).
    """
    f = k[0, 0]
    xs = jnp.arange(w, dtype=jnp.float32)[:, None].repeat(h, axis=1)  # xs[i,j]=i
    ys = jnp.arange(h, dtype=jnp.float32)[None, :].repeat(w, axis=0)  # ys[i,j]=j
    return jnp.sqrt(f**2 + (k[0, 2] - ys - 0.5) ** 2 + (k[1, 2] - xs - 0.5) ** 2) / f


def ray_depth_to_z(depth: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    """Ray (Euclidean) depth -> z-depth (reference: inference_pipeline.py:840-847)."""
    h, w = depth.shape[-2:]
    return depth / _ray_scale(k, h, w)


def z_depth_to_ray(depth: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    """z-depth -> ray depth (reference: inference_pipeline.py:849-858)."""
    h, w = depth.shape[-2:]
    return depth * _ray_scale(k, h, w)

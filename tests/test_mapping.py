"""TSDF mapping tests: integrate/raycast round-trips + PLY export."""
import jax.numpy as jnp
import numpy as np

from sgam_neurips22_tpu.geometry import make_intrinsics
from sgam_neurips22_tpu.mapping.pointcloud import (
    read_ply,
    unproject_to_color_point_cloud,
    write_ply,
)
from sgam_neurips22_tpu.mapping.tsdf import (
    TSDFConfig,
    create_volume,
    extract_points,
    integrate,
    render_depth,
)

H = W = 48
K = make_intrinsics(40.0, 40.0, (W - 1) / 2, (H - 1) / 2)
CFG = TSDFConfig(
    dims=(64, 64, 64), voxel_size=0.1, sdf_trunc=0.4, origin=(-3.2, -3.2, 0.0)
)


def flat_wall_frame(depth_val=3.0):
    depth = np.full((H, W), depth_val, np.float32)
    rgb = np.full((H, W, 3), 0.5, np.float32)
    return jnp.asarray(depth), jnp.asarray(rgb)


def test_integrate_then_raycast_recovers_plane():
    """Fuse a flat wall at z=3 from the identity camera, re-render from the
    same pose: depth must come back ~3 in the central region."""
    vol = create_volume(CFG)
    depth, rgb = flat_wall_frame(3.0)
    ext = jnp.eye(4)
    vol = integrate(vol, CFG, depth, rgb, K, ext)
    assert float(vol.weight.max()) > 0
    rendered = np.asarray(
        render_depth(vol, CFG, K, ext, (H, W), near=1.0, far=5.0, n_samples=128)
    )
    center = rendered[16:32, 16:32]
    assert (center > 0).all(), "central rays must hit the fused wall"
    np.testing.assert_allclose(center, 3.0, atol=0.08)


def test_raycast_from_shifted_pose():
    """Render the fused wall from a camera moved 0.5m toward it: depth ~2.5."""
    vol = create_volume(CFG)
    depth, rgb = flat_wall_frame(3.0)
    vol = integrate(vol, CFG, depth, rgb, K, jnp.eye(4))
    ext = jnp.eye(4).at[2, 3].set(0.5)  # world->cam: z' = z + 0.5... wall at 3.5?
    # extrinsic T: cam = R @ world + t; moving camera +0.5 along z means
    # world point z=3 -> cam z = 3 + 0.5? No: camera at z=-0.5 looking +z,
    # so cam z = 3 - (-0.5) = 3.5. t = -R @ C = +0.5 => C = (0,0,-0.5).
    rendered = np.asarray(
        render_depth(vol, CFG, K, ext, (H, W), near=1.0, far=5.0, n_samples=160)
    )
    center = rendered[20:28, 20:28]
    assert (center > 0).all()
    np.testing.assert_allclose(center, 3.5, atol=0.08)


def test_unobserved_rays_return_zero():
    vol = create_volume(CFG)
    rendered = np.asarray(
        render_depth(vol, CFG, K, jnp.eye(4), (H, W), near=1.0, far=5.0, n_samples=32)
    )
    assert (rendered == 0).all()


def test_multi_frame_fusion_averages():
    vol = create_volume(CFG)
    d1, rgb = flat_wall_frame(3.0)
    vol = integrate(vol, CFG, d1, rgb, K, jnp.eye(4))
    vol = integrate(vol, CFG, d1, rgb, K, jnp.eye(4))
    w = np.asarray(vol.weight)
    assert float(w.max()) == 2.0


def test_extract_points_near_surface():
    vol = create_volume(CFG)
    depth, rgb = flat_wall_frame(3.0)
    vol = integrate(vol, CFG, depth, rgb, K, jnp.eye(4))
    pts, cols = extract_points(vol, CFG, max_abs_tsdf=0.25)
    assert len(pts) > 0
    # surface points should sit near z=3
    assert np.abs(pts[:, 2] - 3.0).mean() < 0.15
    assert np.allclose(cols, 0.5, atol=1e-5)


def test_ply_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(100, 3)).astype(np.float32)
    cols = rng.uniform(0, 1, size=(100, 3)).astype(np.float32)
    path = str(tmp_path / "cloud.ply")
    write_ply(path, pts, cols)
    pts2, cols2 = read_ply(path)
    np.testing.assert_allclose(pts2, pts, rtol=1e-6)
    np.testing.assert_allclose(cols2, cols, atol=1 / 255.0 + 1e-6)


def test_unproject_identity_depth():
    depth = np.full((H, W), 2.0, np.float32)
    rgb = np.full((H, W, 3), -0.5, np.float32)  # [-1,1]-range input
    pts, cols = unproject_to_color_point_cloud(rgb, depth, np.asarray(K), np.eye(4))
    assert pts.shape == (H * W, 3)
    np.testing.assert_allclose(pts[:, 2], 2.0, rtol=1e-5)
    assert np.allclose(cols, 0.25)  # (-0.5+1)/2


def test_nearest_interp_raycast_close_to_trilinear():
    vol = create_volume(CFG)
    depth, rgb = flat_wall_frame(3.0)
    vol = integrate(vol, CFG, depth, rgb, K, jnp.eye(4))
    tri = np.asarray(render_depth(vol, CFG, K, jnp.eye(4), (H, W), 1.0, 5.0, 128))
    near = np.asarray(
        render_depth(vol, CFG, K, jnp.eye(4), (H, W), 1.0, 5.0, 128, interp="nearest")
    )
    hit = (tri > 0) & (near > 0)
    assert hit.mean() > 0.2
    # agreement within ~1 voxel where both hit
    assert np.abs(tri[hit] - near[hit]).max() < CFG.voxel_size * 2

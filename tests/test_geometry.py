"""Geometry unit tests: closed-form cases + torch parity for the tricky ops."""
import jax.numpy as jnp
import numpy as np
import pytest

from sgam_neurips22_tpu.geometry import (
    CLEVR_CODEC,
    GOOGLE_EARTH_CODEC,
    cam2pixel,
    euler2mat,
    grid_sample_bilinear,
    grid_sample_nearest,
    make_intrinsics,
    median_blur_3x3,
    pixel2cam,
    pose_matrix,
    ray_depth_to_z,
    relative_transform,
    render_projection_from_srcs,
    z_depth_to_ray,
)


def rand_pose(rng):
    angle = rng.uniform(-0.3, 0.3, size=(1, 3)).astype(np.float32)
    r = np.asarray(euler2mat(jnp.asarray(angle)))[0]
    t = rng.uniform(-0.5, 0.5, size=3).astype(np.float32)
    return np.asarray(pose_matrix(jnp.asarray(r)[None], jnp.asarray(t)[None]))[0]


def test_pixel2cam_roundtrip():
    rng = np.random.default_rng(0)
    k = make_intrinsics(100.0, 100.0, 15.5, 15.5)
    depth = jnp.asarray(rng.uniform(2.0, 10.0, size=(2, 32, 32)).astype(np.float32))
    pts = pixel2cam(depth, jnp.linalg.inv(k)[None].repeat(2, axis=0))
    assert pts.shape == (2, 32, 32, 3)
    # z component is the depth itself
    np.testing.assert_allclose(np.asarray(pts[..., 2]), np.asarray(depth), rtol=1e-5)
    # project back with identity pose
    rot = k[None].repeat(2, axis=0)
    coords, z = cam2pixel(pts, rot, jnp.zeros((2, 3)))
    np.testing.assert_allclose(np.asarray(z), np.asarray(depth), rtol=1e-5)
    # normalized coords must land exactly on the pixel lattice
    x_norm = np.asarray(coords[..., 0])
    expect = 2 * np.arange(32) / 31 - 1
    np.testing.assert_allclose(x_norm[0, 0], expect, atol=1e-5)


def test_relative_transform_composition():
    rng = np.random.default_rng(1)
    t_a = jnp.asarray(rand_pose(rng))[None]
    t_b = jnp.asarray(rand_pose(rng))[None]
    rel = relative_transform(t_a, t_b)
    np.testing.assert_allclose(
        np.asarray(rel @ t_b), np.asarray(t_a), atol=1e-5
    )


def test_ray_z_depth_roundtrip():
    rng = np.random.default_rng(2)
    k = make_intrinsics(355.5555, 355.5555, 128.0, 128.0)
    d = jnp.asarray(rng.uniform(7, 16, size=(256, 256)).astype(np.float32))
    back = z_depth_to_ray(ray_depth_to_z(d, k), k)
    np.testing.assert_allclose(np.asarray(back), np.asarray(d), rtol=1e-5)


def test_median_blur_matches_torch_lower_median():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(3)
    x = rng.normal(size=(2, 16, 16, 3)).astype(np.float32)
    ours = np.asarray(median_blur_3x3(jnp.asarray(x)))

    # reference: conv-unfold + torch.median (warp.py:306-347)
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    b, c, h, w = xt.shape
    kernel = torch.zeros(9, 9)
    for i in range(9):
        kernel[i, i] = 1.0
    kernel = kernel.view(9, 1, 3, 3)
    feats = torch.nn.functional.conv2d(
        xt.reshape(b * c, 1, h, w), kernel, padding=1, stride=1
    ).view(b, c, -1, h, w)
    med = torch.median(feats, dim=2)[0].permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, med, atol=1e-6)


def test_depth_codecs_roundtrip_and_anchors():
    for codec in (CLEVR_CODEC, GOOGLE_EARTH_CODEC):
        lo, hi = codec.depth_range
        d = jnp.linspace(lo, hi, 64)
        disp = codec.encode(d)
        assert float(disp.max()) <= 1.0 + 1e-5
        assert float(disp.min()) >= -1.0 - 1e-5
        np.testing.assert_allclose(np.asarray(codec.decode(disp)), np.asarray(d), rtol=1e-4)
    # near depth -> disparity +1, far -> -1 (model.py:210-229)
    np.testing.assert_allclose(float(CLEVR_CODEC.encode(jnp.asarray(7.0))), 1.0, atol=1e-5)
    np.testing.assert_allclose(float(CLEVR_CODEC.encode(jnp.asarray(16.0))), -1.0, atol=1e-5)


def test_encode_masked_writes_minus_two():
    d = jnp.full((4, 4), 10.0)
    mask = jnp.zeros((4, 4), bool).at[0, 0].set(True)
    out = CLEVR_CODEC.encode_masked(d, mask)
    assert float(out[0, 0]) == -2.0
    assert float(out[1, 1]) != -2.0


def test_splat_identity_pose_reproduces_source():
    """Splatting a single source onto itself must reproduce it exactly."""
    rng = np.random.default_rng(4)
    h = w = 32
    k = make_intrinsics(20.0, 20.0, (w - 1) / 2, (h - 1) / 2)
    depth = rng.uniform(8.0, 12.0, size=(1, 1, h, w)).astype(np.float32)
    feats = rng.uniform(-1, 1, size=(1, 1, h, w, 3)).astype(np.float32)
    res = render_projection_from_srcs(
        jnp.asarray(feats),
        jnp.asarray(depth),
        k[None],
        k[None, None],
        jnp.eye(4)[None, None],
    )
    np.testing.assert_allclose(
        np.asarray(res.features[0]), feats[0, 0], atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(res.depth[0, ..., 0]), depth[0, 0], rtol=1e-4
    )
    assert not bool(res.extrapolation_mask.any())


def test_splat_nearest_beats_farther_point():
    """Two sources putting different-depth points on the same pixel: the
    nearer one must win in 'nearest' mode."""
    h = w = 8
    k = make_intrinsics(10.0, 10.0, (w - 1) / 2, (h - 1) / 2)
    near = np.full((h, w), 5.0, np.float32)
    far = np.full((h, w), 9.0, np.float32)
    depth = np.stack([far, near])[None]  # far source first
    feats = np.zeros((1, 2, h, w, 3), np.float32)
    feats[0, 0] = 0.25  # far
    feats[0, 1] = 0.75  # near
    res = render_projection_from_srcs(
        jnp.asarray(feats),
        jnp.asarray(depth),
        k[None],
        jnp.stack([k, k])[None],
        jnp.broadcast_to(jnp.eye(4), (1, 2, 4, 4)),
        collision="nearest",
    )
    # identity pose => each pixel sees both points; near (0.75) must win
    assert np.allclose(np.asarray(res.features), 0.75)
    # 'last' mode reproduces reference serial semantics: later source wins
    res_last = render_projection_from_srcs(
        jnp.asarray(feats),
        jnp.asarray(depth),
        k[None],
        jnp.stack([k, k])[None],
        jnp.broadcast_to(jnp.eye(4), (1, 2, 4, 4)),
        collision="last",
    )
    assert np.allclose(np.asarray(res_last.features), 0.75)  # src 1 is last
    np.testing.assert_allclose(np.asarray(res_last.depth), 5.0, rtol=1e-5)


def test_splat_depth_range_masks_extrapolation():
    h = w = 16
    k = make_intrinsics(10.0, 10.0, (w - 1) / 2, (h - 1) / 2)
    depth = np.full((1, 1, h, w), 20.0, np.float32)  # beyond range hi
    feats = np.full((1, 1, h, w, 3), 0.5, np.float32)
    res = render_projection_from_srcs(
        jnp.asarray(feats),
        jnp.asarray(depth),
        k[None],
        k[None, None],
        jnp.eye(4)[None, None],
        depth_range=(7.0, 16.0),
    )
    assert bool(res.extrapolation_mask.all())
    assert np.allclose(np.asarray(res.features), 0.0)


def test_splat_src_mask_excludes_padded_source():
    h = w = 8
    k = make_intrinsics(10.0, 10.0, (w - 1) / 2, (h - 1) / 2)
    depth = np.stack(
        [np.full((h, w), 5.0, np.float32), np.full((h, w), 3.0, np.float32)]
    )[None]
    feats = np.zeros((1, 2, h, w, 3), np.float32)
    feats[0, 0] = 0.5
    feats[0, 1] = -0.9  # masked-out source
    res = render_projection_from_srcs(
        jnp.asarray(feats),
        jnp.asarray(depth),
        k[None],
        jnp.stack([k, k])[None],
        jnp.broadcast_to(jnp.eye(4), (1, 2, 4, 4)),
        src_masks=jnp.asarray([[1.0, 0.0]]),
    )
    assert np.allclose(np.asarray(res.features), 0.5)


def test_grid_sample_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(5)
    img = rng.normal(size=(2, 12, 10, 3)).astype(np.float32)
    grid = rng.uniform(-1.3, 1.3, size=(2, 7, 9, 2)).astype(np.float32)

    for mode, fn in (("nearest", grid_sample_nearest), ("bilinear", grid_sample_bilinear)):
        ours = np.asarray(fn(jnp.asarray(img), jnp.asarray(grid)))
        theirs = (
            torch.nn.functional.grid_sample(
                torch.from_numpy(img).permute(0, 3, 1, 2),
                torch.from_numpy(grid),
                mode=mode,
                padding_mode="zeros",
                align_corners=False,
            )
            .permute(0, 2, 3, 1)
            .numpy()
        )
        np.testing.assert_allclose(ours, theirs, atol=2e-5, err_msg=mode)


def test_splat_nearest_exact_matches_packed():
    """The packed-key fast path and the exact 3-op path agree (away from
    z-quantization tie buckets)."""
    rng = np.random.default_rng(9)
    h = w = 16
    k = make_intrinsics(10.0, 10.0, (w - 1) / 2, (h - 1) / 2)
    depth = rng.uniform(5.0, 15.0, size=(1, 3, h, w)).astype(np.float32)
    feats = rng.uniform(-1, 1, size=(1, 3, h, w, 3)).astype(np.float32)
    rot = np.asarray(euler2mat(jnp.asarray([[0.05, -0.03, 0.02]])))[0]
    t = np.eye(4, dtype=np.float32)
    t[:3, :3] = rot
    t[:3, 3] = [0.1, -0.2, 0.05]
    t_all = jnp.broadcast_to(jnp.asarray(t), (1, 3, 4, 4))
    ks = jnp.broadcast_to(k, (1, 3, 3, 3))
    fast = render_projection_from_srcs(
        jnp.asarray(feats), jnp.asarray(depth), k[None], ks, t_all,
        collision="nearest",
    )
    exact = render_projection_from_srcs(
        jnp.asarray(feats), jnp.asarray(depth), k[None], ks, t_all,
        collision="nearest_exact",
    )
    # identical winners except where quantization buckets tie -> compare
    # depth maps; disagreements must be within one quantization bucket
    d_f = np.asarray(fast.raw_depth)
    d_e = np.asarray(exact.raw_depth)
    bucket = (depth.max() - depth.min()) / 4095
    assert np.abs(d_f - d_e).max() <= bucket * 3 + 1e-6
    same = np.isclose(d_f, d_e)
    assert same.mean() > 0.98  # almost all pixels pick the same point


def test_splat_stride_phase_offsets_cover_target():
    """Strided splat (the production knob): with >= s^2 identity-pose
    sources, the per-source phase offsets jointly cover every target pixel,
    and the result matches the full splat exactly (same geometry, same
    nearest-wins resolution on a single surface)."""
    rng = np.random.default_rng(9)
    h = w = 32
    n = 5  # >= 2^2 phases
    k = make_intrinsics(20.0, 20.0, (w - 1) / 2, (h - 1) / 2)
    depth = np.broadcast_to(
        rng.uniform(8.0, 12.0, size=(1, 1, h, w)).astype(np.float32), (1, n, h, w)
    )
    feats = np.broadcast_to(
        rng.uniform(-1, 1, size=(1, 1, h, w, 3)).astype(np.float32), (1, n, h, w, 3)
    )
    full = render_projection_from_srcs(
        jnp.asarray(feats), jnp.asarray(depth), k[None],
        jnp.broadcast_to(k, (1, n, 3, 3)),
        jnp.broadcast_to(jnp.eye(4), (1, n, 4, 4)),
    )
    strided = render_projection_from_srcs(
        jnp.asarray(feats), jnp.asarray(depth), k[None],
        jnp.broadcast_to(k, (1, n, 3, 3)),
        jnp.broadcast_to(jnp.eye(4), (1, n, 4, 4)),
        splat_stride=2,
    )
    # identical sources at identity pose: every phase holds the same image,
    # so the union reconstructs it exactly — zero holes, zero error
    assert not bool(strided.extrapolation_mask.any())
    np.testing.assert_allclose(
        np.asarray(strided.features), np.asarray(full.features), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(strided.depth), np.asarray(full.depth), rtol=1e-5
    )


def test_splat_stride_translated_sources_quality():
    """Stride-2 with translated sources: coverage stays near-full and the
    filled image stays close to the full-splat conditioning (smooth scene)."""
    rng = np.random.default_rng(11)
    h = w = 64
    n = 5
    k = make_intrinsics(40.0, 40.0, (w - 1) / 2, (h - 1) / 2)
    base_depth = rng.uniform(9.5, 10.5, size=(h, w)).astype(np.float32)
    # smooth feature field (conv-blurred noise)
    f = rng.uniform(-1, 1, size=(h + 8, w + 8, 3)).astype(np.float32)
    kern = np.ones((5, 5, 1), np.float32) / 25.0
    sm = np.stack(
        [
            sum(f[dy : dy + h, dx : dx + w, :] for dy in range(5) for dx in range(5))
            / 25.0
        ]
    )[0]
    feats = np.broadcast_to(sm, (1, n, h, w, 3)).astype(np.float32)
    depth = np.broadcast_to(base_depth, (1, n, h, w)).astype(np.float32)
    t = np.broadcast_to(np.eye(4), (n, 4, 4)).copy()
    for i in range(n):
        t[i, 0, 3] = 0.08 * (i - 2)  # small lateral parallax
    args = (
        jnp.asarray(feats), jnp.asarray(depth), k[None],
        jnp.broadcast_to(k, (1, n, 3, 3)), jnp.asarray(t)[None],
    )
    full = render_projection_from_srcs(*args)
    strided = render_projection_from_srcs(*args, splat_stride=2)
    # parallax can alias source phases onto each other (a uniform-depth
    # lateral shift flips a whole source's phase), so raw coverage is NOT
    # guaranteed — this scene is constructed to miss one phase entirely
    raw = float((np.asarray(strided.raw_depth[0, 2:-2, 2:-2]) > 0).mean())
    assert raw > 0.7, raw
    # ...but the 3x3 median pass closes 1-px holes: filled coverage is full
    # and the conditioning stays close to the full splat
    filled = float((np.asarray(strided.depth[0, 2:-2, 2:-2]) > 0).mean())
    assert filled > 0.999, filled
    a = np.asarray(full.features[0, 2:-2, 2:-2])
    b = np.asarray(strided.features[0, 2:-2, 2:-2])
    mse = float(np.mean((a - b) ** 2))
    psnr = 10 * np.log10(4.0 / mse)  # range [-1, 1] -> peak-to-peak 2
    assert psnr > 28.0, psnr


def test_splat_stride_single_valid_source_fills():
    """The first frames of an unroll have ONE valid source: its 1/4-density
    phase grid must still produce a fully-covered conditioning (z-buffer-
    consistent dilation closes the holes the median cannot)."""
    rng = np.random.default_rng(5)
    h = w = 32
    n = 5
    k = make_intrinsics(20.0, 20.0, (w - 1) / 2, (h - 1) / 2)
    depth = np.broadcast_to(
        rng.uniform(8.0, 12.0, size=(1, 1, h, w)).astype(np.float32), (1, n, h, w)
    )
    feats = np.broadcast_to(
        rng.uniform(-1, 1, size=(1, 1, h, w, 3)).astype(np.float32), (1, n, h, w, 3)
    )
    masks = np.zeros((1, n), np.float32)
    masks[0, 0] = 1.0  # only the seed frame is real
    res = render_projection_from_srcs(
        jnp.asarray(feats), jnp.asarray(depth), k[None],
        jnp.broadcast_to(k, (1, n, 3, 3)),
        jnp.broadcast_to(jnp.eye(4), (1, n, 4, 4)),
        src_masks=jnp.asarray(masks),
        splat_stride=2,
    )
    raw_cov = float((np.asarray(res.raw_depth) > 0).mean())
    assert raw_cov == pytest.approx(0.25, abs=0.02), raw_cov
    # merged output: every pixel covered, none marked extrapolation
    assert float((np.asarray(res.depth) > 0).mean()) == 1.0
    assert not bool(res.extrapolation_mask.any())
    # depths stay on the surface (dilation copies real neighbor depths)
    d = np.asarray(res.depth)
    assert d.min() >= 7.9 and d.max() <= 12.1


def test_inverse_warp_multi_src_matches_per_source_sampling_oracle():
    """The winner-only gather in inverse_warp_multi_src must reproduce the
    naive formulation exactly: sample EVERY source (+2 shift, reference
    inference_pipeline.py:707,:733), occupancy = sum > 0, per-pixel argmin
    of |warped_src_depth - src_depth| picks the sampled value."""
    from sgam_neurips22_tpu.geometry.camera import inv3x3
    from sgam_neurips22_tpu.geometry.warp import inverse_warp_multi_src

    rng = np.random.default_rng(11)
    b, n, h, w = 2, 3, 24, 24
    k = np.asarray(make_intrinsics(20.0, 20.0, (w - 1) / 2, (h - 1) / 2))
    src_imgs = rng.uniform(-1, 1, (b, n, h, w, 3)).astype(np.float32)
    src_depths = rng.uniform(2.0, 6.0, (b, n, h, w)).astype(np.float32)
    tgt_depth = rng.uniform(2.0, 6.0, (b, h, w)).astype(np.float32)
    # a few invalid target depths (map holes)
    tgt_depth[0, :4, :4] = 0.0
    tgt2srcs = np.stack(
        [np.stack([rand_pose(rng) for _ in range(n)]) for _ in range(b)]
    ).astype(np.float32)
    ks = np.broadcast_to(k, (b, n, 3, 3)).astype(np.float32)

    got = np.asarray(
        inverse_warp_multi_src(
            jnp.asarray(src_imgs), jnp.asarray(src_depths),
            jnp.asarray(tgt_depth), jnp.asarray(ks), jnp.asarray(k)[None],
            jnp.asarray(tgt2srcs),
        )
    )

    # ---- naive oracle: per-source nearest sampling, then z-buffer merge
    cam_pts = pixel2cam(jnp.asarray(tgt_depth), inv3x3(jnp.asarray(k)[None]))
    cam_pts_r = jnp.repeat(cam_pts, n, axis=0).reshape(b, n, h, w, 3)
    proj = jnp.einsum(
        "bnij,bnjk->bnik", jnp.asarray(ks), jnp.asarray(tgt2srcs)[..., :3, :]
    )
    coords, wsd = cam2pixel(
        cam_pts_r.reshape(b * n, h, w, 3),
        proj[..., :3].reshape(b * n, 3, 3),
        proj[..., 3].reshape(b * n, 3),
        clamp_z=None,
    )
    sampled = np.asarray(
        grid_sample_nearest(
            jnp.asarray(src_imgs).reshape(b * n, h, w, 3) + 2.0, coords
        )
    ).reshape(b, n, h, w, 3)
    wsd = np.asarray(wsd).reshape(b, n, h, w)
    occupied = sampled.sum(axis=-1) > 0.0
    valid = occupied & (wsd >= 0.0)
    key = np.where(valid, np.abs(wsd - src_depths), np.inf)
    winner = key.argmin(axis=1)
    any_valid = valid.any(axis=1)
    picked = np.take_along_axis(
        sampled, winner[:, None, ..., None], axis=1
    )[:, 0]
    want = np.where(any_valid[..., None], picked - 2.0, 0.0)

    np.testing.assert_array_equal(got, want)


def test_plane_z_depth_closed_form():
    """Fronto-parallel plane at distance d from an identity camera reads d
    at the principal point and d everywhere (z-depth is constant on a
    z=const plane); a camera translated along the plane must read the SAME
    world surface (coherence is the point of the op)."""
    from sgam_neurips22_tpu.geometry.camera import plane_z_depth

    k = jnp.asarray([[50.0, 0, 15.5], [0, 50.0, 15.5], [0, 0, 1.0]])
    w2c = jnp.eye(4)
    n = jnp.asarray([0.0, 0.0, 1.0])
    d = plane_z_depth(k, w2c, n, jnp.asarray(5.0), (32, 32), 0.1, 100.0)
    np.testing.assert_allclose(np.asarray(d), 5.0, rtol=1e-6)
    # translate the camera 2 units along +x: still z-depth 5 everywhere,
    # and unprojected world points must land on the plane z=5
    w2c2 = jnp.eye(4).at[0, 3].set(-2.0)  # world->cam: cam at x=+2
    d2 = plane_z_depth(k, w2c2, n, jnp.asarray(5.0), (32, 32), 0.1, 100.0)
    np.testing.assert_allclose(np.asarray(d2), 5.0, rtol=1e-6)
    # tilted plane: unproject and verify n.x == plane_d
    n3 = jnp.asarray([0.3, 0.1, 1.0])
    n3 = n3 / jnp.linalg.norm(n3)
    d3 = plane_z_depth(k, w2c2, n3, jnp.asarray(4.0), (32, 32), 0.01, 1000.0)
    pts_cam = pixel2cam(d3[None], jnp.linalg.inv(k)[None])[0]  # [H, W, 3]
    r_c2w = w2c2[:3, :3].T
    pts_w = jnp.einsum("ij,hwj->hwi", r_c2w, pts_cam) + (-r_c2w @ w2c2[:3, 3])
    np.testing.assert_allclose(
        np.asarray(jnp.einsum("i,hwi->hw", n3, pts_w)), 4.0, rtol=1e-4
    )

"""TSDF mapping tests: scatter-band fusion, splat/raycast re-render,
auto-sized volumes (scalability), fusion telemetry, PLY export."""
import pytest
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
    auto_config,
    colorize_points,
    create_volume,
    extract_points,
    fusion_fraction,
    integrate,
    render_depth,
)

H = W = 48
K = make_intrinsics(40.0, 40.0, (W - 1) / 2, (H - 1) / 2)
CFG = TSDFConfig(
    dims=(64, 64, 64), voxel_size=0.1, sdf_trunc=0.4, origin=(-3.2, -3.2, 0.0),
    pool_capacity=1 << 15,
)


def flat_wall_frame(depth_val=3.0):
    depth = np.full((H, W), depth_val, np.float32)
    rgb = np.full((H, W, 3), 0.5, np.float32)
    return jnp.asarray(depth), jnp.asarray(rgb)


def test_integrate_then_rerender_recovers_plane():
    """Fuse a flat wall at z=3 from the identity camera, re-render from the
    same pose with BOTH methods: depth must come back ~3 centrally."""
    vol = create_volume(CFG)
    depth, rgb = flat_wall_frame(3.0)
    ext = jnp.eye(4)
    vol = integrate(vol, CFG, depth, rgb, K, ext)
    assert float(vol.weight.max()) > 0
    assert int(vol.pool_count) > 0
    for method in ("splat", "raycast"):
        rendered = np.asarray(
            render_depth(vol, CFG, K, ext, (H, W), near=1.0, far=5.0,
                         n_samples=128, method=method)
        )
        center = rendered[16:32, 16:32]
        assert (center > 0).all(), f"{method}: central rays must hit the wall"
        np.testing.assert_allclose(center, 3.0, atol=0.08, err_msg=method)


@pytest.mark.slow
def test_pool_splat_frustum_culling_is_lossless():
    """Static-cell frustum culling must never change the rendered depth:
    compare cull=True against cull=False on the SAME volume (a culled cell
    can only contain points that project outside the image or outside
    [near, far], which the per-point validity mask discards anyway). A
    camera turned 180 deg sees an empty map either way. Multi-cell config:
    the wall spans several slabs."""
    from dataclasses import replace

    from sgam_neurips22_tpu.mapping.tsdf import _render_depth_splat

    cfg = replace(CFG, pool_cells=4, render_chunk=1 << 10)
    vol = create_volume(cfg)
    depth, rgb = flat_wall_frame(3.0)
    vol = integrate(vol, cfg, depth, rgb, K, jnp.eye(4))
    d1 = np.asarray(
        _render_depth_splat(vol, cfg, K, jnp.eye(4), (H, W), 1.0, 5.0)
    )
    d2 = np.asarray(
        _render_depth_splat(
            vol, cfg, K, jnp.eye(4), (H, W), 1.0, 5.0, cull=False
        )
    )
    np.testing.assert_array_equal(d1, d2)
    assert (d1[16:32, 16:32] > 0).all()

    flip = np.diag([1.0, -1.0, -1.0, 1.0])  # look down -z: wall is behind
    d3 = np.asarray(
        _render_depth_splat(vol, cfg, K, jnp.asarray(flip), (H, W), 1.0, 5.0)
    )
    assert (d3 == 0).all()


def test_rerender_from_shifted_pose():
    """Render the fused wall from a camera moved 0.5m back: depth ~3.5."""
    vol = create_volume(CFG)
    depth, rgb = flat_wall_frame(3.0)
    vol = integrate(vol, CFG, depth, rgb, K, jnp.eye(4))
    ext = jnp.eye(4).at[2, 3].set(0.5)  # t=+0.5 => camera center (0,0,-0.5)
    rendered = np.asarray(
        render_depth(vol, CFG, K, ext, (H, W), near=1.0, far=5.0, n_samples=160)
    )
    center = rendered[20:28, 20:28]
    assert (center > 0).all()
    np.testing.assert_allclose(center, 3.5, atol=0.08)


def test_unobserved_rays_return_zero():
    vol = create_volume(CFG)
    for method in ("splat", "raycast"):
        rendered = np.asarray(
            render_depth(vol, CFG, K, jnp.eye(4), (H, W), near=1.0, far=5.0,
                         n_samples=32, method=method)
        )
        assert (rendered == 0).all(), method


def test_multi_frame_fusion_accumulates():
    vol = create_volume(CFG)
    d1, rgb = flat_wall_frame(3.0)
    vol1 = integrate(vol, CFG, d1, rgb, K, jnp.eye(4))
    vol2 = integrate(vol1, CFG, d1, rgb, K, jnp.eye(4))
    # identical frame twice: sums double => the zero crossing (the fused
    # surface) is unchanged, observedness is unchanged
    np.testing.assert_allclose(
        np.asarray(vol2.grid), 2 * np.asarray(vol1.grid), rtol=1e-6
    )
    np.testing.assert_array_equal(
        np.asarray(vol2.weight), np.asarray(vol1.weight)
    )
    # pool does not duplicate voxels across frames
    assert int(vol2.pool_count) == int(vol1.pool_count)


def test_extract_points_near_surface():
    vol = create_volume(CFG)
    depth, rgb = flat_wall_frame(3.0)
    vol = integrate(vol, CFG, depth, rgb, K, jnp.eye(4))
    pts, _ = extract_points(vol, CFG, max_abs_tsdf=0.25)
    assert len(pts) > 0
    assert np.abs(pts[:, 2] - 3.0).mean() < 0.15
    # colorize by reprojection into the source frame ([-1,1] rgb of 0.5 -> 0.75)
    cols = colorize_points(
        pts, np.asarray(rgb)[None], np.asarray(depth)[None],
        np.asarray(K), np.eye(4)[None], tol=4 * CFG.voxel_size,
    )
    assert (np.abs(cols - 0.75) < 1e-5).mean() > 0.95


def test_fusion_telemetry_counts_out_of_volume():
    """Half the frame's depth lands outside the volume: the stats must say
    so (the silent-truncation fix; reference Open3D drops these silently)."""
    small = TSDFConfig(
        dims=(32, 32, 32), voxel_size=0.1, sdf_trunc=0.3,
        origin=(-1.6, -1.6, 2.0), pool_capacity=1 << 14,
    )  # volume z in [2.0, 5.2]
    vol = create_volume(small)
    depth = np.full((H, W), 3.0, np.float32)
    depth[: H // 2] = 10.0  # beyond the volume
    vol = integrate(vol, small, jnp.asarray(depth), jnp.zeros((H, W, 3)), K, jnp.eye(4))
    frac, n_valid, *_ = fusion_fraction(vol)
    assert n_valid == H * W
    assert 0.2 < frac < 0.8


def test_pool_overflow_is_counted_not_silent():
    """In-frame overflow (one frame books more than the whole capacity) is
    dropped+counted in BOTH full-pool policies (a same-frame ring wrap would
    double-book slots inside one scatter)."""
    for recycle in (False, True):
        tiny_pool = TSDFConfig(
            dims=(64, 64, 64), voxel_size=0.1, sdf_trunc=0.4,
            origin=(-3.2, -3.2, 0.0), pool_capacity=8, pool_recycle=recycle,
        )
        vol = create_volume(tiny_pool)
        depth, rgb = flat_wall_frame(3.0)
        vol = integrate(vol, tiny_pool, depth, rgb, K, jnp.eye(4))
        _, _, dropped, recycled = fusion_fraction(vol)
        assert int(vol.pool_count) == 8
        assert dropped > 0
        assert recycled == 0


def _two_wall_pools(recycle: bool):
    """Fill the pool exactly with a far wall, then fuse a nearer wall whose
    (disjoint) surface voxels need slots."""
    probe = TSDFConfig(
        dims=(64, 64, 64), voxel_size=0.1, sdf_trunc=0.4,
        origin=(-3.2, -3.2, 0.0), pool_capacity=1 << 15,
    )
    far_d, far_rgb = flat_wall_frame(3.0)
    cap = int(integrate(create_volume(probe), probe, far_d, far_rgb, K,
                        jnp.eye(4)).pool_count)
    cfg = TSDFConfig(
        dims=(64, 64, 64), voxel_size=0.1, sdf_trunc=0.4,
        origin=(-3.2, -3.2, 0.0), pool_capacity=cap, pool_recycle=recycle,
    )
    vol = create_volume(cfg)
    vol = integrate(vol, cfg, far_d, far_rgb, K, jnp.eye(4))
    near_d, near_rgb = flat_wall_frame(2.0)
    vol = integrate(vol, cfg, near_d, near_rgb, K, jnp.eye(4))
    return vol, cfg, cap


def test_pool_recycle_evicts_oldest_keeps_newest():
    """Ring-buffer recycling (default): the second frame's surface voxels
    displace the oldest slots; flags stay exactly the live-slot indicator;
    the newest wall renders."""
    vol, cfg, cap = _two_wall_pools(recycle=True)
    _, _, dropped, recycled = fusion_fraction(vol)
    assert recycled > 0
    assert dropped == 0
    assert int(vol.pool_count) > cap  # lifetime count keeps ring position
    live = np.unique(np.asarray(vol.pool_ids))
    assert live.size == cap  # all slots occupied by DISTINCT voxels
    # the registry tracks exactly the live set (identity-mapped volume:
    # bucket v holds v+1 iff voxel v is in the pool)
    inpool = np.asarray(vol.inpool)
    registered = np.flatnonzero(inpool)
    np.testing.assert_array_equal(inpool[registered] - 1, registered)
    np.testing.assert_array_equal(np.sort(live), registered)
    rendered = np.asarray(
        render_depth(vol, cfg, K, jnp.eye(4), (H, W), near=1.0, far=5.0)
    )
    center = rendered[16:32, 16:32]
    assert (center > 0).all()
    # the near wall's voxel centers project ~2 px apart at z=2, so pixels
    # between them legitimately z-buffer the (still-mapped) far wall — the
    # recycling claim is that the NEWEST surface is in the map and wins
    # wherever it covers, not that point-splat coverage is dense
    near_frac = np.mean(np.abs(center - 2.0) < 0.08)
    assert near_frac > 0.5, f"near wall covers only {near_frac:.0%}"
    assert center.min() > 1.9  # nothing in front of the newest wall


def test_pool_recycle_off_keeps_drop_semantics():
    """pool_recycle=False reverts to round-2 drop-new: the full pool never
    evicts, the second frame's voxels are dropped and counted."""
    vol, cfg, cap = _two_wall_pools(recycle=False)
    _, _, dropped, recycled = fusion_fraction(vol)
    assert recycled == 0
    assert dropped > 0
    assert int(vol.pool_count) == cap


def _default_scene_fused_fraction(dataset: str, output_dim) -> float:
    """Build the dataset's default trajectory + auto volume, then check that
    synthetic depth across the full codec range lands inside the volume."""
    from sgam_neurips22_tpu.geometry.codec import get_codec
    from sgam_neurips22_tpu.pipeline.trajectory import prepare_grid

    grid = prepare_grid(dataset, output_dim)
    codec = get_codec(dataset)
    from sgam_neurips22_tpu.pipeline.scene_generation import DEFAULT_TSDF

    base = DEFAULT_TSDF[dataset]
    cfg = auto_config(
        np.stack([grid.c2w(i) for i in range(grid.size)]),
        grid.K, (256, 256), codec.depth_range,
        voxel_size=base["voxel_size"], sdf_trunc=base["sdf_trunc"],
        verbose=False,
    )
    # sample depth across the codec range at every 7th pose, random pixels
    rng = np.random.default_rng(0)
    lo, hi = codec.depth_range
    kinv = np.linalg.inv(np.asarray(grid.K, np.float64))
    n_in = n_total = 0
    for idx in range(0, grid.size, 7):
        uv = np.concatenate(
            [rng.uniform(0, 256, (512, 2)), np.ones((512, 1))], axis=1
        )
        d = rng.uniform(lo, hi, (512, 1))
        cam = (uv @ kinv.T) * d
        c2w = grid.c2w(idx)
        world = cam @ c2w[:3, :3].T + c2w[:3, 3]
        g = (world - np.asarray(cfg.origin)) / cfg.voxel_size
        inb = ((g >= 0) & (g < np.asarray(cfg.dims))).all(axis=1)
        n_in += int(inb.sum())
        n_total += len(inb)
    return n_in / n_total


def test_auto_volume_contains_clevr_default_scene():
    """CLEVR 20x20 grid defaults must fuse >=99% of valid depth samples
    (VERDICT round-1 gap: the fixed 256x256x128 volume could not contain
    the 20x20 grid + 7-16m viewing depth)."""
    assert _default_scene_fused_fraction("clevr-infinite", (20, 20)) >= 0.99


def test_auto_volume_contains_google_earth_default_scene():
    """GoogleEarth 100x1 trajectory defaults must fuse >=99%."""
    assert _default_scene_fused_fraction("google_earth", (100, 1)) >= 0.99


def test_auto_config_memory_cap_coarsens_voxel():
    grid_c2ws = np.eye(4)[None]
    cfg = auto_config(
        grid_c2ws, np.asarray(K), (H, W), (1.0, 50.0),
        voxel_size=0.001, sdf_trunc=0.01, mem_cap_bytes=1e8, verbose=False,
    )
    assert cfg.voxel_size > 0.001
    assert int(np.prod(cfg.dims)) * 9 <= 1.1e8


def test_end_to_end_fused_fraction_small_scene():
    """Integrate in-range synthetic frames over a small trajectory into an
    auto-sized volume: >=99% of valid samples must fuse (on-device stats)."""
    from sgam_neurips22_tpu.pipeline.trajectory import prepare_grid

    grid = prepare_grid("clevr-infinite", (2, 2))
    cfg = auto_config(
        np.stack([grid.c2w(i) for i in range(grid.size)]),
        np.asarray(K), (H, W), (7.0, 16.0),
        voxel_size=0.15, sdf_trunc=0.6, verbose=False, pool_capacity=1 << 16,
    )
    vol = create_volume(cfg)
    rng = np.random.default_rng(1)
    for idx in range(grid.size):
        depth = rng.uniform(7.0, 16.0, (H, W)).astype(np.float32)
        vol = integrate(
            vol, cfg, jnp.asarray(depth), jnp.zeros((H, W, 3)),
            jnp.asarray(K), jnp.asarray(grid.w2c(idx), jnp.float32),
        )
    frac, n_valid, *_ = fusion_fraction(vol)
    assert n_valid == grid.size * H * W
    assert frac >= 0.99


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


def test_splat_render_close_to_raycast():
    vol = create_volume(CFG)
    depth, rgb = flat_wall_frame(3.0)
    vol = integrate(vol, CFG, depth, rgb, K, jnp.eye(4))
    ray = np.asarray(
        render_depth(vol, CFG, K, jnp.eye(4), (H, W), 1.0, 5.0, 128,
                     method="raycast", interp="trilinear")
    )
    spl = np.asarray(
        render_depth(vol, CFG, K, jnp.eye(4), (H, W), 1.0, 5.0, method="splat")
    )
    hit = (ray > 0) & (spl > 0)
    assert hit.mean() > 0.2
    assert np.abs(ray[hit] - spl[hit]).max() < CFG.voxel_size * 2


def test_pool_capacity_beyond_packed_key_limit_chunks():
    """pool_capacity > 2^20 splats in chunks (capability cliff removed);
    verify the chunk-id reconstruction by forcing winners into chunk 1."""
    import jax

    from sgam_neurips22_tpu.mapping.tsdf import (
        MAX_POOL_CAPACITY,
        _render_depth_splat,
    )

    big = TSDFConfig(
        dims=(64, 64, 64), voxel_size=0.1, sdf_trunc=0.4,
        origin=(-3.2, -3.2, 0.0), pool_capacity=MAX_POOL_CAPACITY + 4096,
        pool_cells=1,  # one cell: its slot range spans multiple sub-chunks
    )
    vol = create_volume(big)
    d, rgb = flat_wall_frame(3.0)
    vol = integrate(vol, big, d, rgb, K, jnp.eye(4))
    n = int(vol.pool_count)
    # move the pool entries beyond the packed-key index width (still inside
    # cell 0, whose static bounds cover the whole volume)
    ids = np.asarray(vol.pool_ids)
    shifted = np.zeros_like(ids)
    shifted[MAX_POOL_CAPACITY : MAX_POOL_CAPACITY + n] = ids[:n]
    vol2 = vol.replace(
        pool_ids=jnp.asarray(shifted),
        cell_counts=jnp.asarray([MAX_POOL_CAPACITY + n], jnp.int32),
    )
    r = np.asarray(
        _render_depth_splat(vol2, big, K, jnp.eye(4), (H, W), 1.0, 5.0)
    )
    center = r[16:32, 16:32]
    assert (center > 0).all()
    np.testing.assert_allclose(center, 3.0, atol=0.08)


@pytest.mark.slow
def test_multi_cell_render_matches_single_cell():
    """Cell partitioning is a pure performance knob: the rendered depth
    from a 4-cell / fine-sub-chunk pool equals the 1-cell / big-chunk pool
    (identity pose: any packed-key tie candidates share a voxel z-layer, so
    the decoded depth is layout-invariant)."""
    from dataclasses import replace

    d, rgb = flat_wall_frame(3.0)
    d2, _ = flat_wall_frame(2.4)
    outs = []
    for cells, chunk in ((1, 1 << 18), (4, 1 << 10), (7, 300)):
        cfg = replace(CFG, pool_cells=cells, render_chunk=chunk)
        vol = create_volume(cfg)
        for dd in (d, d2):
            vol = integrate(vol, cfg, dd, rgb, K, jnp.eye(4))
        outs.append(np.asarray(
            render_depth(vol, cfg, K, jnp.eye(4), (H, W), near=1.0, far=5.0)
        ))
    np.testing.assert_array_equal(outs[0], outs[1])
    np.testing.assert_array_equal(outs[0], outs[2])


def test_persistent_claim_dedup_exact_across_frames():
    """The generation-keyed claim grid must dedup pool inserts exactly in
    every frame, with stale claims from earlier frames never blocking or
    corrupting later winners: fuse walls at different depths (disjoint voxel
    sets) and check pool_count equals the brute-force unique-voxel count."""
    vol = create_volume(CFG)
    seen = set()
    for i, depth_val in enumerate((3.0, 3.0, 2.4, 3.6)):
        depth, rgb = flat_wall_frame(depth_val)
        vol = integrate(vol, CFG, depth, rgb, K, jnp.eye(4))
        assert int(vol.frame) == i + 1
        # brute-force: voxel of the band-front sample per pixel
        pix = np.stack(np.meshgrid(np.arange(W), np.arange(H)), -1).reshape(-1, 2)
        rays = np.concatenate([pix + 0.0, np.ones((H * W, 1))], 1) @ np.linalg.inv(
            np.asarray(K)
        ).T
        z = depth_val - 0.5 * CFG.voxel_size
        pts = rays * z
        g = np.floor((pts - np.asarray(CFG.origin)) / CFG.voxel_size).astype(int)
        inb = ((g >= 0) & (g < np.asarray(CFG.dims))).all(1)
        lin = (g[:, 0] * CFG.dims[1] + g[:, 1]) * CFG.dims[2] + g[:, 2]
        seen.update(lin[inb].tolist())
        assert int(vol.pool_count) == len(seen), f"frame {i}"
    # every pool entry is unique
    ids = np.asarray(vol.pool_ids)[: int(vol.pool_count)]
    assert len(np.unique(ids)) == len(ids)


def test_integrate_stride_renders_like_full_res():
    """stride-2 fusion must reproduce the stride-1 rendered depth when the
    voxel footprint covers the skipped rays (flat wall: footprint >> 1 px)."""
    from dataclasses import replace

    depth, rgb = flat_wall_frame(3.0)
    ext = jnp.eye(4)
    rendered = {}
    for s in (1, 2):
        cfg = replace(CFG, integrate_stride=s)
        vol = integrate(create_volume(cfg), cfg, depth, rgb, K, ext)
        rendered[s] = np.asarray(
            render_depth(vol, cfg, K, ext, (H, W), near=1.0, far=5.0)
        )
    c1, c2 = rendered[1][8:40, 8:40], rendered[2][8:40, 8:40]
    assert (c2 > 0).all(), "stride-2 map must still cover the wall"
    np.testing.assert_allclose(c2, c1, atol=0.05)


def test_chunk_skip_matches_unchunked_render():
    """With the pool entirely inside chunk 0, the lax.cond skip of the empty
    second chunk must produce exactly the single-chunk render."""
    from dataclasses import replace

    from sgam_neurips22_tpu.mapping.tsdf import (
        MAX_POOL_CAPACITY,
        _render_depth_splat,
    )

    d, rgb = flat_wall_frame(3.0)
    outs = {}
    for cap in (1 << 15, MAX_POOL_CAPACITY + 4096):
        cfg = replace(CFG, pool_capacity=cap)
        vol = integrate(create_volume(cfg), cfg, d, rgb, K, jnp.eye(4))
        assert int(vol.pool_count) < (1 << 15)
        outs[cap] = np.asarray(
            _render_depth_splat(vol, cfg, K, jnp.eye(4), (H, W), 1.0, 5.0)
        )
    np.testing.assert_array_equal(outs[1 << 15], outs[MAX_POOL_CAPACITY + 4096])


def test_ray_budget_validated_before_compile():
    """Over-budget resolution/stride combos fail at config time with
    actionable stride guidance, not at trace time inside the unroll."""
    from sgam_neurips22_tpu.mapping.tsdf import validate_ray_budget
    from sgam_neurips22_tpu.pipeline.scene_generation import (
        SceneGenConfig, _build_grid, _tsdf_config,
    )

    validate_ray_budget((512, 512), 1)  # exactly at the 2^18 limit
    validate_ray_budget((768, 768), 2)
    with pytest.raises(ValueError, match="tsdf_integrate_stride>=2"):
        validate_ray_budget((768, 768), 1)

    cfg = SceneGenConfig(
        dataset="clevr-infinite", output_dim=(2, 2),
        image_resolution=(768, 768), use_rgbd_integration=True,
    )
    grid = _build_grid(cfg)
    with pytest.raises(ValueError, match="tsdf_integrate_stride"):
        _tsdf_config(cfg, grid, (7.0, 16.0))


def test_band4_renders_like_band8():
    """Shrinking the fused band to 4 voxels (the production knob: the band
    scatter dominates integrate cost and scales linearly with band width)
    must not change the rendered surface — the splat refinement only needs
    the field one voxel around the crossing."""
    from dataclasses import replace

    depth, rgb = flat_wall_frame(3.0)
    ext = jnp.eye(4)
    rendered = {}
    for b in (None, 4):
        cfg = replace(CFG, band_voxels=b)
        vol = integrate(create_volume(cfg), cfg, depth, rgb, K, ext)
        rendered[b] = np.asarray(
            render_depth(vol, cfg, K, ext, (H, W), near=1.0, far=5.0)
        )
    c8, c4 = rendered[None][8:40, 8:40], rendered[4][8:40, 8:40]
    assert (c4 > 0).all(), "band-4 map must still cover the wall"
    np.testing.assert_allclose(c4, c8, atol=0.05)


def test_render_chunk_granularity_is_lossless():
    """`render_chunk` is a pure performance knob (pool-count + frustum cull
    granularity): the rendered depth must be bit-identical across chunk
    sizes, including chunks that do not divide the pool capacity."""
    depth, rgb = flat_wall_frame(3.0)
    ext = jnp.eye(4)
    outs = []
    for chunk in (1 << 10, 3000, 1 << 15):
        cfg = TSDFConfig(
            dims=(64, 64, 64), voxel_size=0.1, sdf_trunc=0.4,
            origin=(-3.2, -3.2, 0.0), pool_capacity=1 << 15,
            render_chunk=chunk,
        )
        vol = create_volume(cfg)
        for d in (3.0, 2.4):
            f, c = flat_wall_frame(d)
            vol = integrate(vol, cfg, f, c, K, ext)
        outs.append(np.asarray(
            render_depth(vol, cfg, K, ext, (H, W), near=1.0, far=5.0)
        ))
    np.testing.assert_array_equal(outs[0], outs[1])
    np.testing.assert_array_equal(outs[0], outs[2])


def test_pipeline_render_chunk_knob_plumbs_through():
    from sgam_neurips22_tpu.pipeline.scene_generation import (
        SceneGenConfig,
        _tsdf_config,
        _build_grid,
    )

    cfg = SceneGenConfig(
        dataset="clevr-infinite", output_dim=(3, 3),
        use_rgbd_integration=True, tsdf_render_chunk=1 << 14,
    )
    grid = _build_grid(cfg)
    tc = _tsdf_config(cfg, grid, (7.0, 16.0))
    assert tc.render_chunk == 1 << 14
    # the effective sub-chunk is capped by the per-cell capacity
    assert 0 < tc.chunk <= 1 << 14
    assert tc.chunk == min(tc.cell_cap, 1 << 14)


def test_axis_order_is_output_invariant():
    """`axis_order` is a pure memory-layout knob (scatter/gather locality):
    rendered depth and the extracted point cloud must be identical for any
    permutation."""
    from dataclasses import replace

    base = TSDFConfig(
        dims=(48, 64, 52), voxel_size=0.1, sdf_trunc=0.4,
        origin=(-3.2, -3.2, 0.0), pool_capacity=6000, render_chunk=700,
        pool_cells=6,
    )
    outs = []
    for order in ((0, 1, 2), (2, 1, 0), (1, 2, 0)):
        cfg = replace(base, axis_order=order)
        vol = create_volume(cfg)
        for d in (3.0, 2.5, 3.5):
            depth, rgb = flat_wall_frame(d)
            vol = integrate(vol, cfg, depth, rgb, K, jnp.eye(4))
        r = np.asarray(
            render_depth(vol, cfg, K, jnp.eye(4), (H, W), near=1.0, far=5.0)
        )
        pts, _ = extract_points(vol, cfg)
        pts = np.ascontiguousarray(pts)
        outs.append((r, pts[np.lexsort(pts.T)]))
    np.testing.assert_array_equal(outs[0][0], outs[1][0])
    np.testing.assert_array_equal(outs[0][0], outs[2][0])
    np.testing.assert_allclose(outs[0][1], outs[1][1])
    np.testing.assert_allclose(outs[0][1], outs[2][1])


def test_cells_contain_their_pool_entries():
    """Frustum-culling correctness rests on this invariant: every LIVE pool
    entry of cell k is a voxel whose split-axis coordinate lies inside cell
    k's static slab — through per-cell ring wraps, recycling, and sub-chunk
    boundaries that do not divide the cell capacity. Frames are flat walls
    at stepped depths (disjoint voxel slabs) so wraps churn every cell."""
    cfg = TSDFConfig(
        dims=(64, 64, 64), voxel_size=0.1, sdf_trunc=0.4,
        origin=(-3.2, -3.2, 0.0), pool_capacity=1 << 12, render_chunk=300,
        pool_cells=5,
    )
    assert cfg.cell_cap % cfg.chunk != 0, "exercise a partial sub-chunk"
    vol = create_volume(cfg)
    for i in range(8):
        depth, rgb = flat_wall_frame(3.4 + 0.35 * i)
        vol = integrate(vol, cfg, depth, rgb, K, jnp.eye(4))
    counts = np.asarray(vol.cell_counts)
    assert (counts > cfg.cell_cap).any(), "test must wrap at least one cell"
    ids = np.asarray(vol.pool_ids)
    bounds = cfg.cell_bounds()
    x, y, z = cfg.dims
    checked = 0
    for ci in range(cfg.n_cells):
        live = min(int(counts[ci]), cfg.cell_cap)
        sl = ids[ci * cfg.cell_cap : ci * cfg.cell_cap + live]
        ax = sl // (y * z)  # split axis of (64,64,64) is axis 0
        lo, hi = bounds[ci]
        assert (ax >= lo).all() and (ax < hi).all(), f"cell {ci}"
        checked += live
    assert checked > cfg.pool_capacity // 2, "most slots must be live"


def test_batched_volume_matches_per_scene_bit_exact():
    """A 2-scene batched volume (create_volume(cfg, n_scenes=2)) must fuse
    and render EXACTLY like two independent single volumes: batching is
    pure index arithmetic (scene offsets folded into the same scatters),
    so grids/flags/pools/renders are bit-identical per scene block."""
    from dataclasses import replace

    cfg = replace(CFG, pool_cells=4, render_chunk=1 << 10)
    n_vox = int(np.prod(cfg.dims))

    # two different scenes: a flat wall and a tilted wall
    d0, rgb0 = flat_wall_frame(3.0)
    ramp = 2.5 + 1.0 * np.linspace(0, 1, W, dtype=np.float32)[None, :]
    d1 = jnp.asarray(np.broadcast_to(ramp, (H, W)).copy())
    ext0 = jnp.eye(4)
    ext1 = jnp.eye(4).at[0, 3].set(0.2)  # slightly shifted camera

    singles = []
    for d, e in ((d0, ext0), (d1, ext1)):
        v = create_volume(cfg)
        v = integrate(v, cfg, d, rgb0, K, e)
        v = integrate(v, cfg, d, rgb0, K, e)  # second frame: dedup paths
        singles.append(v)

    batched = create_volume(cfg, n_scenes=2)
    depth2 = jnp.stack([d0, d1])
    rgb2 = jnp.stack([rgb0, rgb0])
    ext2 = jnp.stack([ext0, ext1])
    batched = integrate(batched, cfg, depth2, rgb2, K, ext2)
    batched = integrate(batched, cfg, depth2, rgb2, K, ext2)

    for s, v in enumerate(singles):
        np.testing.assert_array_equal(
            np.asarray(batched.grid[s * n_vox : (s + 1) * n_vox]),
            np.asarray(v.grid),
        )
        np.testing.assert_array_equal(
            np.asarray(
                batched.inpool[s * cfg.claim_size : (s + 1) * cfg.claim_size]
            ),
            np.asarray(v.inpool),
        )
        np.testing.assert_array_equal(
            np.asarray(
                batched.cell_counts[s * cfg.n_cells : (s + 1) * cfg.n_cells]
            ),
            np.asarray(v.cell_counts),
        )
        # pool ids carry the scene offset in the batched state
        np.testing.assert_array_equal(
            np.asarray(batched.pool_ids[s * cfg.capacity : (s + 1) * cfg.capacity])
            - np.where(
                np.asarray(v.pool_ids) != 0, s * n_vox, 0
            ),  # unbooked slots stay 0 in both
            np.asarray(v.pool_ids),
        )

    # batched render == per-scene single renders, bit for bit
    rb = np.asarray(
        render_depth(batched, cfg, K, ext2, (H, W), near=1.0, far=5.0)
    )
    for s, (v, e) in enumerate(zip(singles, (ext0, ext1))):
        rs = np.asarray(render_depth(v, cfg, K, e, (H, W), near=1.0, far=5.0))
        np.testing.assert_array_equal(rb[s], rs)


def test_batched_integrate_rejects_scene_mismatch():
    vol = create_volume(CFG, n_scenes=2)
    d, rgb = flat_wall_frame(3.0)
    with pytest.raises(ValueError, match="holds 2 scene"):
        integrate(vol, CFG, jnp.stack([d] * 3), jnp.stack([rgb] * 3), K,
                  jnp.stack([jnp.eye(4)] * 3))


def test_pool_splat_pallas_path_bit_exact(monkeypatch):
    """SGAM_TPU_TSDF_POOL_PALLAS=1 routes the pool splat through the binned
    Pallas z-buffer merge (interpret mode off-TPU); the rendered depth must
    be BIT-identical to the XLA per-chunk scatter-min path — multi-cell,
    multi-sub-chunk, multi-frame pool, shifted target pose (so ties and
    cross-cell merges are exercised), plus a batched volume."""
    from dataclasses import replace

    cfg = replace(CFG, pool_cells=3, render_chunk=1 << 10)
    d, rgb = flat_wall_frame(3.0)
    d2, _ = flat_wall_frame(2.4)
    vol = create_volume(cfg)
    shift = np.eye(4, dtype=np.float32)
    shift[0, 3] = 0.35  # second frame from a shifted pose: multi-frame pool
    for dd, ext in ((d, jnp.eye(4)), (d2, jnp.asarray(shift))):
        vol = integrate(vol, cfg, dd, rgb, K, ext)
    target = jnp.asarray(shift)

    bvol = create_volume(cfg, n_scenes=2)
    bvol = integrate(
        bvol, cfg,
        jnp.stack([d, d2]), jnp.stack([rgb, rgb]), K,
        jnp.stack([jnp.eye(4), jnp.asarray(shift)]),
    )
    bexts = jnp.stack([target, jnp.eye(4)])

    outs = {}
    for flag in ("0", "1"):
        monkeypatch.setenv("SGAM_TPU_TSDF_POOL_PALLAS", flag)
        outs[flag] = (
            np.asarray(render_depth(vol, cfg, K, target, (H, W), 1.0, 5.0)),
            np.asarray(render_depth(bvol, cfg, K, bexts, (H, W), 1.0, 5.0)),
        )
    assert (outs["0"][0] > 0).any()
    np.testing.assert_array_equal(outs["0"][0], outs["1"][0])
    np.testing.assert_array_equal(outs["0"][1], outs["1"][1])

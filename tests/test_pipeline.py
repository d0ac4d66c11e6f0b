"""Pipeline tests: trajectories, orders, selection, end-to-end mini unroll."""
import os

import jax
import numpy as np
import pytest

from sgam_neurips22_tpu.models import DDConfig, VQModelConfig, init_vqmodel
from sgam_neurips22_tpu.pipeline.ordering import (
    column_major_order,
    row_major_order,
    zig_zag_order,
)
from sgam_neurips22_tpu.pipeline.scene_generation import (
    InfiniteSceneGeneration,
    SceneGenConfig,
)
from sgam_neurips22_tpu.pipeline.selection import select_sources
from sgam_neurips22_tpu.pipeline.trajectory import (
    prepare_grid,
    prepare_ring,
    prepare_spiral,
)

TINY = VQModelConfig(
    ddconfig=DDConfig(
        ch=32, out_ch=4, ch_mult=(1, 2), num_res_blocks=1,
        attn_resolutions=(8,), resolution=16, z_channels=32, in_channels=4,
    ),
    n_embed=32,
    embed_dim=16,
    phase="conditional_generation",
    dataset="clevr-infinite",
    depth_range=(7.0, 16.0),
)
H = W = 32
TINY_K = np.array([[20.0, 0, (W - 1) / 2], [0, 20.0, (H - 1) / 2], [0, 0, 1]])


def test_zigzag_order_properties():
    order = zig_zag_order(3, 3)
    assert len(order) == 9
    assert order[0] == (0, 0)
    assert sorted(order) == [(i, j) for i in range(3) for j in range(3)]
    # consecutive cells sit on adjacent anti-diagonals (or the same one)
    sums = [i + j for i, j in order]
    assert all(abs(sums[k + 1] - sums[k]) <= 1 for k in range(8))


def test_row_and_column_major_cover_grid():
    assert sorted(row_major_order(3, 4)) == sorted(
        (i, j) for i in range(3) for j in range(4)
    )
    assert sorted(column_major_order(4, 3)) == sorted(
        (i, j) for i in range(4) for j in range(3)
    )


def test_prepare_grid_poses_consistent():
    grid = prepare_grid("clevr-infinite", (3, 3))
    assert grid.size == 9
    # rotations orthonormal
    rtr = np.einsum("gij,gkj->gik", grid.R, grid.R)
    np.testing.assert_allclose(rtr, np.tile(np.eye(3), (9, 1, 1)), atol=1e-6)
    # grid spacing matches step unit / denom
    d = np.linalg.norm(grid.position[1] - grid.position[0])
    np.testing.assert_allclose(d, 0.81632614 / 2, rtol=1e-5)
    # positions = -R^T t
    np.testing.assert_allclose(
        grid.position, np.einsum("gji,gj->gi", grid.R, -grid.t), atol=1e-6
    )


def test_spiral_and_ring_build():
    sp = prepare_spiral("clevr-infinite", 10)
    rg = prepare_ring("clevr-infinite", 10)
    for g in (sp, rg):
        assert g.size == 10
        rtr = np.einsum("gij,gkj->gik", g.R, g.R)
        np.testing.assert_allclose(rtr, np.tile(np.eye(3), (10, 1, 1)), atol=1e-5)
    # ring poses actually move
    assert np.linalg.norm(rg.position[1] - rg.position[0]) > 1e-4


def test_select_sources_radius_and_count():
    grid = prepare_grid("clevr-infinite", (3, 3))
    order = zig_zag_order(3, 3)
    grid.visited[grid.index(*order[0])] = True
    grid.visited[grid.index(*order[1])] = True
    srcs = select_sources(grid, order, curr=2, tgt_coord=order[2], num_src=5,
                          dataset="clevr-infinite")
    assert 1 <= len(srcs) <= 2
    # all within radius 1.0
    tgt = grid.position[grid.index(*order[2])]
    for c in srcs:
        assert np.linalg.norm(grid.position[grid.index(*c)] - tgt) <= 1.0


@pytest.fixture(scope="module")
def tiny_params():
    return init_vqmodel(jax.random.PRNGKey(0), TINY)


def make_seed():
    rng = np.random.default_rng(5)
    rgb = rng.uniform(-1, 1, (H, W, 3)).astype(np.float32)
    depth = rng.uniform(8, 14, (H, W)).astype(np.float32)
    return rgb, depth


def test_scene_expansion_splat_3x3(tiny_params, tmp_path):
    cfg = SceneGenConfig(
        dataset="clevr-infinite", output_dim=(3, 3), num_src=3, topk=1,
        image_resolution=(H, W),
    )
    rgb, depth = make_seed()
    gen = InfiniteSceneGeneration(
        tiny_params, TINY, cfg, seeds=[((0, 0), rgb, depth)],
        output_dir=str(tmp_path), intrinsics=TINY_K,
    )
    rgb_buf, depth_buf = gen.scene_expansion(jax.random.PRNGKey(0))
    assert gen.grid.visited.all()
    assert np.isfinite(np.asarray(rgb_buf)).all()
    assert float(np.abs(np.asarray(rgb_buf)).sum()) > 0
    # exports in the reference layout
    files = os.listdir(tmp_path)
    assert any(f.startswith("im_") and f.endswith(".png") for f in files)
    assert any(f.startswith("dm_") for f in files)
    assert "merged_pcds.ply" in files
    # seed frame preserved exactly
    np.testing.assert_allclose(np.asarray(rgb_buf[0]), rgb, atol=1e-6)


def test_scene_expansion_rgbd_integration_2x2(tiny_params):
    cfg = SceneGenConfig(
        dataset="clevr-infinite", output_dim=(2, 2), num_src=2, topk=1,
        image_resolution=(H, W), use_rgbd_integration=True,
        # auto-sized volume, memory-capped (CPU test): the voxel coarsens
        # rather than silently cropping the scene (round-1 VERDICT gap)
        tsdf_mem_cap_gb=0.1, tsdf_pool_capacity=1 << 16, raycast_samples=48,
    )
    rgb, depth = make_seed()
    gen = InfiniteSceneGeneration(
        tiny_params, TINY, cfg, seeds=[((0, 0), rgb, depth)], intrinsics=TINY_K
    )
    rgb_buf, depth_buf = gen.scene_expansion(jax.random.PRNGKey(0))
    assert gen.grid.visited.all()
    assert np.isfinite(np.asarray(rgb_buf)).all()
    # the seed frame must have been fused into the map — and (new in r2)
    # the auto-sized volume must contain essentially all of it
    assert float(gen.volume.weight.max()) > 0
    frac, n_valid, dropped, _recycled = gen.fusion_stats()
    assert n_valid > 0
    assert frac >= 0.99
    assert dropped == 0


def test_coherent_plane_depth_converges_pool(tiny_params):
    """coherent_plane_depth mode (bench --coherent): generated depth is the
    analytic world-plane depth, so (a) the depth buffer matches
    plane_depth_at for every generated frame, and (b) TSDF dedup fires —
    the surface pool's growth in the unroll's second half is a small
    fraction of the first half's (random-weight depth noise instead grows
    the pool linearly forever; VERDICT r3 #6)."""
    cfg = SceneGenConfig(
        dataset="clevr-infinite", output_dim=(4, 4), num_src=2, topk=1,
        image_resolution=(H, W), use_rgbd_integration=True,
        tsdf_mem_cap_gb=0.1, tsdf_pool_capacity=1 << 16, raycast_samples=48,
        coherent_plane_depth=True,
        # voxel ~= the ray footprint on the plane (depth/f = 11.5/20): the
        # production regime, where neighboring rays and overlapping frames
        # land in the SAME voxels so dedup can fire. The default 0.05 voxel
        # under this tiny 32x32/f=20 camera makes rays 10x sparser than
        # voxels — every frame's rays then book fresh slots no matter how
        # consistent the depth is, which is sampling sparsity, not noise.
        tsdf_voxel_size=0.6,
    )
    rgb, _ = make_seed()
    gen = InfiniteSceneGeneration(
        tiny_params, TINY, cfg,
        seeds=[((0, 0), rgb, np.full((H, W), 9.0, np.float32))],
        intrinsics=TINY_K,
    )
    seed_depth = gen.plane_depth_at(gen.grid.index(0, 0))
    gen.reset([((0, 0), rgb, seed_depth)])
    counts = []
    rng = jax.random.PRNGKey(0)
    while gen.curr < len(gen.order):
        gen.one_step_prediction(gen.order[gen.curr], jax.random.fold_in(rng, gen.curr))
        gen.curr += 1
        counts.append(int(gen.volume.pool_count))
    # (a) every generated frame's depth is the analytic plane depth
    for idx in range(gen.grid.size):
        np.testing.assert_allclose(
            np.asarray(gen.depth_buf[idx]), gen.plane_depth_at(idx),
            rtol=1e-5, atol=1e-4,
        )
    # (b) pool growth collapses once the plane is mapped
    half = len(counts) // 2
    first_half_growth = counts[half - 1] - 0
    second_half_growth = counts[-1] - counts[half - 1]
    assert first_half_growth > 0
    assert second_half_growth < 0.5 * first_half_growth, counts


def test_batched_scene_expansion(tiny_params):
    cfg = SceneGenConfig(
        dataset="clevr-infinite", output_dim=(2, 2), num_src=2, topk=1,
        image_resolution=(H, W),
    )
    rng = np.random.default_rng(7)
    seeds_batch = []
    for _ in range(3):
        rgb = rng.uniform(-1, 1, (H, W, 3)).astype(np.float32)
        depth = rng.uniform(8, 14, (H, W)).astype(np.float32)
        seeds_batch.append([((0, 0), rgb, depth)])
    gen = InfiniteSceneGeneration(
        tiny_params, TINY, cfg, seeds=seeds_batch[0], intrinsics=TINY_K
    )
    rgb_bufs, depth_bufs = gen.scene_expansion_batched(seeds_batch, jax.random.PRNGKey(0))
    assert rgb_bufs.shape == (3, 4, H, W, 3)
    assert np.isfinite(np.asarray(rgb_bufs)).all()
    # scene 0 seed preserved; scenes differ (different seeds)
    np.testing.assert_allclose(np.asarray(rgb_bufs[0, 0]), seeds_batch[0][0][1], atol=1e-6)
    assert not np.allclose(np.asarray(rgb_bufs[0, 1]), np.asarray(rgb_bufs[1, 1]))


def test_batched_scene_expansion_map_requery(tiny_params):
    """Batched scenes with TSDF map re-query conditioning (the round-4
    NotImplementedError at scene_generation.py:719, lifted): S volumes in
    one batched TSDFVolume, one fused unroll, per-scene outputs distinct
    and the per-scene map actually fused."""
    cfg = SceneGenConfig(
        dataset="clevr-infinite", output_dim=(2, 2), num_src=2, topk=1,
        image_resolution=(H, W), use_rgbd_integration=True,
        tsdf_mem_cap_gb=0.1, tsdf_pool_capacity=1 << 16, raycast_samples=48,
    )
    rng = np.random.default_rng(13)
    seeds_batch = []
    for _ in range(2):
        rgb = rng.uniform(-1, 1, (H, W, 3)).astype(np.float32)
        depth = rng.uniform(8, 14, (H, W)).astype(np.float32)
        seeds_batch.append([((0, 0), rgb, depth)])
    gen = InfiniteSceneGeneration(
        tiny_params, TINY, cfg, seeds=seeds_batch[0], intrinsics=TINY_K
    )
    rgb_bufs, depth_bufs = gen.scene_expansion_batched(
        seeds_batch, jax.random.PRNGKey(0)
    )
    assert rgb_bufs.shape == (2, 4, H, W, 3)
    assert np.isfinite(np.asarray(rgb_bufs)).all()
    np.testing.assert_allclose(
        np.asarray(rgb_bufs[0, 0]), seeds_batch[0][0][1], atol=1e-6
    )
    assert not np.allclose(np.asarray(rgb_bufs[0, 1]), np.asarray(rgb_bufs[1, 1]))
    # both per-scene maps fused frames (batched volume kept for telemetry)
    from sgam_neurips22_tpu.mapping.tsdf import volume_scenes

    vol = gen._batched_volume
    assert volume_scenes(vol, gen.tsdf_cfg) == 2
    counts = np.asarray(vol.cell_counts).reshape(2, -1).sum(axis=1)
    assert (counts > 0).all()


@pytest.mark.slow
def test_batched_map_requery_sharded_over_mesh(tiny_params):
    """Mesh-sharded batched serving now covers the map-requery mode too:
    8 scenes' TSDF volumes sharded over the 8-device data mesh, outputs
    matching the unsharded batched run."""
    from sgam_neurips22_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(8)
    cfg = SceneGenConfig(
        dataset="clevr-infinite", output_dim=(2, 2), num_src=2, topk=1,
        image_resolution=(H, W), use_rgbd_integration=True,
        tsdf_mem_cap_gb=0.1, tsdf_pool_capacity=1 << 16, raycast_samples=48,
    )
    rng = np.random.default_rng(17)
    seeds_batch = []
    for _ in range(8):
        rgb = rng.uniform(-1, 1, (H, W, 3)).astype(np.float32)
        depth = rng.uniform(8, 14, (H, W)).astype(np.float32)
        seeds_batch.append([((0, 0), rgb, depth)])
    gen = InfiniteSceneGeneration(
        tiny_params, TINY, cfg, seeds=seeds_batch[0], intrinsics=TINY_K
    )
    rgb_sh, _ = gen.scene_expansion_batched(
        seeds_batch, jax.random.PRNGKey(0), mesh=mesh
    )
    assert rgb_sh.shape == (8, 4, H, W, 3)
    assert np.isfinite(np.asarray(rgb_sh)).all()
    gen2 = InfiniteSceneGeneration(
        tiny_params, TINY, cfg, seeds=seeds_batch[0], intrinsics=TINY_K
    )
    r2, _ = gen2.scene_expansion_batched(seeds_batch, jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(rgb_sh), np.asarray(r2), atol=1e-6)


def test_topk_sampling_pipeline(tiny_params):
    cfg = SceneGenConfig(
        dataset="clevr-infinite", output_dim=(2, 2), num_src=2, topk=4,
        image_resolution=(H, W),
    )
    rgb, depth = make_seed()
    gen = InfiniteSceneGeneration(
        tiny_params, TINY, cfg, seeds=[((0, 0), rgb, depth)], intrinsics=TINY_K
    )
    rgb_buf, _ = gen.scene_expansion(jax.random.PRNGKey(1))
    assert np.isfinite(np.asarray(rgb_buf)).all()


def test_per_step_streaming_export(tiny_params, tmp_path):
    cfg = SceneGenConfig(
        dataset="clevr-infinite", output_dim=(2, 2), num_src=2, topk=1,
        image_resolution=(H, W),
    )
    rgb, depth = make_seed()
    gen = InfiniteSceneGeneration(
        tiny_params, TINY, cfg, seeds=[((0, 0), rgb, depth)],
        output_dir=str(tmp_path), intrinsics=TINY_K,
    )
    gen.scene_expansion(jax.random.PRNGKey(2), fused=False)
    files = os.listdir(tmp_path)
    # streamed per-step frames (reference save_to_disk layout) + final exports
    assert any(f.startswith("im_00001_") for f in files)
    assert any(f.startswith("R_00001_") for f in files)
    assert "merged_pcds.ply" in files


def test_scene_expansion_is_deterministic(tiny_params):
    """Same seed + same rng => bit-identical scenes (the reference pins RNG
    seeds and disables cudnn for reproducible unrolls,
    main_scene_generation.py:10-11,47-49; our packed scatter-min makes the
    z-buffer deterministic by construction, SURVEY.md section 5.2)."""
    cfg = SceneGenConfig(
        dataset="clevr-infinite", output_dim=(2, 2), num_src=2, topk=4,
        image_resolution=(H, W),
    )
    rgb, depth = make_seed()
    gen = InfiniteSceneGeneration(
        tiny_params, TINY, cfg, seeds=[((0, 0), rgb, depth)], intrinsics=TINY_K
    )
    a_rgb, a_depth = gen.scene_expansion(jax.random.PRNGKey(7))
    a_rgb, a_depth = np.asarray(a_rgb), np.asarray(a_depth)
    gen.reset()
    b_rgb, b_depth = gen.scene_expansion(jax.random.PRNGKey(7))
    np.testing.assert_array_equal(a_rgb, np.asarray(b_rgb))
    np.testing.assert_array_equal(a_depth, np.asarray(b_depth))
    gen.reset()
    c_rgb, _ = gen.scene_expansion(jax.random.PRNGKey(8))
    assert not np.array_equal(a_rgb, np.asarray(c_rgb))


def test_scene_expansion_matches_frozen_golden(tiny_params):
    """Scene-LEVEL numeric pin: the 3x3 splat unroll at fixed seeds must
    reproduce tests/goldens/unroll_3x3.npz bit-for-bit on the CPU backend.
    Module goldens (test_goldens.py) catch per-op drift; this catches drift
    anywhere in the autoregressive composition (splat -> encode -> quantize
    -> decode -> buffer write), the surface perf work keeps touching.
    Regenerate deliberately via tools/freeze_unroll_golden.py when a
    numerics change is intended."""
    golden_path = os.path.join(
        os.path.dirname(__file__), "goldens", "unroll_3x3.npz"
    )
    if not os.path.exists(golden_path):
        pytest.skip("unroll golden not generated")
    g = np.load(golden_path)
    cfg = SceneGenConfig(
        dataset="clevr-infinite", output_dim=(3, 3), num_src=3, topk=1,
        image_resolution=(H, W),
    )
    rgb, depth = make_seed()
    gen = InfiniteSceneGeneration(
        tiny_params, TINY, cfg, seeds=[((0, 0), rgb, depth)], intrinsics=TINY_K
    )
    rgb_buf, depth_buf = gen.scene_expansion(jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(rgb_buf), g["rgb"], atol=1e-5)
    np.testing.assert_allclose(np.asarray(depth_buf), g["depth"], atol=1e-4)


def test_batched_scene_expansion_sharded_over_mesh(tiny_params):
    """Multi-chip serving: 8 scenes sharded over the 8-device data mesh,
    params replicated — each device unrolls its own scenes."""
    from sgam_neurips22_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(8)
    cfg = SceneGenConfig(
        dataset="clevr-infinite", output_dim=(2, 2), num_src=2, topk=1,
        image_resolution=(H, W),
    )
    rng = np.random.default_rng(9)
    seeds_batch = []
    for _ in range(8):
        rgb = rng.uniform(-1, 1, (H, W, 3)).astype(np.float32)
        depth = rng.uniform(8, 14, (H, W)).astype(np.float32)
        seeds_batch.append([((0, 0), rgb, depth)])
    gen = InfiniteSceneGeneration(
        tiny_params, TINY, cfg, seeds=seeds_batch[0], intrinsics=TINY_K
    )
    rgb_bufs, depth_bufs = gen.scene_expansion_batched(
        seeds_batch, jax.random.PRNGKey(0), mesh=mesh
    )
    assert rgb_bufs.shape == (8, 4, H, W, 3)
    assert np.isfinite(np.asarray(rgb_bufs)).all()
    # output keeps the scene axis sharded over the mesh
    assert not rgb_bufs.sharding.is_fully_replicated
    # matches the unsharded result scene-for-scene
    gen2 = InfiniteSceneGeneration(
        tiny_params, TINY, cfg, seeds=seeds_batch[0], intrinsics=TINY_K
    )
    r2, d2 = gen2.scene_expansion_batched(seeds_batch, jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(rgb_bufs), np.asarray(r2), atol=1e-6)


def test_intrinsics_scale_with_resolution():
    """Non-256 frame resolutions must rescale K (focal + principal point);
    the grid builder picks this up from SceneGenConfig.image_resolution."""
    from sgam_neurips22_tpu.pipeline.scene_generation import SceneGenConfig, _build_grid
    from sgam_neurips22_tpu.pipeline.trajectory import default_intrinsics

    k256 = default_intrinsics("clevr-infinite", (256, 256))
    k64 = default_intrinsics("clevr-infinite", (64, 64))
    np.testing.assert_allclose(k64[:2], k256[:2] / 4)
    assert k64[0, 2] == 32.0  # principal point inside a 64x64 frame
    grid = _build_grid(
        SceneGenConfig(dataset="clevr-infinite", output_dim=(2, 2),
                       image_resolution=(64, 64))
    )
    np.testing.assert_allclose(grid.K, k64)


def test_packed_splat_point_budget_validated_at_config_time():
    """512^2 x 5 sources overflows the packed z-buffer's 19-bit point index;
    the config must fail with guidance instead of deep inside the jitted
    unroll (mirrors the TSDF ray-budget check)."""
    with pytest.raises(ValueError, match="2\\^19 point capacity"):
        SceneGenConfig(
            dataset="clevr-infinite", output_dim=(2, 2),
            image_resolution=(512, 512),
        )
    # unpacked scatter and strided splat both fit
    SceneGenConfig(
        dataset="clevr-infinite", output_dim=(2, 2),
        image_resolution=(512, 512), collision="nearest_exact",
    )
    SceneGenConfig(
        dataset="clevr-infinite", output_dim=(2, 2),
        image_resolution=(512, 512), splat_stride=2,
    )


def test_point_budget_exempts_map_requery():
    # map-requery conditioning inverse-warps (no splat); 512^2 with the
    # required tsdf stride must configure fine
    SceneGenConfig(
        dataset="clevr-infinite", output_dim=(2, 2),
        image_resolution=(512, 512), use_rgbd_integration=True,
    )


def test_batch1_inference_normalizes_training_flash_recipe(tiny_params):
    """The shipped training YAMLs set ddconfig.flash_attention=true (a
    measured bs-16 win); at batch 1 flash is measured SLOWER, so both
    batch-1 inference entry points must strip it — the batched decode path
    re-enables it via _flash_model_cfg (NOTES.md round 4)."""
    from dataclasses import replace

    flash_cfg = replace(TINY, ddconfig=replace(TINY.ddconfig, flash_attention=True))
    cfg = SceneGenConfig(
        dataset="clevr-infinite", output_dim=(2, 2), num_src=2, topk=1,
        image_resolution=(H, W),
    )
    rgb, depth = make_seed()
    gen = InfiniteSceneGeneration(
        tiny_params, flash_cfg, cfg, seeds=[((0, 0), rgb, depth)],
        intrinsics=TINY_K,
    )
    assert gen.model_cfg.ddconfig.flash_attention is None
    assert gen._flash_model_cfg().ddconfig.flash_attention is True

    from sgam_neurips22_tpu.serving import build_inference_step

    fn, (params, batch, rng) = build_inference_step(
        flash_cfg, num_src=2, image_size=H
    )
    out_rgb, out_depth = fn(params, batch, rng)
    assert np.isfinite(np.asarray(out_rgb)).all()

"""Native mesh extraction tests (builds the C++ lib with make)."""
import numpy as np
import pytest

from sgam_neurips22_tpu.mapping.mesh import (
    extract_mesh,
    native_available,
    write_mesh_ply,
)
from sgam_neurips22_tpu.mapping.tsdf import TSDFConfig, TSDFVolume

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native lib unavailable (no g++/make)"
)


def sphere_volume(n=48, radius=1.0):
    cfg = TSDFConfig(dims=(n, n, n), voxel_size=4.0 / n, sdf_trunc=0.5,
                     origin=(-2.0, -2.0, -2.0))
    xs = (np.arange(n) + 0.5) * cfg.voxel_size + cfg.origin[0]
    gx, gy, gz = np.meshgrid(xs, xs, xs, indexing="ij")
    dist = np.sqrt(gx**2 + gy**2 + gz**2) - radius
    tsdf = np.clip(dist / cfg.sdf_trunc, -1, 1).astype(np.float32)
    # the grid stores signed sums; a single observation == the tsdf itself.
    # nudge exact zeros (weight == grid != 0 means observed) off zero.
    tsdf = np.where(tsdf == 0.0, 1e-6, tsdf)
    vol = TSDFVolume(
        grid=tsdf.reshape(-1),
        inpool=np.zeros(cfg.claim_size, np.int32),
        pool_ids=np.zeros(cfg.capacity, np.int32),
        cell_counts=np.zeros(cfg.n_cells, np.int32),
        stats=np.zeros(4, np.float32),
        frame=np.zeros((), np.int32),
        claim=np.zeros(n * n * n, np.int32),
    )
    return vol, cfg


def test_sphere_mesh_geometry():
    vol, cfg = sphere_volume()
    verts, cols = extract_mesh(vol, cfg)
    assert len(verts) > 1000
    # every vertex lies close to the unit sphere
    r = np.linalg.norm(verts.reshape(-1, 3), axis=1)
    assert abs(float(r.mean()) - 1.0) < 0.05
    assert float(np.abs(r - 1.0).max()) < 0.15
    # interpolated colors preserved
    assert np.allclose(cols, 0.5, atol=1e-5)


def test_mesh_ply_write(tmp_path):
    vol, cfg = sphere_volume(n=24)
    verts, cols = extract_mesh(vol, cfg)
    path = str(tmp_path / "mesh.ply")
    write_mesh_ply(path, verts, cols)
    data = open(path, "rb").read()
    assert data.startswith(b"ply")
    assert f"element face {len(verts)}".encode() in data


def test_unobserved_cells_skipped():
    vol, cfg = sphere_volume(n=24)
    vol = vol.replace(grid=np.zeros_like(np.asarray(vol.grid)))
    verts, _ = extract_mesh(vol, cfg)
    assert len(verts) == 0

"""Point-cloud utilities: per-view unprojection + PLY export.

Replaces the reference's Open3D point-cloud surface
(`unproject_to_color_point_cloud` inference_pipeline.py:1038-1062,
`prepare_pcd` :1014-1036, merged .ply writes at :441-447) with
numpy/JAX unprojection and a dependency-free binary PLY writer.
"""
from __future__ import annotations

from typing import Iterable, Tuple

import numpy as np

from sgam_neurips22_tpu.geometry.camera import pixel2cam

import jax.numpy as jnp


def unproject_to_color_point_cloud(
    rgb: np.ndarray,
    depth: np.ndarray,
    intrinsics: np.ndarray,
    c2w: np.ndarray,
    stride: int = 1,
) -> Tuple[np.ndarray, np.ndarray]:
    """One RGB-D frame -> world-frame colored points.

    Args:
      rgb: [H, W, 3] in [-1, 1] or [0, 1]; depth [H, W] z-depth;
      intrinsics [3, 3]; c2w [4, 4] camera->world.
    Returns:
      (points [P, 3], colors [P, 3] in [0, 1]).
    """
    h, w = depth.shape
    pts_cam = np.asarray(
        pixel2cam(jnp.asarray(depth)[None], jnp.linalg.inv(jnp.asarray(intrinsics))[None])
    )[0]
    pts_cam = pts_cam[::stride, ::stride].reshape(-1, 3)
    cols = rgb[::stride, ::stride].reshape(-1, 3)
    if cols.min() < 0:
        cols = (cols + 1.0) / 2.0
    d = depth[::stride, ::stride].reshape(-1)
    valid = d > 0
    pts_world = pts_cam @ c2w[:3, :3].T + c2w[:3, 3]
    return pts_world[valid].astype(np.float32), np.clip(cols[valid], 0, 1).astype(np.float32)


def write_ply(path: str, points: np.ndarray, colors: np.ndarray | None = None) -> None:
    """Binary little-endian PLY with optional uchar colors."""
    n = len(points)
    has_color = colors is not None
    with open(path, "wb") as f:
        header = ["ply", "format binary_little_endian 1.0", f"element vertex {n}"]
        header += [f"property float {ax}" for ax in "xyz"]
        if has_color:
            header += [f"property uchar {c}" for c in ("red", "green", "blue")]
        header += ["end_header", ""]
        f.write("\n".join(header).encode())
        if has_color:
            c8 = np.clip(colors * 255.0, 0, 255).astype(np.uint8)
            rec = np.zeros(
                n, dtype=[("xyz", "<f4", 3), ("rgb", "u1", 3)]
            )
            rec["xyz"] = points.astype("<f4")
            rec["rgb"] = c8
            f.write(rec.tobytes())
        else:
            f.write(points.astype("<f4").tobytes())


def read_ply(path: str) -> Tuple[np.ndarray, np.ndarray | None]:
    """Minimal reader for the files `write_ply` produces (tests/round-trip)."""
    with open(path, "rb") as f:
        data = f.read()
    end = data.index(b"end_header") + len(b"end_header") + 1
    header = data[:end].decode()
    n = int([l for l in header.splitlines() if l.startswith("element vertex")][0].split()[-1])
    has_color = "property uchar red" in header
    if has_color:
        rec = np.frombuffer(data[end:], dtype=[("xyz", "<f4", 3), ("rgb", "u1", 3)], count=n)
        return rec["xyz"].copy(), rec["rgb"].astype(np.float32) / 255.0
    pts = np.frombuffer(data[end:], dtype="<f4", count=n * 3).reshape(n, 3)
    return pts.copy(), None


def merge_point_clouds(
    clouds: Iterable[Tuple[np.ndarray, np.ndarray]],
) -> Tuple[np.ndarray, np.ndarray]:
    pts, cols = zip(*clouds)
    return np.concatenate(pts), np.concatenate(cols)

"""Triangle-mesh extraction from the TSDF volume (native C++ via ctypes).

Replaces the reference's Open3D `extract_triangle_mesh`
(inference_pipeline.py:786). The kernel (native/mesh_extract.cpp, marching
tetrahedra) runs host-side — mesh export is offline batch work, the
on-device loop never meshes. Auto-builds the shared library with `make` on
first use if g++ is available.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_ABI_VERSION = 4  # must match native sgam_native_abi_version()
_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libsgam_native.so"))
_lib: Optional[ctypes.CDLL] = None


def _load_lib(build: bool = True) -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    if build:
        # always invoke make (dependency-tracked, a fresh build is a no-op):
        # a stale .so from before an ABI change would otherwise be loaded
        # silently — e.g. the has_color parameter added to tsdf_extract_mesh
        # turns into out-of-bounds color reads on the old binary
        try:
            subprocess.run(
                ["make", "-C", os.path.abspath(_NATIVE_DIR)],
                check=True,
                capture_output=True,
            )
        except (OSError, subprocess.CalledProcessError):
            if not os.path.exists(_LIB_PATH):
                raise
    lib = ctypes.CDLL(_LIB_PATH)
    # ABI gate: a stale .so surviving the make fallback above must not be
    # called through a changed signature (e.g. the has_color parameter)
    try:
        got = lib.sgam_native_abi_version()
    except AttributeError:
        got = 1
    if got != _ABI_VERSION:
        raise RuntimeError(
            f"libsgam_native.so ABI {got} != expected {_ABI_VERSION}; "
            f"rebuild with: make -C {os.path.abspath(_NATIVE_DIR)}"
        )
    lib.tsdf_extract_mesh.restype = ctypes.c_int64
    lib.tsdf_extract_mesh.argtypes = [
        ctypes.POINTER(ctypes.c_float),  # tsdf
        ctypes.POINTER(ctypes.c_float),  # weight
        ctypes.POINTER(ctypes.c_float),  # color
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,  # dims
        ctypes.c_float, ctypes.c_float, ctypes.c_float,  # origin
        ctypes.c_float,  # voxel
        ctypes.c_float,  # iso
        ctypes.POINTER(ctypes.c_float),  # out verts
        ctypes.POINTER(ctypes.c_float),  # out cols
        ctypes.c_int64,  # max tris
        ctypes.c_int32,  # has_color
    ]
    _lib = lib
    return lib


def native_available() -> bool:
    try:
        _load_lib()
        return True
    except Exception:
        return False


def _fp(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def extract_mesh(
    volume, cfg, iso: float = 0.0, color_grid: Optional[np.ndarray] = None,
    max_triangles: int = 25_000_000,
) -> Tuple[np.ndarray, np.ndarray]:
    """TSDFVolume -> (vertices [T, 3, 3], colors [T, 3, 3]) triangle soup.

    Args:
      volume: mapping.tsdf.TSDFVolume; cfg: TSDFConfig.
      color_grid: optional [X, Y, Z, 3]; gray when absent (vertex colors can
        be reassigned afterwards via tsdf.colorize_points on the vertices —
        the in-loop volume carries no color by design; when absent, no
        volume-sized color buffer is materialized either).
      max_triangles: hard cap on the emitted soup (25M ~= 1.8 GB of output
        buffers). Degenerate geometry — e.g. random-weight depth noise —
        can turn nearly every observed voxel into crossings; a real scene
        surface stays far below the cap. Truncation is LOUD.
    """
    lib = _load_lib()
    tsdf = np.ascontiguousarray(np.asarray(volume.tsdf), np.float32)
    weight = np.ascontiguousarray(np.asarray(volume.weight), np.float32)
    # the flat arrays are laid out per cfg.axis_order; hand the extractor
    # the LAYOUT-order dims/origin and unpermute the vertex coords after
    order = tuple(getattr(cfg, "axis_order", (0, 1, 2)))
    has_color = color_grid is not None
    if has_color:
        color = np.ascontiguousarray(
            np.transpose(np.asarray(color_grid), tuple(order) + (3,)),
            np.float32,
        )
    else:
        color = np.zeros(1, np.float32)
    x, y, z = (cfg.dims[a] for a in order)
    ox, oy, oz = (cfg.origin[a] for a in order)
    empty = np.zeros(1, np.float32)
    n = lib.tsdf_extract_mesh(
        _fp(tsdf), _fp(weight), _fp(color), x, y, z,
        ox, oy, oz, cfg.voxel_size, iso, _fp(empty), _fp(empty), 0,
        int(has_color),
    )
    if n == 0:
        return np.zeros((0, 3, 3), np.float32), np.zeros((0, 3, 3), np.float32)
    if n > max_triangles:
        print(
            f"WARNING: mesh extraction found {n} triangles; writing the "
            f"first {max_triangles} (raise max_triangles to keep all)"
        )
        n = max_triangles
    verts = np.empty((n, 3, 3), np.float32)
    cols = np.empty((n, 3, 3), np.float32)
    n2 = lib.tsdf_extract_mesh(
        _fp(tsdf), _fp(weight), _fp(color), x, y, z,
        ox, oy, oz, cfg.voxel_size, iso, _fp(verts), _fp(cols), n,
        int(has_color),
    )
    assert n2 >= n
    if order != (0, 1, 2):
        verts = np.ascontiguousarray(verts[..., np.argsort(order)])
    return verts, cols


def write_mesh_ply(path: str, verts: np.ndarray, cols: np.ndarray) -> None:
    """Triangle soup -> binary PLY with vertex colors + face indices."""
    t = len(verts)
    v = verts.reshape(-1, 3)
    c = np.clip(cols.reshape(-1, 3) * 255.0, 0, 255).astype(np.uint8)
    faces = np.arange(3 * t, dtype="<i4").reshape(t, 3)
    header = [
        "ply", "format binary_little_endian 1.0",
        f"element vertex {3 * t}",
        "property float x", "property float y", "property float z",
        "property uchar red", "property uchar green", "property uchar blue",
        f"element face {t}",
        "property list uchar int vertex_indices",
        "end_header", "",
    ]
    vrec = np.zeros(3 * t, dtype=[("xyz", "<f4", 3), ("rgb", "u1", 3)])
    vrec["xyz"] = v
    vrec["rgb"] = c
    frec = np.zeros(t, dtype=[("n", "u1"), ("idx", "<i4", 3)])
    frec["n"] = 3
    frec["idx"] = faces
    with open(path, "wb") as f:
        f.write("\n".join(header).encode())
        f.write(vrec.tobytes())
        f.write(frec.tobytes())

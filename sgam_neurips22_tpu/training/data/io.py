"""Image/depth loading + preprocessing primitives (host-side numpy).

Rebuilds the reference's loader conventions so on-disk datasets are
interchangeable:
- RGB png -> [-1, 1] float via /127.5 - 1 after PIL LANCZOS resize
  (reference data/clevr-infinite.py:94-95, data/base.py:66-73).
- depth npy resized with torch F.interpolate's default nearest rule
  (reference data/google_earth.py:173; out[i] = in[floor(i*scale)]).
- CLEVR ray-depth -> z-depth conversion with the K-dependent scale
  (reference data/clevr-infinite.py:99-104).
"""
from __future__ import annotations

import numpy as np
from PIL import Image


def load_rgb_u8(path: str, resolution: tuple | None = None) -> np.ndarray:
    """Decoded uint8 pixels before scaling (single home for the decode +
    convert + LANCZOS pipeline: tools/pack_dataset.py stores exactly these
    bytes so packed shards stay bit-identical to the live PNG path)."""
    img = Image.open(path)
    if img.mode != "RGB":
        img = img.convert("RGB")
    if resolution is not None and img.size != (resolution[1], resolution[0]):
        img = img.resize((resolution[1], resolution[0]), resample=Image.LANCZOS)
    return np.asarray(img, np.uint8)


def load_rgb(path: str, resolution: tuple | None = None) -> np.ndarray:
    """[-1, 1] float32 RGB, LANCZOS-resized."""
    return (load_rgb_u8(path, resolution).astype(np.float32) / 127.5 - 1.0).astype(
        np.float32
    )


def resize_nearest(x: np.ndarray, h_out: int, w_out: int) -> np.ndarray:
    """torch F.interpolate(mode='nearest') semantics."""
    h_in, w_in = x.shape[:2]
    if (h_in, w_in) == (h_out, w_out):
        return x
    ys = np.floor(np.arange(h_out) * (h_in / h_out)).astype(np.int64)
    xs = np.floor(np.arange(w_out) * (w_in / w_out)).astype(np.int64)
    return x[ys][:, xs]


def load_depth(path: str, resolution: tuple | None = None) -> np.ndarray:
    d = np.load(path).astype(np.float32)
    d = np.squeeze(d)
    if resolution is not None:
        d = resize_nearest(d, resolution[0], resolution[1])
    return d


def ray_to_z_np(depth: np.ndarray, k: np.ndarray) -> np.ndarray:
    """Ray-depth -> z-depth, numpy twin of geometry.camera.ray_depth_to_z
    (reference data/clevr-infinite.py:99-104 meshgrid convention)."""
    h, w = depth.shape[:2]
    x = np.linspace(0, w - 1, w)
    y = np.linspace(0, h - 1, h)
    xs, ys = np.meshgrid(x, y)
    return depth * k[0][0] / np.sqrt(
        k[0][0] ** 2 + (k[0][2] - ys - 0.5) ** 2 + (k[1][2] - xs - 0.5) ** 2
    )


def encode_disparity_np(depth: np.ndarray, dataset: str) -> np.ndarray:
    """Scaled-inverse-depth in [-1,1] (reference data/base.py:85-88,:113-115)."""
    if dataset == "google_earth":
        inv = 1.0 / (depth + 10.0)
        unit = (inv - 1 / 14.765625) / (1 / 10.099975586 - 1 / 14.765625)
    elif dataset == "clevr-infinite":
        inv = 1.0 / depth
        unit = (inv - 1 / 16) / (1 / 7 - 1 / 16)
    else:
        raise NotImplementedError(dataset)
    return (2.0 * unit - 1.0).astype(np.float32)

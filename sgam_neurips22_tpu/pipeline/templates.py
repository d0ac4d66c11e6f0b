"""Seed-template loading in the reference's on-disk layout.

The reference copies template frames into its working grid and fixes up
CLEVR ray depth in place (inference_pipeline.py:44-79); here templates are
read directly:
- clevr-infinite: im_XXXXX_<i>_<j>.png + dm npy with RAY depth converted
  to z-depth (reference :71-79)
- google_earth: templates/google_earth/seed<k>/im_*.png + dm_*.npy placed
  at grid (0, 0) (reference :46-54)
"""
from __future__ import annotations

import glob
import os

import numpy as np


def load_seed_frames(template_dir: str, dataset: str, seed_index: int, resolution):
    """[(grid coord (i, j), rgb [H,W,3] in [-1,1], z-depth [H,W])]."""
    from sgam_neurips22_tpu.pipeline.trajectory import default_intrinsics
    from sgam_neurips22_tpu.training.data.io import (
        load_depth,
        load_rgb,
        ray_to_z_np,
    )

    def sibling(path: str, old: str, new: str, old_ext: str, new_ext: str) -> str:
        # rewrite ONLY the basename: a str.replace on the full path would
        # corrupt directory components containing 'dm'/'im'
        d, base = os.path.split(path)
        return os.path.join(d, base.replace(old, new, 1)[: -len(old_ext)] + new_ext)

    seeds = []
    k = default_intrinsics(dataset, resolution)
    if dataset == "clevr-infinite":
        for dm_path in sorted(glob.glob(os.path.join(template_dir, "dm_*.npy"))):
            name = os.path.basename(dm_path)[3:-4]
            parts = name.split("_")
            i, j = (int(parts[1]), int(parts[2])) if len(parts) >= 3 else (0, 0)
            depth = ray_to_z_np(load_depth(dm_path, resolution), k)
            rgb = load_rgb(sibling(dm_path, "dm", "im", ".npy", ".png"), resolution)
            seeds.append(((i, j), rgb, depth.astype(np.float32)))
    elif dataset == "google_earth":
        seed_dir = os.path.join(template_dir, f"seed{seed_index}")
        img_fn = sorted(glob.glob(os.path.join(seed_dir, "im*")))[0]
        rgb = load_rgb(img_fn, resolution)
        depth = load_depth(sibling(img_fn, "im", "dm", ".png", ".npy"), resolution)
        seeds.append(((0, 0), rgb, depth.astype(np.float32)))
    else:
        raise NotImplementedError(dataset)
    if not seeds:
        raise FileNotFoundError(f"no seed frames under {template_dir}")
    return seeds

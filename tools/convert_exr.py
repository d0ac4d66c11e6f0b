"""Convert Blender EXR renders to training files.

Rebuild of reference clevr_generation/convert_exr.py (:14-51): each EXR
becomes im_XXXXX.png (sRGB tonemapped color), dm_XXXXX.npy (depth) and
optionally in_XXXXX.npy (instance indices). Offline CPU tooling (SURVEY.md
section 2.9 keeps dataset conversion off-device).

Two readers:
- MULTILAYER EXRs (what tools/blender_clevr_generation.py and the
  reference's generator write: file_format=OPEN_EXR_MULTILAYER with
  use_pass_z) need the `OpenEXR` python package, exactly like the
  reference converter. Channels are discovered by suffix so both Blender
  view-layer namings ("View Layer.Depth.Z" in 2.9x, "ViewLayer.Depth.Z"
  in newer builds) work.
- single-layer EXRs fall back to OpenCV's codec (OPENCV_IO_ENABLE_OPENEXR);
  depth comes from the alpha channel of RGBA dumps or a sibling file whose
  name swaps Image->Depth. cv2 CANNOT address multilayer channels — those
  files raise with guidance instead of silently converting the combined
  pass as if it were depth.
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


def _read_multilayer(exr_path: str):
    """(rgb [H,W,3] linear, depth [H,W] or None, instance [H,W] or None)
    from a Blender multilayer EXR, via the OpenEXR package (reference
    convert_exr.py:24-39 reads 'Composite.Combined.*' + 'View Layer.Depth.Z';
    channel names here are discovered by suffix so view-layer renames and
    composite-less renders both work). Returns None if the package is
    unavailable."""
    try:
        import Imath
        import OpenEXR
    except ImportError:
        return None
    f = OpenEXR.InputFile(exr_path)
    header = f.header()
    dw = header["dataWindow"]
    w, h = dw.max.x - dw.min.x + 1, dw.max.y - dw.min.y + 1
    names = list(header["channels"].keys())
    fl = Imath.PixelType(Imath.PixelType.FLOAT)

    def read(name):
        arr = np.frombuffer(f.channel(name, fl), dtype=np.float32)
        return arr.reshape(h, w)

    def find(suffixes):
        for suf in suffixes:
            for n in names:
                if n == suf or n.endswith("." + suf):
                    return n
        return None

    rgb_names = [find([f"Combined.{c}", c]) for c in ("R", "G", "B")]
    if any(n is None for n in rgb_names):
        raise ValueError(f"{exr_path}: no RGB channels among {names}")
    rgb = np.stack([read(n) for n in rgb_names], axis=2)
    depth_name = find(["Depth.Z", "Z"])
    depth = read(depth_name) if depth_name else None
    inst_name = find(["IndexOB.X"])
    instance = read(inst_name) if inst_name else None
    return rgb, depth, instance


def convert_one(exr_path: str, out_dir: str, index: int) -> None:
    import cv2
    from PIL import Image

    ml = _read_multilayer(exr_path)
    instance = None
    if ml is not None:
        rgb, depth, instance = ml
    else:
        img = cv2.imread(
            exr_path,
            cv2.IMREAD_UNCHANGED | cv2.IMREAD_ANYDEPTH | cv2.IMREAD_ANYCOLOR,
        )
        if img is None:
            raise IOError(
                f"cannot read {exr_path}: cv2's codec handles single-layer "
                "EXRs only — for Blender multilayer renders (the generator's "
                "OPEN_EXR_MULTILAYER output) install the OpenEXR package "
                "(pip install OpenEXR), as the reference converter requires"
            )
        if img.ndim == 3 and img.shape[2] >= 4:
            # RGBA(+depth in alpha for single-layer dumps): BGR -> RGB
            rgb = img[..., [2, 1, 0]]
            depth = img[..., 3]
        elif img.ndim == 3 and img.shape[2] == 3:
            rgb = img[..., [2, 1, 0]]
            depth_path = exr_path.replace("Image", "Depth").replace("image", "depth")
            # the name swap is a no-op when the render isn't split into
            # Image/Depth files — never read the color file AS depth
            depth = (
                cv2.imread(depth_path, cv2.IMREAD_UNCHANGED | cv2.IMREAD_ANYDEPTH)
                if depth_path != exr_path and os.path.exists(depth_path)
                else None
            )
        else:
            raise ValueError(f"unexpected EXR layout {img.shape} in {exr_path}")

    srgb = np.clip(linear_to_srgb(rgb) * 255.0, 0, 255).astype(np.uint8)
    Image.fromarray(srgb).save(os.path.join(out_dir, f"im_{index:05d}.png"))
    if depth is not None:
        np.save(os.path.join(out_dir, f"dm_{index:05d}.npy"), depth.astype(np.float32))
    if instance is not None:
        np.save(os.path.join(out_dir, f"in_{index:05d}.npy"), instance.astype(np.float32))


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

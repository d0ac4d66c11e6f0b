"""Pack a codebook-phase RGB-D dataset into mmap-able SGPK shards.

Decode + LANCZOS resize + ray->z + disparity-encode happen ONCE here; the
training loader then assembles float32 batches straight from the shard in
C++ threads (native/packed_loader.cpp) — bit-identical to the per-example
PNG path (reference data/base.py:30-188) but without per-epoch decode work.

    python tools/pack_dataset.py --dataset_dir /data/clevr \
        --dataset clevr-infinite [--resolution 256 256] [--splits train val]

Writes {dataset_dir}/{split}_{H}x{W}.sgpk; DataModule(packed='auto') picks
them up for the codebook phase when present.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse

import numpy as np
from PIL import Image


def load_rgb_u8(path: str, resolution) -> np.ndarray:
    """The uint8 pixels io.load_rgb would scale (same decode + LANCZOS)."""
    img = Image.open(path)
    if img.mode != "RGB":
        img = img.convert("RGB")
    if resolution is not None and img.size != (resolution[1], resolution[0]):
        img = img.resize((resolution[1], resolution[0]), resample=Image.LANCZOS)
    return np.asarray(img, np.uint8)


def pack_split(ds, out_path: str, use_depth: bool) -> None:
    from sgam_neurips22_tpu.training.data.io import (
        encode_disparity_np,
        load_depth,
        ray_to_z_np,
    )
    from sgam_neurips22_tpu.training.data.packed import write_shard

    rgbs, disps = [], [] if use_depth else None
    for i in range(len(ds)):
        rgb_path = ds.paths[i]
        rgbs.append(load_rgb_u8(rgb_path, ds.image_resolution))
        if use_depth:
            depth = load_depth(ds._depth_path(rgb_path), ds.image_resolution)
            if ds.convert_depth and ds.K is not None:
                depth = ray_to_z_np(depth, ds.K)
            disps.append(encode_disparity_np(depth, ds.dataset))
        if (i + 1) % 500 == 0:
            print(f"  {i + 1}/{len(ds)}", flush=True)
    write_shard(out_path, rgbs, disps)
    mb = os.path.getsize(out_path) / 1e6
    print(f"wrote {out_path}: {len(ds)} records, {mb:.1f} MB")


def main() -> None:
    from sgam_neurips22_tpu.training.data.codebook_dataset import CodebookDataset
    from sgam_neurips22_tpu.training.data.packed import shard_path

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dataset_dir", required=True)
    p.add_argument("--dataset", required=True,
                   choices=["clevr-infinite", "google_earth"])
    p.add_argument("--resolution", type=int, nargs=2, default=[256, 256])
    p.add_argument("--splits", nargs="*", default=["train", "val"])
    p.add_argument("--no_depth", action="store_true")
    p.add_argument("--no_convert_depth", action="store_true",
                   help="skip the CLEVR ray->z conversion")
    args = p.parse_args()

    for split in args.splits:
        ds = CodebookDataset(
            split,
            args.dataset_dir,
            args.dataset,
            image_resolution=tuple(args.resolution),
            convert_depth=not args.no_convert_depth,
            use_depth=not args.no_depth,
        )
        out = shard_path(args.dataset_dir, split, args.resolution)
        print(f"packing {split}: {len(ds)} examples -> {out}")
        pack_split(ds, out, use_depth=not args.no_depth)


if __name__ == "__main__":
    main()

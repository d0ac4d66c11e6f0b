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


# bit-identity with the live PNG loader is BY CONSTRUCTION: the packer
# stores the exact uint8 stage io.load_rgb scales
from sgam_neurips22_tpu.training.data.io import load_rgb_u8  # noqa: E402


def pack_split(ds, out_path: str, use_depth: bool) -> None:
    """Streams records through ShardWriter: O(1) host memory regardless of
    dataset size (a 100k-image 256^2 RGB-D split is ~45 GB decoded)."""
    from sgam_neurips22_tpu.training.data.io import (
        encode_disparity_np,
        load_depth,
        ray_to_z_np,
    )
    from sgam_neurips22_tpu.training.data.packed import ShardWriter

    wr = ShardWriter(out_path, has_depth=use_depth)
    for i in range(len(ds)):
        rgb_path = ds.paths[i]
        disp = None
        if use_depth:
            depth = load_depth(ds._depth_path(rgb_path), ds.image_resolution)
            if ds.convert_depth and ds.K is not None:
                depth = ray_to_z_np(depth, ds.K)
            disp = encode_disparity_np(depth, ds.dataset)
        wr.add(load_rgb_u8(rgb_path, ds.image_resolution), disp)
        if (i + 1) % 500 == 0:
            print(f"  {i + 1}/{len(ds)}", flush=True)
    wr.close()
    mb = os.path.getsize(out_path) / 1e6
    print(f"wrote {out_path}: {len(ds)} records, {mb:.1f} MB")


def pack_pair_frames(ds, out_path: str) -> None:
    """Pack every pose-graph frame of a pair dataset into a raw-depth frame
    store + JSON index (keyed '<scene>/<im_XXXXX.png>'). RGB is stored
    post-LANCZOS; depth goes through the dataset's own _load_depth pipeline
    MINUS the source-only sentinel replacement (applied at gather time, so
    target depths keep the sentinel exactly like the per-PNG path)."""
    import json

    from sgam_neurips22_tpu.training.data.packed import PackedFrameStore, ShardWriter

    index = {}
    nodes = [
        g.nodes[k] for g in ds.graphs for k in sorted(g.nodes)
    ]
    wr = ShardWriter(out_path, has_depth=True, raw_depth=True)
    for i, node in enumerate(nodes):
        wr.add(
            load_rgb_u8(node["rgb_path"], ds.image_resolution),
            ds._load_depth(node["depth_path"], is_dst=True),
        )
        index[PackedFrameStore.key_for(node["rgb_path"])] = i
        if (i + 1) % 500 == 0:
            print(f"  {i + 1}/{len(nodes)}", flush=True)
    wr.close()
    with open(out_path + ".idx.json", "w") as f:
        json.dump(index, f)
    mb = os.path.getsize(out_path) / 1e6
    print(f"wrote {out_path}: {len(nodes)} frames, {mb:.1f} MB")


def main() -> None:
    from sgam_neurips22_tpu.training.data.codebook_dataset import CodebookDataset
    from sgam_neurips22_tpu.training.data.datamodule import PAIR_DATASETS
    from sgam_neurips22_tpu.training.data.packed import frame_store_path, shard_path

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dataset_dir", required=True)
    p.add_argument("--dataset", required=True,
                   choices=["clevr-infinite", "google_earth"])
    p.add_argument("--phase", default="codebook", choices=["codebook", "pair"],
                   help="codebook: final [-1,1]+disparity examples; "
                        "pair: per-frame RGB + metric-depth store for the "
                        "conditional-generation datasets")
    p.add_argument("--resolution", type=int, nargs=2, default=[256, 256])
    p.add_argument("--splits", nargs="*", default=["train", "val"])
    p.add_argument("--no_depth", action="store_true")
    p.add_argument("--no_convert_depth", action="store_true",
                   help="codebook: skip the CLEVR ray->z conversion")
    args = p.parse_args()

    for split in args.splits:
        if args.phase == "pair":
            ds = PAIR_DATASETS[args.dataset](
                split, args.dataset_dir, image_resolution=tuple(args.resolution)
            )
            out = frame_store_path(args.dataset_dir, split, args.resolution)
            print(f"packing {split} frames: {len(ds)} -> {out}")
            pack_pair_frames(ds, out)
        else:
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

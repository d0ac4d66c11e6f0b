"""Offline evaluation CLI: PSNR / SSIM / FID between two image directories.

The reference ships the metric implementations (modules/misc/metrics.py,
modules/misc/pytorch_fid/) but no driver script (SURVEY.md section 4); this
makes them callable:

  python evaluate.py generated_dir gt_dir [--masks mask_dir] [--fid]

Pairs images by sorted filename. Masks (optional, .npy bool arrays per
frame) produce the visibility-masked PSNR/SSIM variants.
"""
from __future__ import annotations

import argparse
import glob
import json
import os

import numpy as np


def load_pairs(gen_dir: str, gt_dir: str):
    from PIL import Image

    gen = sorted(glob.glob(os.path.join(gen_dir, "im_*.png"))) or sorted(
        glob.glob(os.path.join(gen_dir, "*.png"))
    )
    gt = sorted(glob.glob(os.path.join(gt_dir, "im_*.png"))) or sorted(
        glob.glob(os.path.join(gt_dir, "*.png"))
    )
    n = min(len(gen), len(gt))
    if n == 0:
        raise FileNotFoundError("no paired images found")
    for g, t in zip(gen[:n], gt[:n]):
        a = np.asarray(Image.open(g).convert("RGB"), np.float64)
        b = np.asarray(Image.open(t).convert("RGB"), np.float64)
        yield os.path.basename(g), a, b


def main() -> None:
    from sgam_neurips22_tpu.core.platform import apply_platform_env
    from sgam_neurips22_tpu.utils.metrics import psnr, ssim

    apply_platform_env()

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("generated")
    p.add_argument("gt")
    p.add_argument("--masks", default=None, help="dir of per-frame .npy visibility masks")
    p.add_argument("--fid", action="store_true")
    p.add_argument("--lpips_weights", default="weights/lpips.pkl")
    args = p.parse_args()

    psnrs, ssims, vis_psnrs, vis_ssims = [], [], [], []
    for name, a, b in load_pairs(args.generated, args.gt):
        mask = None
        if args.masks:
            mpath = os.path.join(args.masks, os.path.splitext(name)[0] + ".npy")
            if os.path.exists(mpath):
                m = np.load(mpath).astype(np.float64)
                mask = np.repeat(m[..., None], 3, axis=-1) if m.ndim == 2 else m
        if mask is not None:
            f, v = psnr(a, b, mask)
            psnrs.append(f)
            vis_psnrs.append(v)
            f, v = ssim(a, b, mask)
            ssims.append(f)
            vis_ssims.append(v)
        else:
            psnrs.append(psnr(a, b))
            ssims.append(ssim(a, b))

    out = {
        "psnr": float(np.mean(psnrs)),
        "ssim": float(np.mean(ssims)),
        "n_frames": len(psnrs),
    }
    if vis_psnrs:
        # nanmean: fully-extrapolated frames (empty masks) score NaN and
        # must not poison the aggregate
        out["psnr_visible"] = float(np.nanmean(vis_psnrs))
        out["ssim_visible"] = float(np.nanmean(vis_ssims))
        out["n_frames_visible"] = int(np.sum(~np.isnan(vis_psnrs)))

    if args.fid:
        import pickle

        from sgam_neurips22_tpu.utils.fid import get_fid_score
        from sgam_neurips22_tpu.training.lpips import init_lpips

        if os.path.exists(args.lpips_weights):
            with open(args.lpips_weights, "rb") as f:
                lp = pickle.load(f)
        else:
            import jax

            print("WARNING: FID with randomly initialized VGG features "
                  "(numbers not comparable across machines)")
            lp = init_lpips(jax.random.PRNGKey(0))
        out["fid_vgg"] = get_fid_score(args.generated, args.gt, lpips_params=lp)

    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()

"""Freeze golden activations from the REFERENCE'S OWN torch modules.

tests/test_reference_parity_direct.py pins our JAX stack against the
reference implementation, but it needs the reference checkout + torch at
runtime. This tool runs the same fixed-seed cases ONCE and freezes the
reference outputs (plus the torch state_dicts that produced them) into
tests/goldens/*.npz, so tests/test_goldens.py keeps the parity evidence
alive in any environment without /root/reference or torch.

Covered stages (the BASELINE.json parity surface):
  - Encoder forward            (reference modules/diffusionmodules/model.py:342)
  - Decoder forward            (reference modules/diffusionmodules/model.py:437)
  - VectorQuantizer2 forward   (reference modules/vqvae/quantize.py:213)
  - forward splat, serial order (reference point_rendering/warp.py:194)
  - pixel2cam/cam2pixel/inverse_warp (reference warp.py:28,43,155)
  - median_blur lower-median   (reference warp.py:306)

Usage (needs /root/reference + torch):
    python tools/freeze_goldens.py [--out tests/goldens]
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

REFERENCE = "/root/reference"

# the tiny architecture shared with tests/test_reference_parity_direct.py
DD = dict(
    double_z=False, z_channels=32, resolution=32, in_channels=4, out_ch=4,
    ch=32, ch_mult=[1, 2], num_res_blocks=1, attn_resolutions=[16], dropout=0.0,
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests", "goldens"))
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    sys.path.insert(0, REFERENCE)
    import torch

    from sgam.generative_sensing_module.modules.diffusionmodules.model import (
        Decoder,
        Encoder,
    )
    from sgam.generative_sensing_module.modules.vqvae.quantize import (
        VectorQuantizer2,
    )
    from sgam.point_rendering import warp as ref_warp
    from sgam.point_rendering.warp import (
        median_blur,
        render_projection_from_srcs_fast,
    )

    torch.manual_seed(0)
    enc = Encoder(**DD).eval()
    dec = Decoder(**DD).eval()
    vq = VectorQuantizer2(64, 32, beta=0.25).eval()

    # ---- model stages (same seeds as test_reference_parity_direct) ----
    sd = {}
    for prefix, mod in (("encoder", enc), ("decoder", dec), ("quantize", vq)):
        for k, v in mod.state_dict().items():
            sd[f"sd/{prefix}.{k}"] = v.numpy()

    x = np.random.default_rng(0).uniform(-1, 1, (2, 32, 32, 4)).astype(np.float32)
    z_dec = np.random.default_rng(1).normal(size=(2, 16, 16, 32)).astype(np.float32)
    z_vq = np.random.default_rng(2).normal(size=(1, 8, 8, 32)).astype(np.float32)
    with torch.no_grad():
        enc_out = enc(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
        dec_out = dec(torch.from_numpy(z_dec.transpose(0, 3, 1, 2))).numpy()
        zq_t, loss_t, (_, _, idx_t) = vq(torch.from_numpy(z_vq.transpose(0, 3, 1, 2)))
    np.savez_compressed(
        os.path.join(args.out, "model_stages.npz"),
        **sd,
        enc_in=x, enc_out=enc_out,
        dec_in=z_dec, dec_out=dec_out,
        vq_in=z_vq, vq_zq=zq_t.numpy(), vq_loss=np.float32(loss_t),
        vq_indices=idx_t.numpy().reshape(-1).astype(np.int32),
    )

    # ---- geometry stages ----
    rng = np.random.default_rng(3)
    b, n, h, w = 1, 2, 32, 32
    k = np.array([[20.0, 0, 15.5], [0, 20.0, 15.5], [0, 0, 1]], np.float32)
    feats = rng.uniform(-1, 1, (b, n, 3, h, w)).astype(np.float32)
    depths = rng.uniform(3, 6, (b, n, h, w)).astype(np.float32)
    src2tgt = np.tile(np.eye(4, dtype=np.float32), (b, n, 1, 1))
    src2tgt[:, 1, 0, 3] = 0.15
    with torch.no_grad():
        merged_d, merged_f, *_ = render_projection_from_srcs_fast(
            torch.from_numpy(feats),
            torch.from_numpy(depths),
            torch.from_numpy(np.tile(k, (b, 1, 1))),
            torch.from_numpy(np.tile(k, (b * n, 1, 1))),
            torch.from_numpy(src2tgt.reshape(b * n, 4, 4)),
            src_num=n,
            parallel=False,  # serial scatter = the well-defined order
        )
    np.savez_compressed(
        os.path.join(args.out, "splat.npz"),
        K=k, feats=feats, depths=depths, src2tgt=src2tgt,
        depth=merged_d.numpy().reshape(h, w),
        features=merged_f.numpy().reshape(3, h, w),
    )

    rng = np.random.default_rng(4)
    b, h, w = 2, 24, 24
    k = np.array([[15.0, 0, 11.5], [0, 15.0, 11.5], [0, 0, 1]], np.float32)
    ks = np.tile(k, (b, 1, 1))
    depth = rng.uniform(3, 6, (b, h, w)).astype(np.float32)
    pose = np.tile(np.eye(4, dtype=np.float32)[:3], (b, 1, 1))
    pose[:, 0, 3] = 0.2
    pose[:, 1, 3] = 0.07
    proj = ks @ pose
    src_img = rng.uniform(-1, 1, (b, h, w, 3)).astype(np.float32)
    src_depth = rng.uniform(3, 6, (b, h, w)).astype(np.float32)
    with torch.no_grad():
        pc_t = ref_warp.pixel2cam(
            torch.from_numpy(depth),
            torch.from_numpy(np.linalg.inv(ks).astype(np.float32)),
        )
        coords_t, z_t = ref_warp.cam2pixel(
            pc_t,
            torch.from_numpy(proj[..., :3].copy()),
            torch.from_numpy(proj[..., 3:].copy()),
        )
        warped_t, valid_t = ref_warp.inverse_warp(
            torch.from_numpy(src_img.transpose(0, 3, 1, 2)),
            torch.from_numpy(depth),
            torch.from_numpy(src_depth),
            torch.from_numpy(pose),
            torch.from_numpy(ks),
            torch.from_numpy(ks),
        )
    np.savez_compressed(
        os.path.join(args.out, "warp.npz"),
        K=k, depth=depth, pose=pose, src_img=src_img, src_depth=src_depth,
        pixel2cam=pc_t.numpy(), cam2pixel_coords=coords_t.numpy(),
        cam2pixel_z=z_t.numpy(), inverse_warp=warped_t.numpy(),
        inverse_warp_valid=valid_t.numpy().astype(np.uint8),
    )

    rng = np.random.default_rng(5)
    xm = rng.integers(0, 3, (2, 16, 16, 3)).astype(np.float32)
    with torch.no_grad():
        med = median_blur(torch.from_numpy(xm.transpose(0, 3, 1, 2)), (3, 3)).numpy()
    np.savez_compressed(
        os.path.join(args.out, "median.npz"), x=xm, median=med,
    )

    total = sum(
        os.path.getsize(os.path.join(args.out, f))
        for f in os.listdir(args.out) if f.endswith(".npz")
    )
    print(f"wrote goldens to {args.out} ({total / 1e6:.2f} MB)")


if __name__ == "__main__":
    main()

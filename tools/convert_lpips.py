"""Build LPIPS JAX weights from torch files.

Inputs:
  --vgg: a torchvision VGG16 state_dict file (e.g. vgg16-397923af.pth) or a
         full-model checkpoint containing `features.*` keys.
  --lin: the LPIPS linear heads (the reference ships
         sgam/generative_sensing_module/modules/autoencoder/lpips/vgg.pth
         with keys lin{0..4}.model.1.weight).
Output: a pickle of the LPIPS parameter pytree consumed by
  training/lpips.py (default weights/lpips.pkl).
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import os
import pickle


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--vgg", required=True)
    p.add_argument("--lin", required=True)
    p.add_argument("--out", default="weights/lpips.pkl")
    args = p.parse_args()

    import torch

    from sgam_neurips22_tpu.training.lpips import convert_torch_lpips

    vgg_sd = torch.load(args.vgg, map_location="cpu", weights_only=False)
    if hasattr(vgg_sd, "state_dict"):
        vgg_sd = vgg_sd.state_dict()
    lin_sd = torch.load(args.lin, map_location="cpu", weights_only=False)
    params = convert_torch_lpips(
        {k: v.numpy() for k, v in vgg_sd.items()},
        {k: v.numpy() for k, v in lin_sd.items()},
    )
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "wb") as f:
        pickle.dump(params, f)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()

"""Convert a reference PyTorch-Lightning .ckpt to JAX param pickles.

Produces <out>/model.pkl (+ discriminator.pkl / lpips_heads.pkl when those
weights are present in the checkpoint). model.pkl can be passed to
generate.py --ckpt, or used to warm-start training.
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
    p.add_argument("ckpt")
    p.add_argument("--out", default="weights/converted")
    args = p.parse_args()

    from sgam_neurips22_tpu.core.torch_convert import convert_checkpoint

    model, disc, lpips = convert_checkpoint(args.ckpt)
    os.makedirs(args.out, exist_ok=True)
    for name, tree in (("model", model), ("discriminator", disc), ("lpips_heads", lpips)):
        if tree:
            path = os.path.join(args.out, f"{name}.pkl")
            with open(path, "wb") as f:
                pickle.dump(tree, f)
            print(f"wrote {path}")


if __name__ == "__main__":
    main()

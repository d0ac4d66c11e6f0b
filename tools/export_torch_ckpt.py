"""Export JAX-trained weights to the reference's Lightning .ckpt format.

The inverse of tools/convert_checkpoint.py: takes an Orbax training run (or
a params pickle) and writes a torch-loadable checkpoint with the reference's
state_dict names (reference model.py:87-104 loads it back with
load_state_dict(strict=False)), so models trained here can be consumed by
the original PyTorch codebase.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sgam_neurips22_tpu.core.platform import apply_platform_env

apply_platform_env()  # honor JAX_PLATFORMS even with eager PJRT plugins

import argparse
import os
import pickle


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("source", help="params pickle OR a trainer logdir with checkpoints/")
    p.add_argument("--out", default="exported_last.ckpt")
    p.add_argument("--step", type=int, default=None)
    args = p.parse_args()

    import numpy as np
    import torch

    from sgam_neurips22_tpu.core.torch_convert import params_to_state_dict

    if os.path.isdir(args.source):
        import orbax.checkpoint as ocp

        mgr = ocp.CheckpointManager(os.path.abspath(os.path.join(args.source, "checkpoints")))
        step = args.step if args.step is not None else mgr.latest_step()
        if step is None:
            raise FileNotFoundError("no checkpoints found")
        state = mgr.restore(step)
        params = state["params"]
        global_step = int(np.asarray(state.get("step", step)))
        disc = state.get("disc_params")
    else:
        with open(args.source, "rb") as f:
            params = pickle.load(f)
        global_step, disc = 0, None

    sd = {
        k: torch.from_numpy(np.ascontiguousarray(np.asarray(v)))
        for k, v in params_to_state_dict(params).items()
    }
    if disc is not None:
        for k, v in params_to_state_dict(disc, prefix="loss.discriminator").items():
            sd[k] = torch.from_numpy(np.ascontiguousarray(np.asarray(v)))
    torch.save({"state_dict": sd, "global_step": global_step}, args.out)
    print(f"wrote {args.out} ({len(sd)} tensors, step {global_step})")


if __name__ == "__main__":
    main()

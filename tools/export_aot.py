"""AOT-export the conditional-generation inference step (jax.export).

Serializes the flagship per-frame inference function — warp-conditioned
encode -> top-k sample -> decode -> metric depth (the unit the scene
unroll repeats; reference model.py:141-167 + inference_pipeline.py
one_step_prediction) — to a portable StableHLO artifact. A serving process
deserializes and calls it WITHOUT the model-building Python (and without
retracing): deployment artifacts are versioned bytes, not code.

    python tools/export_aot.py --out flagship_step.jaxexport \
        [--ckpt trained_models/clevr-infinite/last.ckpt] \
        [--platforms tpu cpu] [--compute_dtype bfloat16]

Load side (any process with jax installed):

    from jax import export
    exp = export.deserialize(open("flagship_step.jaxexport", "rb").read())
    rgb, depth = exp.call(params, batch, rng)
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sgam_neurips22_tpu.core.platform import apply_platform_env

apply_platform_env()  # honor JAX_PLATFORMS even with eager PJRT plugins

import argparse


def export_step(model_cfg, out_path: str, platforms, topk: int = 1,
                params=None) -> None:
    import jax
    from jax import export

    from sgam_neurips22_tpu.serving import build_inference_step

    fn, (init_params, batch, rng) = build_inference_step(
        model_cfg, topk=topk,
        image_size=model_cfg.ddconfig.resolution * 4,  # 64 -> 256 (flagship)
    )
    if params is not None:
        init_params = params
    exported = export.export(jax.jit(fn), platforms=tuple(platforms))(
        init_params, batch, rng
    )
    data = exported.serialize()
    with open(out_path, "wb") as f:
        f.write(data)
    print(
        f"wrote {out_path}: {len(data) / 1e6:.1f} MB, platforms={platforms}, "
        f"in_avals={len(exported.in_avals)}"
    )


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", default="flagship_step.jaxexport")
    p.add_argument("--dataset", default="clevr-infinite",
                   choices=["clevr-infinite", "google_earth"])
    p.add_argument("--ckpt", default=None,
                   help="reference-layout .ckpt to bake the weights from "
                        "(weights travel as call arguments either way; this "
                        "only affects the example args)")
    p.add_argument("--topk", type=int, default=1)
    p.add_argument("--platforms", nargs="*", default=["tpu"],
                   help="lowering platforms baked into the artifact "
                        "(e.g. --platforms tpu cpu for a dual artifact)")
    p.add_argument("--compute_dtype", default="float32",
                   choices=["float32", "bfloat16"])
    args = p.parse_args()

    from sgam_neurips22_tpu.serving import flagship_config

    cfg = flagship_config(args.dataset, compute_dtype=args.compute_dtype)
    params = None
    if args.ckpt:
        import jax

        from sgam_neurips22_tpu.core.torch_convert import (
            convert_checkpoint,
            init_from_ckpt,
        )
        from sgam_neurips22_tpu.models import init_vqmodel

        model_np, _, _ = convert_checkpoint(args.ckpt)
        params = init_from_ckpt(init_vqmodel(jax.random.PRNGKey(0), cfg), model_np)
    export_step(cfg, args.out, args.platforms, topk=args.topk, params=params)


if __name__ == "__main__":
    main()

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


def build_step(model_cfg, topk: int = 1):
    """(fn, example_args) for the per-frame conditional inference step."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from sgam_neurips22_tpu.geometry.codec import get_codec
    from sgam_neurips22_tpu.models import forward, get_x, init_vqmodel

    codec = get_codec(model_cfg.dataset)
    params = init_vqmodel(jax.random.PRNGKey(0), model_cfg)
    b, n = 1, 5
    h = w = model_cfg.ddconfig.resolution * 4  # 64 -> 256 (flagship)
    rng = np.random.default_rng(0)
    k = np.array(
        [[355.5555, 0, w / 2], [0, 355.5555, h / 2], [0, 0, 1.0]], np.float32
    )
    batch = {
        "dst_img": jnp.zeros((b, h, w, 3), jnp.float32),
        "dst_depth": jnp.full((b, h, w), 10.0, jnp.float32),
        "src_imgs": jnp.asarray(rng.uniform(-1, 1, (b, n, h, w, 3)).astype(np.float32)),
        "src_depths": jnp.asarray(rng.uniform(8, 14, (b, n, h, w)).astype(np.float32)),
        "Ks": jnp.broadcast_to(jnp.asarray(k), (b, n, 3, 3)),
        "R_rels": jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (b, n, 3, 3)),
        "t_rels": jnp.zeros((b, n, 3), jnp.float32),
        "src_masks": jnp.ones((b, n), jnp.float32),
    }
    sample_rng = jax.random.PRNGKey(3)

    def fn(params, batch, sample_rng):
        cond = get_x(batch, model_cfg.dataset, depth_range=None)
        res = forward(
            params, model_cfg, cond.x,
            extrapolation_mask=cond.extrapolation_mask,
            topk=topk, rng=sample_rng, sample_number=1,
        )
        xrec = res.xrec[:, 0]
        rgb = jnp.clip(xrec[..., :3], -1.0, 1.0)
        depth = codec.decode(xrec[..., 3])
        return rgb, depth

    return fn, (params, batch, sample_rng)


def export_step(model_cfg, out_path: str, platforms, topk: int = 1,
                params=None) -> None:
    import jax
    from jax import export

    fn, (init_params, batch, rng) = build_step(model_cfg, topk=topk)
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
    from dataclasses import replace

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

    from __graft_entry__ import _flagship_configs

    cfg = _flagship_configs()
    if args.dataset == "google_earth":
        cfg = replace(
            cfg, n_embed=4096, dataset="google_earth",
            depth_range=(0.099975586, 4.765625),
        )
    if args.compute_dtype != "float32":
        cfg = replace(
            cfg, ddconfig=replace(cfg.ddconfig, compute_dtype=args.compute_dtype)
        )
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

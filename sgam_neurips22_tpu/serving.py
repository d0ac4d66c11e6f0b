"""Flagship model configs + the per-frame inference step, in one place.

Single source for what `__graft_entry__.entry()` (the driver's compile
check), `bench.py`, and `tools/export_aot.py` all need: the full-size
conditional-generation model (reference
configs/conditional_generation/*.yaml) and the jittable per-frame step —
warp-conditioned encode -> top-k sample -> decode -> metric depth
(reference model.py:141-167 + inference_pipeline.py one_step_prediction).
"""
from __future__ import annotations

from dataclasses import replace


def flagship_config(dataset: str = "clevr-infinite", compute_dtype: str = "float32"):
    """Full-size conditional-generation VQModelConfig for either dataset
    (reference configs/conditional_generation/{clevr-infinite,
    google_earth_vqgan}.yaml)."""
    from sgam_neurips22_tpu.models import DDConfig, VQModelConfig

    dd = DDConfig(
        ch=128, out_ch=4, ch_mult=(1, 1, 2, 2, 4), num_res_blocks=2,
        attn_resolutions=(16,), resolution=64, z_channels=256, in_channels=4,
    )
    cfg = VQModelConfig(
        ddconfig=dd, n_embed=16384, embed_dim=256,
        phase="conditional_generation", dataset="clevr-infinite",
        depth_range=(7.0, 16.0),
    )
    if dataset == "google_earth":
        cfg = replace(
            cfg, n_embed=4096, dataset="google_earth",
            depth_range=(0.099975586, 4.765625),
        )
    elif dataset != "clevr-infinite":
        raise ValueError(f"unknown dataset {dataset!r}")
    if compute_dtype != "float32":
        cfg = replace(cfg, ddconfig=replace(cfg.ddconfig, compute_dtype=compute_dtype))
    return cfg


def build_inference_step(model_cfg, topk: int = 1, num_src: int = 5,
                         image_size: int = 256):
    """(fn, example_args) for one conditional-generation inference step on
    `model_cfg`: fn(params, batch, rng) -> (rgb [B,H,W,3], metric depth)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from sgam_neurips22_tpu.geometry.codec import get_codec
    from sgam_neurips22_tpu.models import forward, get_x, init_vqmodel

    codec = get_codec(model_cfg.dataset)
    params = init_vqmodel(jax.random.PRNGKey(0), model_cfg)
    b, n, h, w = 1, num_src, image_size, image_size
    rng = np.random.default_rng(0)
    lo, hi = model_cfg.depth_range
    k = np.array(
        [[355.5555, 0, w / 2.0], [0, 355.5555, h / 2.0], [0, 0, 1.0]], np.float32
    )
    batch = {
        "dst_img": jnp.zeros((b, h, w, 3), jnp.float32),
        "dst_depth": jnp.full((b, h, w), (lo + hi) / 2, jnp.float32),
        "src_imgs": jnp.asarray(rng.uniform(-1, 1, (b, n, h, w, 3)).astype(np.float32)),
        "src_depths": jnp.asarray(
            rng.uniform(lo, hi, (b, n, h, w)).astype(np.float32)
        ),
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

"""Checkpoint-parity harness: per-stage goldens vs a reference .ckpt.

The frame-parity north star (BASELINE.md) in executable form, for users who
have the published reference checkpoints. Three modes:

1) torch cross-check (default): convert the .ckpt to JAX params, run our
   encoder/quantizer/decoder, run the torch-functional oracle
   (models/vqgan/torch_functional.py) on the SAME weights, report per-stage
   diffs against the tolerances below.

     python tools/parity_check.py trained_models/clevr-infinite/last.ckpt

2) record: dump per-stage golden activations to an .npz

     python tools/parity_check.py last.ckpt --record goldens.npz

3) compare: re-run and diff against a recorded golden file (exit code 1 on
   any stage out of tolerance) — one command for a yes/no parity answer:

     python tools/parity_check.py last.ckpt --compare goldens.npz

Stages and tolerances (max |diff|, float32 matmuls via
jax_default_matmul_precision='highest'):

  encode         2e-4   conv stack: f32 accumulation-order divergence only
  pre_quant      2e-4
  indices        exact  argmin over f32 distances (ties resolved identically)
  quantized      2e-4   codebook gather of matching indices
  decode         5e-4   decoder conv stack on top of quantized
  splat          1e-5   pure geometry (no matmul accumulation)
  frame_rgb      5e-4   full conditional step, clipped RGB
  frame_depth    5e-3   metric depth via the dataset codec (1/x amplifies)

Optionally pass --image/--depth for a real template frame; otherwise a
seeded random input is used (recorded goldens embed the input, so compare
runs are input-identical either way).
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sgam_neurips22_tpu.core.platform import apply_platform_env

apply_platform_env()  # honor JAX_PLATFORMS even with eager PJRT plugins

import argparse

TOLERANCES = {
    "encode": 2e-4,
    "pre_quant": 2e-4,
    "indices": 0.0,
    "quantized": 2e-4,
    "decode": 5e-4,
    "splat": 1e-5,
    "frame_rgb": 5e-4,
    "frame_depth": 5e-3,
}


def compute_stages(params, cfg, x, dataset: str = "clevr-infinite"):
    """Run every parity stage on our implementation; returns {stage: array}.

    Stages mirror the reference call stack (SURVEY.md section 3.3): encode
    (conv_in + Encoder), quant_conv, nearest-codeword quantize, decode, the
    forward splat conditioning renderer, and a full deterministic (topk=1)
    conditional frame with metric depth.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from sgam_neurips22_tpu.geometry.codec import get_codec
    from sgam_neurips22_tpu.geometry.splat import render_projection_from_srcs
    from sgam_neurips22_tpu.models.vqgan.autoencoder import (
        apply_decoder,
        apply_encoder,
    )
    from sgam_neurips22_tpu.models.vqgan.nn import conv2d
    from sgam_neurips22_tpu.models.vqgan.quantize import quantize
    from sgam_neurips22_tpu.pipeline.trajectory import default_intrinsics

    x = jnp.asarray(x)
    h, w = x.shape[1:3]
    out = {"input": np.asarray(x)}

    if cfg.use_extrapolation_mask:
        xin = conv2d(
            jnp.concatenate([x, jnp.zeros((*x.shape[:3], 1))], axis=-1),
            params["conv_in"],
        )
    else:
        xin = x
    h_enc = apply_encoder(params["encoder"], cfg.ddconfig, xin)
    out["encode"] = np.asarray(h_enc)
    pre_quant = conv2d(h_enc, params["quant_conv"])
    out["pre_quant"] = np.asarray(pre_quant)
    q = quantize(params["quantize"]["embedding"], pre_quant, cfg.beta)
    out["indices"] = np.asarray(q.indices)
    out["quantized"] = np.asarray(q.z_q)
    post = conv2d(q.z_q, params["post_quant_conv"])
    xrec = apply_decoder(params["decoder"], cfg.ddconfig, post)
    out["decode"] = np.asarray(xrec)

    # splat stage: deterministic two-view geometry from the test frame
    codec = get_codec(dataset)
    k = np.asarray(default_intrinsics(dataset), np.float32)
    k = jnp.asarray(k * np.array([[w / 256], [h / 256], [1]], np.float32))
    rgb = x[..., :3]
    depth = codec.decode(jnp.clip(x[..., 3], -0.99, 0.99))
    t_rel = jnp.eye(4, dtype=jnp.float32).at[0, 3].set(0.25).at[1, 3].set(-0.1)
    res = render_projection_from_srcs(
        jnp.stack([rgb, rgb], axis=1),
        jnp.stack([depth, depth], axis=1),
        k[None],
        jnp.broadcast_to(k, (1, 2, 3, 3)),
        jnp.stack([jnp.eye(4, dtype=jnp.float32), t_rel])[None],
    )
    out["splat"] = np.concatenate(
        [np.asarray(res.features), np.asarray(res.depth)], axis=-1
    )

    # full deterministic conditional frame (topk=1; the CLI default,
    # reference inference_pipeline.py:24)
    from sgam_neurips22_tpu.models.vqgan.model import forward

    fres = forward(
        params, cfg, x,
        extrapolation_mask=jnp.zeros((1, h, w, 1), bool),
        topk=1, rng=jax.random.PRNGKey(3), sample_number=1,
    )
    xr = fres.xrec[:, 0]
    out["frame_rgb"] = np.asarray(jnp.clip(xr[..., :3], -1.0, 1.0))
    out["frame_depth"] = np.asarray(codec.decode(xr[..., 3]))
    return out


def compare_stages(got, want, tolerances=TOLERANCES):
    """Returns [(stage, max_diff, tol, ok)] for the stages present in both."""
    import numpy as np

    rows = []
    for stage, tol in tolerances.items():
        if stage not in got or stage not in want:
            continue
        a, b = np.asarray(got[stage]), np.asarray(want[stage])
        if stage == "indices":
            diff = float((a != b).mean())
            ok = diff == 0.0
        else:
            diff = float(np.abs(a - b).max())
            ok = diff <= tol
        rows.append((stage, diff, tol, ok))
    return rows


def load_test_input(args, cfg):
    import numpy as np

    if args.image:
        from sgam_neurips22_tpu.pipeline.trajectory import default_intrinsics
        from sgam_neurips22_tpu.training.data.io import (
            encode_disparity_np,
            load_depth,
            load_rgb,
            ray_to_z_np,
        )

        rgb = load_rgb(args.image, (256, 256))
        depth = load_depth(args.depth, (256, 256))
        if args.dataset == "clevr-infinite":
            depth = ray_to_z_np(depth, default_intrinsics(args.dataset))
        disp = encode_disparity_np(depth, args.dataset)
        return np.concatenate([rgb, disp[..., None]], axis=-1)[None]
    x = np.random.default_rng(args.seed).uniform(
        -1, 1, (1, 256, 256, cfg.ddconfig.in_channels)
    ).astype(np.float32)
    print("using a random test input (pass --image/--depth for a real frame)")
    return x


def torch_oracle_stages(args, cfg, x):
    """Per-stage activations from the torch-functional oracle on the same
    weights (reference block semantics re-expressed in torch)."""
    import numpy as np
    import torch
    import torch.nn.functional as F

    from sgam_neurips22_tpu.core.torch_convert import load_torch_checkpoint
    from sgam_neurips22_tpu.models.vqgan import torch_functional as tfn

    sd_full = load_torch_checkpoint(args.ckpt)
    sd = {k: np.asarray(v) for k, v in sd_full.items()}
    xt = tfn.t(x)
    if cfg.use_extrapolation_mask:
        xt = torch.cat([xt, torch.zeros(1, 1, *x.shape[1:3])], 1)
        xt = F.conv2d(
            xt,
            torch.from_numpy(sd["conv_in.weight"]),
            torch.from_numpy(sd["conv_in.bias"]),
        )
    enc_sd = {k[len("encoder."):]: v for k, v in sd.items() if k.startswith("encoder.")}
    dec_sd = {k[len("decoder."):]: v for k, v in sd.items() if k.startswith("decoder.")}
    h_t = tfn.torch_encoder(xt, enc_sd, cfg.ddconfig)
    pq_t = F.conv2d(
        h_t, torch.from_numpy(sd["quant_conv.weight"]), torch.from_numpy(sd["quant_conv.bias"])
    )
    e = torch.from_numpy(sd["quantize.embedding.weight"])
    _, _, lh, lw = pq_t.shape
    zf = pq_t.permute(0, 2, 3, 1).reshape(-1, e.shape[1])
    d = (zf**2).sum(1, keepdim=True) + (e**2).sum(1) - 2 * zf @ e.T
    idx_t = d.argmin(1)
    zq_t = e[idx_t].reshape(1, lh, lw, -1).permute(0, 3, 1, 2)
    post_t = F.conv2d(
        zq_t, torch.from_numpy(sd["post_quant_conv.weight"]), torch.from_numpy(sd["post_quant_conv.bias"])
    )
    xrec_t = tfn.torch_decoder(post_t, dec_sd, cfg.ddconfig)
    return {
        "encode": tfn.un_t(h_t),
        "pre_quant": tfn.un_t(pq_t),
        "indices": idx_t.numpy().reshape(1, lh, lw),
        "quantized": tfn.un_t(zq_t),
        "decode": tfn.un_t(xrec_t),
    }


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("ckpt")
    p.add_argument("--config", default=None, help="trained-model YAML (reference schema)")
    p.add_argument("--image", default=None, help="test RGB png (default: random input)")
    p.add_argument("--depth", default=None, help="matching depth npy (ray depth for CLEVR)")
    p.add_argument("--dataset", default="clevr-infinite")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--record", default=None, metavar="NPZ",
                   help="dump per-stage goldens to this .npz and exit")
    p.add_argument("--compare", default=None, metavar="NPZ",
                   help="diff against recorded goldens; exit 1 if out of tolerance")
    args = p.parse_args()

    import jax

    jax.config.update("jax_default_matmul_precision", "highest")

    import numpy as np

    from sgam_neurips22_tpu.core.torch_convert import (
        convert_checkpoint,
        init_from_ckpt,
    )
    from sgam_neurips22_tpu.models.vqgan.model import VQModelConfig, init_vqmodel

    if args.config:
        from sgam_neurips22_tpu.core.config import load_yaml

        yaml_cfg = load_yaml(args.config)
        cfg = VQModelConfig.from_config(
            yaml_cfg.model.params,
            yaml_cfg.model.params.get("data_config")
            or yaml_cfg.get("data", {}).get("params", {}),
        )
    else:
        from __graft_entry__ import _flagship_configs

        cfg = _flagship_configs()

    params = init_vqmodel(jax.random.PRNGKey(0), cfg)
    converted, _, _ = convert_checkpoint(args.ckpt)
    params = init_from_ckpt(params, converted)
    print(f"converted {args.ckpt}")

    if args.compare:
        want = dict(np.load(args.compare))
        x = want["input"]
    else:
        x = load_test_input(args, cfg)

    got = compute_stages(params, cfg, x, args.dataset)

    if args.record:
        np.savez_compressed(args.record, **got)
        print(f"recorded {len(got)} stages -> {args.record}")
        return

    if args.compare:
        rows = compare_stages(got, want)
    else:
        rows = compare_stages(got, torch_oracle_stages(args, cfg, x))

    failed = False
    for stage, diff, tol, ok in rows:
        mark = "ok " if ok else "FAIL"
        kind = "mismatch frac" if stage == "indices" else "max|diff|"
        print(f"  {mark} {stage:12s} {kind} {diff:.3e}  (tol {tol:.0e})")
        failed |= not ok
    if failed:
        sys.exit(1)
    print("all stages within tolerance")


if __name__ == "__main__":
    main()

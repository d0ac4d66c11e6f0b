"""Checkpoint-parity harness: converted reference weights vs torch semantics.

Given a reference PyTorch-Lightning .ckpt, this converts it to JAX params,
runs our encoder/decoder/quantizer, runs the torch-functional implementation
of the same architecture (models/vqgan/torch_functional.py) on the SAME
weights, and reports activation differences stage by stage — the executable
form of the frame-parity north star (BASELINE.md) for users who have the
published checkpoints.

  python tools/parity_check.py trained_models/clevr-infinite/last.ckpt \
      [--config trained_models/clevr-infinite/config.yaml] [--image im.png --depth dm.npy]

Run with JAX_PLATFORMS=cpu (or --matmul_precision float32 on TPU) for
bit-level comparisons.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("ckpt")
    p.add_argument("--config", default=None, help="trained-model YAML (reference schema)")
    p.add_argument("--image", default=None, help="test RGB png (default: random input)")
    p.add_argument("--depth", default=None, help="matching depth npy (ray depth for CLEVR)")
    p.add_argument("--dataset", default="clevr-infinite")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    import jax

    jax.config.update("jax_default_matmul_precision", "float32")

    import jax.numpy as jnp
    import numpy as np

    from sgam_neurips22_tpu.core.torch_convert import (
        convert_checkpoint,
        init_from_ckpt,
        load_torch_checkpoint,
        params_to_state_dict,
    )
    from sgam_neurips22_tpu.models.vqgan.autoencoder import (
        apply_decoder,
        apply_encoder,
    )
    from sgam_neurips22_tpu.models.vqgan.model import VQModelConfig, init_vqmodel
    from sgam_neurips22_tpu.models.vqgan.quantize import quantize
    from sgam_neurips22_tpu.models.vqgan import torch_functional as tfn

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

    # test input
    if args.image:
        from sgam_neurips22_tpu.training.data.io import load_rgb, load_depth, ray_to_z_np, encode_disparity_np
        from sgam_neurips22_tpu.pipeline.trajectory import default_intrinsics

        rgb = load_rgb(args.image, (256, 256))
        depth = load_depth(args.depth, (256, 256))
        if args.dataset == "clevr-infinite":
            depth = ray_to_z_np(depth, default_intrinsics(args.dataset))
        disp = encode_disparity_np(depth, args.dataset)
        x = np.concatenate([rgb, disp[..., None]], axis=-1)[None]
    else:
        x = np.random.default_rng(args.seed).uniform(
            -1, 1, (1, 256, 256, cfg.ddconfig.in_channels)
        ).astype(np.float32)
        print("using a random test input (pass --image/--depth for a real frame)")

    # JAX side
    if cfg.use_extrapolation_mask:
        from sgam_neurips22_tpu.models.vqgan.nn import conv2d

        xin = conv2d(
            jnp.concatenate(
                [jnp.asarray(x), jnp.zeros((*x.shape[:3], 1))], axis=-1
            ),
            params["conv_in"],
        )
    else:
        xin = jnp.asarray(x)
    h_enc = apply_encoder(params["encoder"], cfg.ddconfig, xin)
    pre_quant = conv2d(h_enc, params["quant_conv"])
    q = quantize(params["quantize"]["embedding"], pre_quant, cfg.beta)
    post = conv2d(q.z_q, params["post_quant_conv"])
    xrec = apply_decoder(params["decoder"], cfg.ddconfig, post)

    # torch-functional side, same weights
    import torch
    import torch.nn.functional as F

    sd_full = load_torch_checkpoint(args.ckpt)
    sd = {k: np.asarray(v) for k, v in sd_full.items()}
    xt = tfn.t(x)
    if cfg.use_extrapolation_mask:
        xt = torch.cat([xt, torch.zeros(1, 1, 256, 256)], 1)
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
    # nearest-codeword quantize in torch
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

    def report(name, a, b_t):
        b = tfn.un_t(b_t) if b_t.dim() == 4 else b_t.numpy()
        a = np.asarray(a)
        print(f"{name:18s} max|diff| {np.abs(a - b).max():.3e}   mean|diff| {np.abs(a - b).mean():.3e}")

    report("encoder out", h_enc, h_t)
    report("pre-quant", pre_quant, pq_t)
    idx_match = (np.asarray(q.indices).reshape(-1) == idx_t.numpy()).mean()
    print(f"{'codeword indices':18s} match {idx_match * 100:.2f}%")
    report("reconstruction", xrec, xrec_t)


if __name__ == "__main__":
    main()

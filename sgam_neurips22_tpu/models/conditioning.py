"""Conditioning construction: warp source views into the target frame and
encode depth as disparity — the reference's `VQModel.get_x`
(model.py:179-269), re-expressed as a pure function over NHWC batches.

Two conditioning renderers exist (SURVEY.md section 3.5):
(a) forward point splat from source frames (geometry/splat.py), used when the
    batch carries raw source views;
(b) map re-query: the batch carries `warped_tgt_features`/`warped_tgt_depth`
    produced by TSDF integrate + raycast + inverse warp (mapping/ +
    geometry/warp.py), and the splat is short-circuited
    (reference model.py:196-199).
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp

from sgam_neurips22_tpu.geometry.camera import pose_matrix
from sgam_neurips22_tpu.geometry.codec import get_codec
from sgam_neurips22_tpu.geometry.splat import render_projection_from_srcs


class Conditioning(NamedTuple):
    x: jnp.ndarray  # [B, H, W, 4] warped RGB + warped disparity
    x_dst: jnp.ndarray  # [B, H, W, 4] GT RGB + GT disparity
    extrapolation_mask: jnp.ndarray  # [B, H, W, 1] bool
    warped_disparity: jnp.ndarray  # [B, H, W, 1] in [-1,1] (-2 masked)


# Per-dataset default for the binned Pallas splat z-buffer (bit-identical
# output; geometry-dependent SPEED, measured on v5e 2026-08-20, NOTES.md
# round 5): the kernel's cost scales with per-chunk target-row spans.
# CLEVR's lateral grid motion keeps spans narrow -> kernel wins (+14%
# flythrough); google_earth's forward motion spreads points radially ->
# kernel loses (123.4 -> 90.5 fps), so GE keeps the XLA scatter. Unlisted
# datasets fall through to the backend default (ON for TPU).
# SGAM_TPU_SPLAT_PALLAS=0/1 still overrides everything both ways.
SPLAT_PALLAS_DATASET_DEFAULT = {"google_earth": False}


def get_x(
    batch: dict,
    dataset: str,
    depth_range: Optional[tuple] = None,
    collision: str = "nearest",
    splat_stride: int = 1,
) -> Conditioning:
    """Build (conditioning, target) pairs from an NHWC batch.

    Expected batch keys (NHWC analogs of the reference datasets'
    data/clevr-infinite.py:157-171 outputs):
      dst_img [B, H, W, 3], dst_depth [B, H, W],
      src_imgs [B, N, H, W, 3], src_depths [B, N, H, W],
      Ks [B, N, 3, 3], R_rels [B, N, 3, 3], t_rels [B, N, 3],
      optional src_masks [B, N],
      optional warped_tgt_features [B, H, W, 3] + warped_tgt_depth [B, H, W]
        (the TSDF map re-query path).

    Args:
      depth_range: clip range for the splat; None reproduces the inference
        CLI's `no_depth_range=True` (reference inference_pipeline.py:872).
    """
    codec = get_codec(dataset)
    x_dst_rgb = batch["dst_img"]
    x_depth = batch["dst_depth"]

    if "warped_tgt_features" in batch:
        feats = batch["warped_tgt_features"]
        warped_depth = batch["warped_tgt_depth"][..., None]
        extrapolation = warped_depth <= 0.0  # reference model.py:199
    else:
        t_src2tgt = pose_matrix(batch["R_rels"], batch["t_rels"])
        res = render_projection_from_srcs(
            batch["src_imgs"],
            batch["src_depths"],
            batch["Ks"][:, 0],
            batch["Ks"],
            t_src2tgt,
            src_masks=batch.get("src_masks"),
            depth_range=depth_range,
            collision=collision,
            splat_stride=splat_stride,
            pallas=SPLAT_PALLAS_DATASET_DEFAULT.get(dataset),
        )
        feats = res.features
        warped_depth = res.depth
        extrapolation = res.extrapolation_mask

    # Disparity encodings (reference model.py:210-229); masked pixels -> -2.
    gt_disparity = codec.encode(x_depth)[..., None]
    warped_disparity = codec.encode_masked(warped_depth, extrapolation)

    x = jnp.concatenate([feats, warped_disparity], axis=-1)
    x_dst = jnp.concatenate([x_dst_rgb, gt_disparity], axis=-1)
    return Conditioning(x, x_dst, extrapolation, warped_disparity)

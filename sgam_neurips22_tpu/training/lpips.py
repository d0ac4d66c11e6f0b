"""LPIPS perceptual loss (VGG16 backbone), functional NHWC JAX.

Rebuild of reference modules/losses/lpips.py: a frozen VGG16 feature
extractor sliced at relu1_2/relu2_2/relu3_3/relu4_3/relu5_3 (:82-100),
channel-unit-normalized feature diffs, fixed 1x1 linear heads
(`NetLinLayer`, :69-75), spatially averaged and summed (:41-54).

Weights: the reference ships only the 5 lin heads
(modules/autoencoder/lpips/vgg.pth); the VGG16 backbone comes from
torchvision. tools/convert_lpips.py builds the full parameter tree from
those torch files. `init_lpips` gives a randomly initialized tree with the
exact same structure (used by tests and as a placeholder when pretrained
weights are unavailable; perceptual numbers then differ from the reference
but all shapes/flows are identical).
"""
from __future__ import annotations

from typing import Any, Dict, List

import jax
import jax.numpy as jnp

from sgam_neurips22_tpu.models.vqgan.nn import _conv_init

Params = Dict[str, Any]

# VGG16 `features` conv layers: (torchvision index, in_ch, out_ch)
VGG16_CONVS = [
    (0, 3, 64), (2, 64, 64),
    (5, 64, 128), (7, 128, 128),
    (10, 128, 256), (12, 256, 256), (14, 256, 256),
    (17, 256, 512), (19, 512, 512), (21, 512, 512),
    (24, 512, 512), (26, 512, 512), (28, 512, 512),
]
# slice boundaries: features[x] for x in range(4), [4,9), [9,16), [16,23), [23,30)
SLICE_END_CONV = {3: 0, 8: 1, 15: 2, 22: 3, 29: 4}  # relu idx -> slice id
LPIPS_CHANNELS = [64, 128, 256, 512, 512]

# ScalingLayer constants (reference lpips.py:57-63)
_SHIFT = jnp.array([-0.030, -0.088, -0.188], jnp.float32)
_SCALE = jnp.array([0.458, 0.448, 0.450], jnp.float32)


import functools


@functools.partial(jax.jit, static_argnames=("dtype",))
def init_lpips(key: jax.Array, dtype=jnp.float32) -> Params:
    keys = jax.random.split(key, len(VGG16_CONVS) + 5)
    convs = [
        _conv_init(keys[i], 3, 3, cin, cout, dtype)
        for i, (_, cin, cout) in enumerate(VGG16_CONVS)
    ]
    lins = [
        {
            "weight": jax.random.uniform(
                keys[len(VGG16_CONVS) + i], (1, 1, c, 1), dtype, 0.0, 0.1
            )
        }
        for i, c in enumerate(LPIPS_CHANNELS)
    ]
    return {"convs": convs, "lins": lins}


def _conv(x, p):
    y = jax.lax.conv_general_dilated(
        x, p["weight"].astype(x.dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + p["bias"].astype(x.dtype) if "bias" in p else y


def _maxpool2(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    )


def vgg16_slices(params: Params, x: jnp.ndarray) -> List[jnp.ndarray]:
    """x: [B, H, W, 3] -> the 5 relu slice outputs (reference lpips.py:78-123)."""
    outs = []
    convs = params["convs"]
    ci = 0
    h = x
    # layout: [conv relu]*2 pool [conv relu]*2 pool [conv relu]*3 pool x2 ...
    plan = [2, 2, 3, 3, 3]  # convs per block
    for block, n in enumerate(plan):
        if block > 0:
            h = _maxpool2(h)
        for _ in range(n):
            h = jax.nn.relu(_conv(h, convs[ci]))
            ci += 1
        outs.append(h)
    return outs


def _unit_normalize(x: jnp.ndarray, eps: float = 1e-10) -> jnp.ndarray:
    norm = jnp.sqrt(jnp.sum(x**2, axis=-1, keepdims=True))
    return x / (norm + eps)


def lpips(params: Params, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Perceptual distance per batch element, shape [B, 1, 1, 1]
    (matches the reference's broadcast into the L1 map,
    vqperceptual.py:80-83). Inputs are RGB in [-1, 1], NHWC."""
    xs = (x - _SHIFT) / _SCALE
    ys = (y - _SHIFT) / _SCALE
    fx = vgg16_slices(params, xs)
    fy = vgg16_slices(params, ys)
    total = None
    for k in range(5):
        d = (_unit_normalize(fx[k]) - _unit_normalize(fy[k])) ** 2
        lin = jax.lax.conv_general_dilated(
            d, params["lins"][k]["weight"].astype(d.dtype), (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        val = jnp.mean(lin, axis=(1, 2), keepdims=True)  # spatial average
        total = val if total is None else total + val
    return total


def convert_torch_lpips(
    vgg_features_state: Dict[str, Any], lin_heads_state: Dict[str, Any]
) -> Params:
    """Build the LPIPS tree from torch state dicts.

    Args:
      vgg_features_state: torchvision vgg16 ``features`` state_dict
        (keys like '0.weight' or 'features.0.weight'), OIHW.
      lin_heads_state: the shipped vgg.pth (keys 'lin0.model.1.weight'...).
    """
    import numpy as np

    def get(k):
        if k in vgg_features_state:
            return np.asarray(vgg_features_state[k])
        return np.asarray(vgg_features_state[f"features.{k}"])

    convs = []
    for idx, _, _ in VGG16_CONVS:
        w = get(f"{idx}.weight").transpose(2, 3, 1, 0)
        b = get(f"{idx}.bias")
        convs.append({"weight": jnp.asarray(w), "bias": jnp.asarray(b)})
    lins = []
    for i in range(5):
        w = np.asarray(lin_heads_state[f"lin{i}.model.1.weight"])
        lins.append({"weight": jnp.asarray(w.transpose(2, 3, 1, 0))})
    return {"convs": convs, "lins": lins}

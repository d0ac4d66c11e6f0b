"""InceptionV3 pool3 feature extractor for FID (functional NHWC JAX).

Rebuild of the reference's vendored pytorch-fid InceptionV3
(modules/misc/pytorch_fid/inception.py): the torchvision InceptionV3
architecture up to the final 2048-d average pool, with pytorch-fid's
modifications (avg-pools with count_include_pad=False inside the Inception
blocks; Mixed_7c's branch pool uses max like FIDInceptionE_2 when
`fid_variant=True`).

Parameters are a flat {dotted torchvision name: array} dict, so the
published torch weights (pt_inception-2015-12-05 or torchvision
inception_v3) convert mechanically via `convert_torch_inception`.
Initialization and application share one architecture definition through a
lazy ParamStore (init mode materializes arrays on first use).

Input: [B, 299, 299, 3] in [-1, 1] (pytorch_fid normalize_input output).
Output: [B, 2048].
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


class ParamStore:
    """Flat dotted-name parameter dict with optional lazy init."""

    def __init__(self, params: Optional[Dict[str, jnp.ndarray]] = None, rng=None):
        self.params = dict(params) if params is not None else {}
        self.init_mode = params is None
        self._rng = rng

    def conv(self, name: str, cin: int, cout: int, kh: int, kw: int) -> jnp.ndarray:
        key = f"{name}.conv.weight"
        if self.init_mode and key not in self.params:
            self._rng, sub = jax.random.split(self._rng)
            self.params[key] = 0.1 * jax.random.normal(sub, (kh, kw, cin, cout))
        return self.params[key]

    def bn(self, name: str, c: int):
        base = f"{name}.bn"
        if self.init_mode and f"{base}.weight" not in self.params:
            self.params[f"{base}.weight"] = jnp.ones((c,))
            self.params[f"{base}.bias"] = jnp.zeros((c,))
            self.params[f"{base}.running_mean"] = jnp.zeros((c,))
            self.params[f"{base}.running_var"] = jnp.ones((c,))
        return (
            self.params[f"{base}.weight"],
            self.params[f"{base}.bias"],
            self.params[f"{base}.running_mean"],
            self.params[f"{base}.running_var"],
        )


def _basic_conv(store, name, x, cout, kernel, stride=1, padding=(0, 0)):
    """Conv (no bias) + BN(eps 0.001, inference) + ReLU."""
    kh, kw = kernel if isinstance(kernel, tuple) else (kernel, kernel)
    cin = x.shape[-1]
    w = store.conv(name, cin, cout, kh, kw)
    pad = padding if isinstance(padding[0], tuple) else ((padding[0], padding[0]), (padding[1], padding[1]))
    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (stride, stride), pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    g, b, mean, var = store.bn(name, cout)
    y = (y - mean) * jax.lax.rsqrt(var + 1e-3) * g + b
    return jax.nn.relu(y)


def _max_pool(x, k=3, s=2, pad=0):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, k, k, 1), (1, s, s, 1),
        ((0, 0), (pad, pad), (pad, pad), (0, 0)),
    )


def _avg_pool(x, k=3, s=1, pad=1, nocount=True):
    """avg_pool2d. nocount=True is torch count_include_pad=False (the
    pytorch-fid InceptionA/C/E_1 override); nocount=False divides by k*k
    like torchvision's default (count_include_pad=True)."""
    summed = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, k, k, 1), (1, s, s, 1),
        ((0, 0), (pad, pad), (pad, pad), (0, 0)),
    )
    if not nocount:
        return summed / (k * k)
    ones = jnp.ones_like(x[..., :1])
    counts = jax.lax.reduce_window(
        ones, 0.0, jax.lax.add, (1, k, k, 1), (1, s, s, 1),
        ((0, 0), (pad, pad), (pad, pad), (0, 0)),
    )
    return summed / counts


def _inception_a(store, name, x, pool_features, fid=True):
    b1 = _basic_conv(store, f"{name}.branch1x1", x, 64, 1)
    b5 = _basic_conv(store, f"{name}.branch5x5_1", x, 48, 1)
    b5 = _basic_conv(store, f"{name}.branch5x5_2", b5, 64, 5, padding=(2, 2))
    b3 = _basic_conv(store, f"{name}.branch3x3dbl_1", x, 64, 1)
    b3 = _basic_conv(store, f"{name}.branch3x3dbl_2", b3, 96, 3, padding=(1, 1))
    b3 = _basic_conv(store, f"{name}.branch3x3dbl_3", b3, 96, 3, padding=(1, 1))
    bp = _avg_pool(x, nocount=fid)
    bp = _basic_conv(store, f"{name}.branch_pool", bp, pool_features, 1)
    return jnp.concatenate([b1, b5, b3, bp], axis=-1)


def _inception_b(store, name, x):
    b3 = _basic_conv(store, f"{name}.branch3x3", x, 384, 3, stride=2)
    bd = _basic_conv(store, f"{name}.branch3x3dbl_1", x, 64, 1)
    bd = _basic_conv(store, f"{name}.branch3x3dbl_2", bd, 96, 3, padding=(1, 1))
    bd = _basic_conv(store, f"{name}.branch3x3dbl_3", bd, 96, 3, stride=2)
    bp = _max_pool(x)
    return jnp.concatenate([b3, bd, bp], axis=-1)


def _inception_c(store, name, x, c7, fid=True):
    b1 = _basic_conv(store, f"{name}.branch1x1", x, 192, 1)
    b7 = _basic_conv(store, f"{name}.branch7x7_1", x, c7, 1)
    b7 = _basic_conv(store, f"{name}.branch7x7_2", b7, c7, (1, 7), padding=(0, 3))
    b7 = _basic_conv(store, f"{name}.branch7x7_3", b7, 192, (7, 1), padding=(3, 0))
    bd = _basic_conv(store, f"{name}.branch7x7dbl_1", x, c7, 1)
    bd = _basic_conv(store, f"{name}.branch7x7dbl_2", bd, c7, (7, 1), padding=(3, 0))
    bd = _basic_conv(store, f"{name}.branch7x7dbl_3", bd, c7, (1, 7), padding=(0, 3))
    bd = _basic_conv(store, f"{name}.branch7x7dbl_4", bd, c7, (7, 1), padding=(3, 0))
    bd = _basic_conv(store, f"{name}.branch7x7dbl_5", bd, 192, (1, 7), padding=(0, 3))
    bp = _avg_pool(x, nocount=fid)
    bp = _basic_conv(store, f"{name}.branch_pool", bp, 192, 1)
    return jnp.concatenate([b1, b7, bd, bp], axis=-1)


def _inception_d(store, name, x):
    b3 = _basic_conv(store, f"{name}.branch3x3_1", x, 192, 1)
    b3 = _basic_conv(store, f"{name}.branch3x3_2", b3, 320, 3, stride=2)
    b7 = _basic_conv(store, f"{name}.branch7x7x3_1", x, 192, 1)
    b7 = _basic_conv(store, f"{name}.branch7x7x3_2", b7, 192, (1, 7), padding=(0, 3))
    b7 = _basic_conv(store, f"{name}.branch7x7x3_3", b7, 192, (7, 1), padding=(3, 0))
    b7 = _basic_conv(store, f"{name}.branch7x7x3_4", b7, 192, 3, stride=2)
    bp = _max_pool(x)
    return jnp.concatenate([b3, b7, bp], axis=-1)


def _inception_e(store, name, x, pool_mode="avg", fid=True):
    b1 = _basic_conv(store, f"{name}.branch1x1", x, 320, 1)
    b3 = _basic_conv(store, f"{name}.branch3x3_1", x, 384, 1)
    b3 = jnp.concatenate(
        [
            _basic_conv(store, f"{name}.branch3x3_2a", b3, 384, (1, 3), padding=(0, 1)),
            _basic_conv(store, f"{name}.branch3x3_2b", b3, 384, (3, 1), padding=(1, 0)),
        ],
        axis=-1,
    )
    bd = _basic_conv(store, f"{name}.branch3x3dbl_1", x, 448, 1)
    bd = _basic_conv(store, f"{name}.branch3x3dbl_2", bd, 384, 3, padding=(1, 1))
    bd = jnp.concatenate(
        [
            _basic_conv(store, f"{name}.branch3x3dbl_3a", bd, 384, (1, 3), padding=(0, 1)),
            _basic_conv(store, f"{name}.branch3x3dbl_3b", bd, 384, (3, 1), padding=(1, 0)),
        ],
        axis=-1,
    )
    if pool_mode == "max":  # FIDInceptionE_2 (Mixed_7c)
        bp = _max_pool(x, k=3, s=1, pad=1)
    else:
        bp = _avg_pool(x, nocount=fid)
    bp = _basic_conv(store, f"{name}.branch_pool", bp, 192, 1)
    return jnp.concatenate([b1, b3, bd, bp], axis=-1)


def inception_v3_features(
    params: Optional[Dict[str, jnp.ndarray]],
    x: jnp.ndarray,
    fid_variant: bool = True,
    rng: Optional[jax.Array] = None,
):
    """[B, 299, 299, 3] in [-1, 1] -> [B, 2048] pool3 features.

    With params=None, runs in init mode and returns (features, params)."""
    store = ParamStore(params, rng if rng is not None else jax.random.PRNGKey(0))
    h = _basic_conv(store, "Conv2d_1a_3x3", x, 32, 3, stride=2)
    h = _basic_conv(store, "Conv2d_2a_3x3", h, 32, 3)
    h = _basic_conv(store, "Conv2d_2b_3x3", h, 64, 3, padding=(1, 1))
    h = _max_pool(h)
    h = _basic_conv(store, "Conv2d_3b_1x1", h, 80, 1)
    h = _basic_conv(store, "Conv2d_4a_3x3", h, 192, 3)
    h = _max_pool(h)
    # fid_variant toggles ALL of pytorch-fid's pooling overrides:
    # InceptionA/C and Mixed_7b use count_include_pad=False avg-pools,
    # Mixed_7c swaps its branch pool to max. fid_variant=False is plain
    # torchvision inception_v3 (count_include_pad=True, avg at 7c).
    h = _inception_a(store, "Mixed_5b", h, 32, fid=fid_variant)
    h = _inception_a(store, "Mixed_5c", h, 64, fid=fid_variant)
    h = _inception_a(store, "Mixed_5d", h, 64, fid=fid_variant)
    h = _inception_b(store, "Mixed_6a", h)
    h = _inception_c(store, "Mixed_6b", h, 128, fid=fid_variant)
    h = _inception_c(store, "Mixed_6c", h, 160, fid=fid_variant)
    h = _inception_c(store, "Mixed_6d", h, 160, fid=fid_variant)
    h = _inception_c(store, "Mixed_6e", h, 192, fid=fid_variant)
    h = _inception_d(store, "Mixed_7a", h)
    h = _inception_e(store, "Mixed_7b", h, fid=fid_variant)
    h = _inception_e(store, "Mixed_7c", h,
                     pool_mode="max" if fid_variant else "avg",
                     fid=fid_variant)
    feats = jnp.mean(h, axis=(1, 2))
    if store.init_mode:
        return feats, store.params
    return feats


def init_inception(rng: jax.Array) -> Dict[str, jnp.ndarray]:
    """Random-weight parameter dict (tests / placeholder)."""
    dummy = jnp.zeros((1, 299, 299, 3))
    _, params = inception_v3_features(None, dummy, rng=rng)
    return params


def convert_torch_inception(state_dict) -> Dict[str, jnp.ndarray]:
    """torchvision/pytorch-fid InceptionV3 state_dict -> our flat dict."""
    out: Dict[str, jnp.ndarray] = {}
    for name, tensor in state_dict.items():
        arr = np.asarray(tensor.detach().cpu().numpy() if hasattr(tensor, "detach") else tensor)
        if name.startswith(("fc.", "AuxLogits")) or name.endswith("num_batches_tracked"):
            continue
        if arr.ndim == 4:
            arr = arr.transpose(2, 3, 1, 0)
        out[name] = jnp.asarray(arr)
    return out


def inception_feature_fn(params: Dict[str, jnp.ndarray], resize: bool = True):
    """Feature fn for utils/fid.get_fid_score: accepts [B, H, W, 3] in
    [-1, 1], bilinear-resizes to 299 like pytorch-fid's resize_input."""
    import functools

    @functools.partial(jax.jit)
    def fn(x):
        if resize:
            x = jax.image.resize(x, (x.shape[0], 299, 299, 3), "bilinear")
        return inception_v3_features(params, x)

    def apply(batch: np.ndarray) -> np.ndarray:
        return np.asarray(fn(jnp.asarray(batch)))

    return apply

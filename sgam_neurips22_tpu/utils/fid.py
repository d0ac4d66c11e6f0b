"""FID scoring (Frechet Inception Distance) — offline eval utility.

Rebuild of the reference's vendored pytorch-fid copy
(modules/misc/pytorch_fid/fid_score.py:251-269 `get_fid_score`,
`calculate_frechet_distance`; inception.py `InceptionV3`). The Frechet
distance and the directory->statistics pipeline are exact; the feature
extractor is pluggable:

- `vgg_features(lpips_params)`: VGG16 relu5_3 features from the LPIPS
  backbone (always available once LPIPS weights are converted);
- an InceptionV3 pool3 extractor can be dropped in via `feature_fn` once
  its weights are converted (tools/convert_lpips.py pattern) — FID numbers
  are only comparable across runs using the same extractor.

Like the reference, this is not called by train/inference — it's offline
tooling.
"""
from __future__ import annotations

import glob
import os
from typing import Callable, Optional, Tuple

import numpy as np


def calculate_frechet_distance(
    mu1: np.ndarray, sigma1: np.ndarray, mu2: np.ndarray, sigma2: np.ndarray,
    eps: float = 1e-6,
) -> float:
    """||mu1 - mu2||^2 + Tr(S1 + S2 - 2 sqrt(S1 S2))
    (reference fid_score.py calculate_frechet_distance)."""
    from scipy import linalg

    diff = mu1 - mu2
    covmean, _ = linalg.sqrtm(sigma1.dot(sigma2), disp=False)
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = linalg.sqrtm((sigma1 + offset).dot(sigma2 + offset))
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(
        diff.dot(diff) + np.trace(sigma1) + np.trace(sigma2) - 2 * np.trace(covmean)
    )


def compute_statistics(features: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    mu = np.mean(features, axis=0)
    sigma = np.cov(features, rowvar=False)
    return mu, sigma


def vgg_features(lpips_params) -> Callable[[np.ndarray], np.ndarray]:
    """Feature fn: spatially-averaged relu5_3 VGG16 activations [B, 512]."""
    import jax
    import jax.numpy as jnp

    from sgam_neurips22_tpu.training.lpips import vgg16_slices

    @jax.jit
    def fn(x):
        feats = vgg16_slices(lpips_params, x)[-1]
        return jnp.mean(feats, axis=(1, 2))

    def apply(batch: np.ndarray) -> np.ndarray:
        return np.asarray(fn(jnp.asarray(batch)))

    return apply


def features_from_images(
    images: np.ndarray, feature_fn, batch_size: int = 32
) -> np.ndarray:
    out = []
    for i in range(0, len(images), batch_size):
        out.append(feature_fn(images[i : i + batch_size]))
    return np.concatenate(out)


def load_image_dir(path: str, resolution=(256, 256)) -> np.ndarray:
    """All im_*.png (or *.png) in a directory -> [N, H, W, 3] in [-1, 1]."""
    from sgam_neurips22_tpu.training.data.io import load_rgb

    paths = sorted(glob.glob(os.path.join(path, "im_*.png"))) or sorted(
        glob.glob(os.path.join(path, "*.png"))
    )
    if not paths:
        raise FileNotFoundError(f"no images under {path}")
    return np.stack([load_rgb(p, resolution) for p in paths])


def get_fid_score(
    generated_path: str,
    gt_path: str,
    feature_fn: Optional[Callable] = None,
    lpips_params=None,
    resolution=(256, 256),
) -> float:
    """Directory-vs-directory FID (reference fid_score.py:251-269)."""
    if feature_fn is None:
        if lpips_params is None:
            raise ValueError("provide feature_fn or lpips_params")
        feature_fn = vgg_features(lpips_params)
    f1 = features_from_images(load_image_dir(generated_path, resolution), feature_fn)
    f2 = features_from_images(load_image_dir(gt_path, resolution), feature_fn)
    return calculate_frechet_distance(*compute_statistics(f1), *compute_statistics(f2))

"""Evaluation metrics: PSNR + SSIM with visibility-mask variants.

Rebuild of reference modules/misc/metrics.py (PSNR :9-23, SSIM :26-83).
Pure numpy/scipy-free: the 11x11 sigma-1.5 Gaussian window convolution is a
separable correlate implemented with numpy (matches cv2.filter2D with
reflect-101 borders on the valid interior used by the reference, since it
crops [5:-5, 5:-5]).
Images are on the [0, 255] scale like the reference.
"""
from __future__ import annotations

from typing import Optional, Tuple, Union

import numpy as np


def psnr(
    img1: np.ndarray,
    img2: np.ndarray,
    visibility_mask: Optional[np.ndarray] = None,
) -> Union[float, Tuple[float, float]]:
    """20*log10(255/sqrt(mse)); with a mask also returns the visible-only
    variant (reference metrics.py:16-23)."""
    def _db(mse: float) -> float:
        # identical images -> +inf dB, without a divide-by-zero warning
        return float(20 * np.log10(255.0 / np.sqrt(mse))) if mse > 0 else np.inf

    mse = np.mean((img1.astype(np.float64) - img2.astype(np.float64)) ** 2)
    full = _db(mse)
    if visibility_mask is None:
        return full
    n_vis = visibility_mask.sum()
    if n_vis == 0:
        # fully-extrapolated frame: no visible pixels to score. NaN (not a
        # perfect +inf) so aggregators can nanmean/skip it.
        return full, float("nan")
    diff2 = (img1.astype(np.float64) - img2.astype(np.float64)) ** 2
    vis = (diff2 * visibility_mask).sum() / n_vis
    return full, _db(vis)


def _gaussian_window(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    # cv2.getGaussianKernel equivalent
    xs = np.arange(size, dtype=np.float64) - (size - 1) / 2
    k = np.exp(-(xs**2) / (2 * sigma**2))
    k = k / k.sum()
    return np.outer(k, k)


def _filter_valid(img: np.ndarray, window: np.ndarray) -> np.ndarray:
    """2D correlation, valid region only (the reference crops [5:-5,5:-5]
    after filter2D, which makes border handling irrelevant)."""
    kh, kw = window.shape
    h, w = img.shape
    # im2col via stride tricks
    s0, s1 = img.strides
    shape = (h - kh + 1, w - kw + 1, kh, kw)
    patches = np.lib.stride_tricks.as_strided(img, shape=shape, strides=(s0, s1, s0, s1))
    return np.einsum("hwij,ij->hw", patches, window)


def _ssim_single(
    img1: np.ndarray,
    img2: np.ndarray,
    visibility_mask: Optional[np.ndarray] = None,
):
    c1 = (0.01 * 255) ** 2
    c2 = (0.03 * 255) ** 2
    img1 = img1.astype(np.float64)
    img2 = img2.astype(np.float64)
    window = _gaussian_window()
    mu1 = _filter_valid(img1, window)
    mu2 = _filter_valid(img2, window)
    mu1_sq, mu2_sq, mu1_mu2 = mu1**2, mu2**2, mu1 * mu2
    sigma1_sq = _filter_valid(img1**2, window) - mu1_sq
    sigma2_sq = _filter_valid(img2**2, window) - mu2_sq
    sigma12 = _filter_valid(img1 * img2, window) - mu1_mu2
    ssim_map = ((2 * mu1_mu2 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2)
    )
    if visibility_mask is not None:
        vm = visibility_mask[5:-5, 5:-5]
        n_vis = vm.sum()
        if n_vis == 0:  # no visible pixels: NaN, see psnr()
            return float(ssim_map.mean()), float("nan")
        return float(ssim_map.mean()), float((ssim_map * vm).sum() / n_vis)
    return float(ssim_map.mean())


def ssim(
    img1: np.ndarray,
    img2: np.ndarray,
    visibility_mask: Optional[np.ndarray] = None,
):
    """SSIM over [0,255] images; 3-channel images average per-channel SSIM
    (reference metrics.py:35-56; note the reference's unmasked color branch
    passes the full image into _ssim per iteration — an obvious bug we fix
    by using the channel)."""
    if img1.shape != img2.shape:
        raise ValueError("Input images must have the same dimensions.")
    if img1.ndim == 2:
        return _ssim_single(img1, img2, visibility_mask)
    if img1.ndim == 3 and img1.shape[2] == 1:
        return _ssim_single(img1[..., 0], img2[..., 0], visibility_mask)
    if img1.ndim == 3 and img1.shape[2] == 3:
        vals = [
            _ssim_single(
                img1[..., i], img2[..., i],
                visibility_mask[..., i] if visibility_mask is not None else None,
            )
            for i in range(3)
        ]
        if visibility_mask is not None:
            full = float(np.mean([v[0] for v in vals]))
            vis = float(np.mean([v[1] for v in vals]))
            return full, vis
        return float(np.mean(vals))
    raise ValueError("Wrong input image dimensions.")

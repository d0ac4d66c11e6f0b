"""Metrics tests: PSNR closed forms + SSIM vs the cv2 reference formula."""
import numpy as np
import pytest

from sgam_neurips22_tpu.utils.metrics import psnr, ssim


def test_psnr_known_value():
    a = np.zeros((16, 16))
    b = np.full((16, 16), 10.0)
    # mse=100 -> psnr = 20*log10(255/10)
    np.testing.assert_allclose(psnr(a, b), 20 * np.log10(25.5), rtol=1e-6)


def test_psnr_masked():
    a = np.zeros((4, 4))
    b = np.zeros((4, 4))
    b[0, 0] = 8.0
    mask = np.zeros((4, 4))
    mask[1:, 1:] = 1.0  # mask out the difference
    full, vis = psnr(a, b, mask)
    assert vis == np.inf or vis > full


def test_ssim_identical_is_one():
    img = np.random.default_rng(0).uniform(0, 255, (32, 32))
    np.testing.assert_allclose(ssim(img, img), 1.0, atol=1e-9)


def test_ssim_matches_cv2_reference():
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(1)
    a = rng.uniform(0, 255, (32, 32))
    b = np.clip(a + rng.normal(0, 20, (32, 32)), 0, 255)

    # the reference implementation (metrics.py:59-83)
    c1, c2 = (0.01 * 255) ** 2, (0.03 * 255) ** 2
    kernel = cv2.getGaussianKernel(11, 1.5)
    window = np.outer(kernel, kernel.T)
    mu1 = cv2.filter2D(a, -1, window)[5:-5, 5:-5]
    mu2 = cv2.filter2D(b, -1, window)[5:-5, 5:-5]
    s1 = cv2.filter2D(a**2, -1, window)[5:-5, 5:-5] - mu1**2
    s2 = cv2.filter2D(b**2, -1, window)[5:-5, 5:-5] - mu2**2
    s12 = cv2.filter2D(a * b, -1, window)[5:-5, 5:-5] - mu1 * mu2
    ref = (
        ((2 * mu1 * mu2 + c1) * (2 * s12 + c2))
        / ((mu1**2 + mu2**2 + c1) * (s1 + s2 + c2))
    ).mean()
    np.testing.assert_allclose(ssim(a, b), ref, rtol=1e-6)


def test_ssim_color_and_masked():
    rng = np.random.default_rng(2)
    a = rng.uniform(0, 255, (32, 32, 3))
    b = np.clip(a + rng.normal(0, 5, (32, 32, 3)), 0, 255)
    val = ssim(a, b)
    assert 0 < val < 1
    mask = np.ones((32, 32, 3))
    full, vis = ssim(a, b, mask)
    np.testing.assert_allclose(full, vis, rtol=1e-9)
    np.testing.assert_allclose(full, val, rtol=1e-9)

"""Device-resident image quality metrics (jit-safe, NHWC).

Value-parity with the reference's GPU metrics:
  * PSNR  = 10*log10(1 / mse)                (ref utils/common_utils.py:297-305)
  * SSIM  with an 11x11 Gaussian window (sigma=1.5), zero-padded depthwise
    convolutions, C1=0.01^2, C2=0.03^2        (ref utils/common_utils.py:308-353)

Both run inside the jit'd training scan so no host sync is needed per
iteration (the reference paid a .item() host sync per metric per iteration).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def psnr(image_true: jnp.ndarray, image_test: jnp.ndarray) -> jnp.ndarray:
    """PSNR in dB assuming float images with max value 1."""
    err = jnp.mean((image_true.astype(jnp.float32)
                    - image_test.astype(jnp.float32)) ** 2)
    return 10.0 * jnp.log10(1.0 / err)


@functools.lru_cache(maxsize=None)
def _gaussian_window(window_size: int, sigma: float) -> np.ndarray:
    """1D Gaussian kernel matching the reference's construction."""
    g = np.exp(
        -((np.arange(window_size) - window_size // 2) ** 2)
        / float(2 * sigma ** 2)
    )
    g /= g.sum()
    return g.astype(np.float32)


def _depthwise_blur(x: jnp.ndarray, window_2d: jnp.ndarray) -> jnp.ndarray:
    """Zero-padded depthwise 2D convolution, NHWC. Window (kh, kw)."""
    c = x.shape[-1]
    kh, kw = window_2d.shape
    # HWIO with feature_group_count=C -> depthwise.
    kernel = jnp.broadcast_to(window_2d[:, :, None, None], (kh, kw, 1, c))
    return jax.lax.conv_general_dilated(
        x, kernel,
        window_strides=(1, 1),
        padding=((kh // 2, kh // 2), (kw // 2, kw // 2)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )


def ssim(image_true: jnp.ndarray, image_test: jnp.ndarray,
         window_size: int = 11, sigma: float = 1.5) -> jnp.ndarray:
    """Mean SSIM over the image, matching the reference formula exactly
    (including zero-padding border effects)."""
    g = _gaussian_window(window_size, sigma)
    window = jnp.asarray(np.outer(g, g))

    x = image_true.astype(jnp.float32)
    y = image_test.astype(jnp.float32)

    mu1 = _depthwise_blur(x, window)
    mu2 = _depthwise_blur(y, window)

    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2

    sigma1_sq = _depthwise_blur(x * x, window) - mu1_sq
    sigma2_sq = _depthwise_blur(y * y, window) - mu2_sq
    sigma12 = _depthwise_blur(x * y, window) - mu1_mu2

    c1, c2 = 0.01 ** 2, 0.03 ** 2
    ssim_map = ((2 * mu1_mu2 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2)
    )
    return jnp.mean(ssim_map)


def uce(errors: jnp.ndarray, uncert: jnp.ndarray, n_bins: int = 15,
        outlier: float = 0.0, value_range=None):
    """Uncertainty Calibration Error (ref utils/uce.py:9-40 / BayTorch
    inference/losses.py uceloss).

    Bins uncertainty into ``n_bins`` equal-width bins and accumulates
    |mean_error_in_bin - mean_uncert_in_bin| * prop_in_bin over non-empty bins.

    Returns (uce, err_in_bin, avg_uncert_in_bin, prop_in_bin) where the per-bin
    arrays have length n_bins with NaN entries for bins that were skipped
    (the reference returns ragged arrays; fixed-width + NaN is the jit-safe
    equivalent).
    """
    errors = errors.reshape(-1).astype(jnp.float32)
    uncert = uncert.reshape(-1).astype(jnp.float32)

    if value_range is None:
        lo, hi = jnp.min(uncert), jnp.max(uncert)
    else:
        lo, hi = value_range
    bounds = jnp.linspace(lo, hi, n_bins + 1)
    lowers, uppers = bounds[:-1], bounds[1:]

    in_bin = (uncert[None, :] > lowers[:, None]) & (uncert[None, :] <= uppers[:, None])
    in_bin = in_bin.astype(jnp.float32)
    count = jnp.sum(in_bin, axis=1)
    prop = count / uncert.shape[0]

    safe = jnp.maximum(count, 1.0)
    err_in_bin = jnp.sum(in_bin * errors[None, :], axis=1) / safe
    unc_in_bin = jnp.sum(in_bin * uncert[None, :], axis=1) / safe

    keep = prop > outlier
    total = jnp.sum(jnp.where(keep, jnp.abs(unc_in_bin - err_in_bin) * prop, 0.0))

    nan = jnp.float32(jnp.nan)
    err_in_bin = jnp.where(keep, err_in_bin, nan)
    unc_in_bin = jnp.where(keep, unc_in_bin, nan)
    return total, err_in_bin, unc_in_bin, prop

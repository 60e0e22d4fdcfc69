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


@functools.lru_cache(maxsize=None)
def _blur_matrix(size: int, window_size: int, sigma: float) -> np.ndarray:
    """(size, size) banded matrix applying the zero-padded 1-D Gaussian:
    B[i, j] = g[j - i + pad] for |j - i| <= pad. B @ x == conv1d(x, g) with
    zero padding, exactly."""
    g = _gaussian_window(window_size, sigma)
    pad = window_size // 2
    m = np.zeros((size, size), np.float32)
    for off in range(-pad, pad + 1):
        diag = np.full(size - abs(off), g[off + pad], np.float32)
        m += np.diag(diag, k=off)
    return m


def _depthwise_blur(x: jnp.ndarray, window_size: int, sigma: float
                    ) -> jnp.ndarray:
    """Zero-padded separable Gaussian blur, NHWC.

    Implemented as two banded-matrix contractions (MXU) instead of a
    depthwise conv: depthwise 11x11 convs run on the VPU and cost ~6 ms/iter
    at 256^2 across the SSIM triple; the matmul form is exact (the Gaussian
    window is outer(g, g)) and ~10x cheaper."""
    h, w = x.shape[1], x.shape[2]
    bh = jnp.asarray(_blur_matrix(h, window_size, sigma))
    bw = jnp.asarray(_blur_matrix(w, window_size, sigma))
    # HIGHEST precision: TPU f32 matmuls default to single-pass bf16, and the
    # SSIM variances E[x^2] - mu^2 are cancellation-sensitive — with default
    # precision the SSIM map leaves [-1, 1] entirely at 256^2
    hi = jax.lax.Precision.HIGHEST
    x = jnp.einsum("oh,nhwc->nowc", bh, x, precision=hi,
                   preferred_element_type=jnp.float32)
    return jnp.einsum("pw,nhwc->nhpc", bw, x, precision=hi,
                      preferred_element_type=jnp.float32)


def ssim(image_true: jnp.ndarray, image_test: jnp.ndarray,
         window_size: int = 11, sigma: float = 1.5) -> jnp.ndarray:
    """Mean SSIM over the image, matching the reference formula exactly
    (including zero-padding border effects)."""
    x = image_true.astype(jnp.float32)
    y = image_test.astype(jnp.float32)

    # one fused blur over the 5 SSIM moment maps (stacked on channels):
    # a single pair of MXU contractions instead of 5 depthwise convs
    stacked = jnp.concatenate([x, y, x * x, y * y, x * y], axis=-1)
    blurred = _depthwise_blur(stacked, window_size, sigma)
    c = x.shape[-1]
    mu1, mu2, exx, eyy, exy = (blurred[..., i * c:(i + 1) * c]
                               for i in range(5))

    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2

    sigma1_sq = exx - mu1_sq
    sigma2_sq = eyy - mu2_sq
    sigma12 = exy - mu1_mu2

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

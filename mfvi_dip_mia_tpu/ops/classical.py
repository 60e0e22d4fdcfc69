"""Classical (non-deep-learning) baselines, reproducing the reference's
comparison notebooks without skimage:

  * TV denoising (Chambolle 2004 dual projection — what
    skimage.restoration.denoise_tv_chambolle implements);
    compare_denoising.ipynb baseline
  * bilateral filter; compare_denoising.ipynb baseline
  * wavelet (Haar, BayesShrink soft threshold) denoising;
    eval_denoising.ipynb cell 21 baseline
  * bicubic x-factor upscale; compare_super-resolution.ipynb baseline
  * FBP lives in ops/radon.py (compare_ct.ipynb baseline)

All operate on float (C, H, W) numpy arrays in [0, 1] (host-side eval code).
"""

from __future__ import annotations

import numpy as np


def tv_denoise_chambolle(img: np.ndarray, weight: float = 0.1,
                         eps: float = 2e-4, max_iter: int = 200) -> np.ndarray:
    """Chambolle's projection algorithm for the ROF model, per channel."""

    def one(u0):
        p = np.zeros((2,) + u0.shape, u0.dtype)
        u = u0.copy()
        tau = 0.25
        last = None
        for _ in range(max_iter):
            # gradient of divergence(p) - u0/weight
            div = np.zeros_like(u0)
            div[:-1] += p[0, :-1]
            div[1:] -= p[0, :-1]
            div[:, :-1] += p[1, :, :-1]
            div[:, 1:] -= p[1, :, :-1]
            u = u0 - weight * div
            gx = np.zeros_like(u0)
            gy = np.zeros_like(u0)
            gx[:-1] = u[1:] - u[:-1]
            gy[:, :-1] = u[:, 1:] - u[:, :-1]
            norm = np.sqrt(gx ** 2 + gy ** 2)
            denom = 1.0 + (tau / weight) * norm
            p[0] = (p[0] - (tau / weight) * gx) / denom
            p[1] = (p[1] - (tau / weight) * gy) / denom
            change = np.abs(u - last).max() if last is not None else np.inf
            last = u.copy()
            if change < eps:
                break
        return u

    return np.stack([one(c.astype(np.float64)) for c in img]).astype(
        np.float32)


def bilateral_denoise(img: np.ndarray, sigma_spatial: float = 2.0,
                      sigma_color: float = 0.1, radius: int = 5
                      ) -> np.ndarray:
    """Brute-force bilateral filter (vectorized over shifts)."""
    out = []
    for c in img:
        acc = np.zeros_like(c, np.float64)
        norm = np.zeros_like(c, np.float64)
        for dy in range(-radius, radius + 1):
            for dx in range(-radius, radius + 1):
                w_s = np.exp(-(dy * dy + dx * dx)
                             / (2 * sigma_spatial ** 2))
                shifted = np.roll(np.roll(c, dy, 0), dx, 1)
                w_c = np.exp(-((shifted - c) ** 2) / (2 * sigma_color ** 2))
                w = w_s * w_c
                acc += w * shifted
                norm += w
        out.append(acc / norm)
    return np.stack(out).astype(np.float32)


def _haar_2d(x):
    a = (x[0::2, 0::2] + x[0::2, 1::2] + x[1::2, 0::2] + x[1::2, 1::2]) / 2
    h = (x[0::2, 0::2] - x[0::2, 1::2] + x[1::2, 0::2] - x[1::2, 1::2]) / 2
    v = (x[0::2, 0::2] + x[0::2, 1::2] - x[1::2, 0::2] - x[1::2, 1::2]) / 2
    d = (x[0::2, 0::2] - x[0::2, 1::2] - x[1::2, 0::2] + x[1::2, 1::2]) / 2
    return a, (h, v, d)


def _ihaar_2d(a, hvd):
    h, v, d = hvd
    x = np.zeros((a.shape[0] * 2, a.shape[1] * 2), a.dtype)
    x[0::2, 0::2] = (a + h + v + d) / 2
    x[0::2, 1::2] = (a - h + v - d) / 2
    x[1::2, 0::2] = (a + h - v - d) / 2
    x[1::2, 1::2] = (a - h - v + d) / 2
    return x


def wavelet_denoise(img: np.ndarray, levels: int = 3) -> np.ndarray:
    """Haar wavelet soft thresholding with BayesShrink per-subband thresholds
    (the method behind skimage's denoise_wavelet default)."""

    def one(c):
        c = c.astype(np.float64)
        coeffs = []
        a = c
        for _ in range(levels):
            a, hvd = _haar_2d(a)
            coeffs.append(hvd)
        # noise sigma from the finest diagonal subband (MAD estimator)
        d1 = coeffs[0][2]
        sigma = np.median(np.abs(d1)) / 0.67448975
        var_n = sigma ** 2

        def shrink(band):
            var_y = max(np.mean(band ** 2), 1e-12)
            var_x = max(var_y - var_n, 1e-12)
            thresh = var_n / np.sqrt(var_x)
            return np.sign(band) * np.maximum(np.abs(band) - thresh, 0.0)

        for i in range(levels):
            coeffs[i] = tuple(shrink(b) for b in coeffs[i])
        for hvd in reversed(coeffs):
            a = _ihaar_2d(a, hvd)
        return a

    return np.stack([one(c) for c in img]).astype(np.float32)


def bicubic_upscale(img: np.ndarray, factor: int) -> np.ndarray:
    """Bicubic x-factor upscale via PIL (the compare_super-resolution.ipynb
    interpolation baseline)."""
    from PIL import Image
    out = []
    for c in img:
        pil = Image.fromarray((np.clip(c, 0, 1) * 65535).astype(np.uint16))
        up = pil.resize((c.shape[1] * factor, c.shape[0] * factor),
                        Image.BICUBIC)
        out.append(np.asarray(up).astype(np.float32) / 65535.0)
    return np.stack(out)

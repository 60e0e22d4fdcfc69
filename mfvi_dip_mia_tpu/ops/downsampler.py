"""Anti-aliased fixed-kernel downsampler (lanczos / gauss / box) as a
depthwise strided convolution.

Kernel construction matches the reference (models/downsampler.py:74-136)
including its quirks: gauss distances are halved ((i-center)/2), phase=0.5
shrinks the kernel by one, kernels are sum-normalized. ``preserve_size``
replication-pads so stride-f output is exactly input/f.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def get_kernel(factor: int, kernel_type: str, phase: float, kernel_width: int,
               support: int | None = None, sigma: float | None = None
               ) -> np.ndarray:
    assert kernel_type in ("lanczos", "gauss", "box")
    if phase == 0.5 and kernel_type != "box":
        kernel = np.zeros((kernel_width - 1, kernel_width - 1))
    else:
        kernel = np.zeros((kernel_width, kernel_width))

    if kernel_type == "box":
        assert phase == 0.5, "box filter is always half-phased"
        kernel[:] = 1.0 / (kernel_width * kernel_width)
    elif kernel_type == "gauss":
        assert sigma, "sigma is not specified"
        assert phase != 0.5, "phase 1/2 for gauss not implemented"
        center = (kernel_width + 1.0) / 2.0
        sigma_sq = sigma * sigma
        for i in range(1, kernel.shape[0] + 1):
            for j in range(1, kernel.shape[1] + 1):
                di = (i - center) / 2.0
                dj = (j - center) / 2.0
                kernel[i - 1, j - 1] = (
                    np.exp(-(di * di + dj * dj) / (2 * sigma_sq))
                    / (2.0 * np.pi * sigma_sq))
    else:  # lanczos
        assert support, "support is not specified"
        center = (kernel_width + 1) / 2.0
        for i in range(1, kernel.shape[0] + 1):
            for j in range(1, kernel.shape[1] + 1):
                if phase == 0.5:
                    di = abs(i + 0.5 - center) / factor
                    dj = abs(j + 0.5 - center) / factor
                else:
                    di = abs(i - center) / factor
                    dj = abs(j - center) / factor
                val = 1.0
                if di != 0:
                    val *= (support * np.sin(np.pi * di)
                            * np.sin(np.pi * di / support)
                            / (np.pi * np.pi * di * di))
                if dj != 0:
                    val *= (support * np.sin(np.pi * dj)
                            * np.sin(np.pi * dj / support)
                            / (np.pi * np.pi * dj * dj))
                kernel[i - 1, j - 1] = val

    kernel /= kernel.sum()
    return kernel.astype(np.float32)


_PRESETS = {
    "lanczos2": dict(support=2, kernel_type="lanczos",
                     width=lambda f: 4 * f + 1),
    "lanczos3": dict(support=3, kernel_type="lanczos",
                     width=lambda f: 6 * f + 1),
    "gauss12": dict(sigma=0.5, kernel_type="gauss", width=lambda f: 7),
    "gauss1sq2": dict(sigma=1.0 / np.sqrt(2), kernel_type="gauss",
                      width=lambda f: 9),
}


class Downsampler:
    """Fixed anti-aliasing downsampler; call on NHWC input."""

    def __init__(self, n_planes: int, factor: int, kernel_type: str,
                 phase: float = 0.0, kernel_width: int | None = None,
                 support: int | None = None, sigma: float | None = None,
                 preserve_size: bool = False):
        assert phase in (0, 0.5)
        if kernel_type in _PRESETS:
            p = _PRESETS[kernel_type]
            support = p.get("support", support)
            sigma = p.get("sigma", sigma)
            kernel_width = p["width"](factor)
            kernel_type_ = p["kernel_type"]
        elif kernel_type in ("lanczos", "gauss", "box"):
            kernel_type_ = kernel_type
        else:
            raise ValueError(f"wrong kernel name {kernel_type!r}")

        self.kernel = get_kernel(factor, kernel_type_, phase, kernel_width,
                                 support=support, sigma=sigma)
        self.factor = factor
        self.n_planes = n_planes
        self.preserve_size = preserve_size
        k = self.kernel.shape[0]
        if k % 2 == 1:
            self.pad = (k - 1) // 2
        else:
            self.pad = (k - factor) // 2

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        k = self.kernel.shape[0]
        if self.preserve_size and self.pad > 0:
            x = jnp.pad(x, ((0, 0), (self.pad, self.pad),
                            (self.pad, self.pad), (0, 0)), mode="edge")
        kernel = jnp.broadcast_to(
            jnp.asarray(self.kernel)[:, :, None, None], (k, k, 1, c))
        return jax.lax.conv_general_dilated(
            x, kernel, window_strides=(self.factor, self.factor),
            padding="VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c)

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
    """Separable 2-D anti-alias kernel built as an outer product of a 1-D
    profile over the sample grid (every family here is separable). Numerics
    are pinned to the reference table (models/downsampler.py:74-136) by the
    golden test, including its quirks: the gauss profile halves its distances
    and half-phase shrinks the grid by one sample.
    """
    assert kernel_type in ("lanczos", "gauss", "box")

    if kernel_type == "box":
        assert phase == 0.5, "box filter is always half-phased"
        return np.full((kernel_width, kernel_width),
                       1.0 / kernel_width ** 2, dtype=np.float32)

    n = kernel_width - 1 if phase == 0.5 else kernel_width
    center = (kernel_width + 1.0) / 2.0
    grid = np.arange(1, n + 1, dtype=np.float64)

    if kernel_type == "gauss":
        assert sigma, "sigma is not specified"
        assert phase != 0.5, "phase 1/2 for gauss not implemented"
        d = (grid - center) / 2.0
        profile = np.exp(-d * d / (2.0 * sigma * sigma)) \
            / np.sqrt(2.0 * np.pi * sigma * sigma)
    else:  # lanczos: sinc(d) * sinc(d / support), windowed
        assert support, "support is not specified"
        d = np.abs(grid + (0.5 if phase == 0.5 else 0.0) - center) / factor
        with np.errstate(invalid="ignore", divide="ignore"):
            profile = (support * np.sin(np.pi * d) * np.sin(np.pi * d / support)
                       / (np.pi * np.pi * d * d))
        profile[d == 0] = 1.0

    kernel = np.outer(profile, profile)
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

"""Pure functional NN building blocks (NHWC, jit-safe, static shapes).

Each function is semantics-matched to the torch op the reference uses
(models/common.py:15-135, models/skip.py:102) and golden-tested against torch
CPU in tests/test_layers.py:

  * conv2d                 — nn.Conv2d (cross-correlation)
  * batch_norm_train       — nn.BatchNorm2d in train mode with batch=1
                             (live biased batch statistics, eps=1e-5)
  * reflection_pad         — nn.ReflectionPad2d
  * leaky_relu/elu/swish   — activations (LeakyReLU slope 0.2)
  * upsample_nearest/_bilinear — F.interpolate(scale_factor=2, ...) with
                             align_corners=False coordinate mapping
  * resize_bilinear/_nearest — general F.interpolate(scale_factor=s,
                             recompute_scale_factor=False) equivalents used by
                             the SR downsampling operator
  * dropout / dropout2d    — always-on MC dropout (channel masks for 2d)

Resizes are expressed as dense interpolation-matrix matmuls rather than
gathers: on TPU a (out, in) x (in, spatial) matmul rides the MXU, whereas
per-pixel gathers serialize on the VPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# conv / norm / pad
# ---------------------------------------------------------------------------

def conv2d(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray | None = None,
           stride: int = 1, padding: int = 0) -> jnp.ndarray:
    """NHWC conv with HWIO kernel; torch cross-correlation semantics."""
    out = jax.lax.conv_general_dilated(
        x, w,
        window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if b is not None:
        out = out + b
    return out


def conv3d(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray | None = None,
           stride: int = 1, padding: int = 0) -> jnp.ndarray:
    """NDHWC conv with DHWIO kernel (the Conv3d analog; BayTorch ships 3-D
    variational wrappers, BayTorch/modules/conv.py:74-142)."""
    out = jax.lax.conv_general_dilated(
        x, w,
        window_strides=(stride, stride, stride),
        padding=[(padding, padding)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )
    if b is not None:
        out = out + b
    return out


def batch_norm_train(x: jnp.ndarray, scale: jnp.ndarray, offset: jnp.ndarray,
                     eps: float = 1e-5) -> jnp.ndarray:
    """BatchNorm2d in training mode: per-channel stats over (N, H, W) with
    biased variance. The reference never switches the DIP nets to eval mode,
    so live batch statistics are the only semantics we need."""
    # one-pass moments in f32 (sibling reduces fuse into a single read of
    # x; var = E[x^2] - mean^2 is torch's train-mode accumulator form —
    # see nn/cf.py::batch_norm_train for the profile rationale)
    xf = x.astype(jnp.float32)
    # shifted one-pass moments (see nn/cf.py::batch_norm_train): c from a
    # cheap 8-row slice keeps the E[x^2]-mean^2 form cancellation-free
    c = jax.lax.stop_gradient(
        jnp.mean(xf[:, :8], axis=(0, 1, 2), keepdims=True))
    xc = xf - c
    mean_c = jnp.mean(xc, axis=(0, 1, 2), keepdims=True)
    ex2 = jnp.mean(xc * xc, axis=(0, 1, 2), keepdims=True)
    var = jnp.maximum(ex2 - mean_c * mean_c, 0.0)
    mean = c + mean_c
    inv = jax.lax.rsqrt(var + eps)
    scf = scale.astype(jnp.float32)
    a = (inv * scf).astype(x.dtype)
    b = (offset.astype(jnp.float32) - mean * inv * scf).astype(x.dtype)
    return x * a + b


def reflection_pad(x: jnp.ndarray, pad: int) -> jnp.ndarray:
    if pad == 0:
        return x
    return jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")


# ---------------------------------------------------------------------------
# activations
# ---------------------------------------------------------------------------

def leaky_relu(x: jnp.ndarray, negative_slope: float = 0.2) -> jnp.ndarray:
    return jnp.where(x >= 0, x, negative_slope * x)


def elu(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.where(x > 0, x, jnp.expm1(x))


def swish(x: jnp.ndarray) -> jnp.ndarray:
    return x * jax.nn.sigmoid(x)


_ACTIVATIONS = {
    "LeakyReLU": leaky_relu,
    "Swish": swish,
    "ELU": elu,
    "none": lambda x: x,
}


def activation(name: str):
    return _ACTIVATIONS[name]


# ---------------------------------------------------------------------------
# pooling
# ---------------------------------------------------------------------------

def avg_pool(x: jnp.ndarray, k: int) -> jnp.ndarray:
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, k, k, 1), (1, k, k, 1), "VALID") / (k * k)


def max_pool(x: jnp.ndarray, k: int) -> jnp.ndarray:
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, k, k, 1), (1, k, k, 1), "VALID")


# ---------------------------------------------------------------------------
# resizing (torch F.interpolate parity, align_corners=False)
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _bilinear_matrix(in_size: int, out_size: int, scale: float) -> np.ndarray:
    """(out, in) row-stochastic linear interpolation matrix using torch's
    align_corners=False mapping src = (dst + 0.5) / scale - 0.5 with edge
    clamping (recompute_scale_factor=False: uses the *given* scale)."""
    dst = np.arange(out_size, dtype=np.float64)
    src = (dst + 0.5) / scale - 0.5
    src = np.clip(src, 0.0, in_size - 1)
    i0 = np.floor(src).astype(np.int64)
    i1 = np.minimum(i0 + 1, in_size - 1)
    frac = (src - i0).astype(np.float64)
    m = np.zeros((out_size, in_size), dtype=np.float32)
    m[np.arange(out_size), i0] += (1.0 - frac).astype(np.float32)
    m[np.arange(out_size), i1] += frac.astype(np.float32)
    return m


@functools.lru_cache(maxsize=None)
def _nearest_matrix(in_size: int, out_size: int, scale: float) -> np.ndarray:
    """(out, in) 0/1 matrix with torch's legacy 'nearest' mapping
    src = floor(dst / scale)."""
    dst = np.arange(out_size, dtype=np.float64)
    src = np.minimum((dst / scale).astype(np.int64), in_size - 1)
    m = np.zeros((out_size, in_size), dtype=np.float32)
    m[np.arange(out_size), src] = 1.0
    return m


def _resize_with_matrices(x: jnp.ndarray, mh: np.ndarray, mw: np.ndarray
                          ) -> jnp.ndarray:
    mh = jnp.asarray(mh, x.dtype)
    mw = jnp.asarray(mw, x.dtype)
    # HIGHEST: keep f32-true interpolation (TPU matmuls default to bf16
    # passes); these are tiny banded matrices, the cost is negligible
    hi = jax.lax.Precision.HIGHEST
    x = jnp.einsum("oh,nhwc->nowc", mh, x, precision=hi)
    return jnp.einsum("pw,nhwc->nhpc", mw, x, precision=hi)


def resize_bilinear(x: jnp.ndarray, scale: float,
                    out_hw: tuple[int, int] | None = None) -> jnp.ndarray:
    """F.interpolate(x, scale_factor=scale, mode='bilinear',
    align_corners=False, recompute_scale_factor=False) for NHWC input."""
    n, h, w, c = x.shape
    oh, ow = out_hw if out_hw is not None else (int(h * scale), int(w * scale))
    return _resize_with_matrices(
        x, _bilinear_matrix(h, oh, scale), _bilinear_matrix(w, ow, scale))


def resize_nearest(x: jnp.ndarray, scale: float,
                   out_hw: tuple[int, int] | None = None) -> jnp.ndarray:
    """F.interpolate(..., mode='nearest') equivalent for NHWC input."""
    n, h, w, c = x.shape
    oh, ow = out_hw if out_hw is not None else (int(h * scale), int(w * scale))
    if scale == 2.0 and oh == 2 * h and ow == 2 * w:
        # Fast exact path for the U-Net's 2x decode: out[i] = in[i // 2].
        return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
    return _resize_with_matrices(
        x, _nearest_matrix(h, oh, scale), _nearest_matrix(w, ow, scale))


def upsample2x(x: jnp.ndarray, mode: str) -> jnp.ndarray:
    if mode == "nearest":
        return resize_nearest(x, 2.0)
    if mode == "bilinear":
        return resize_bilinear(x, 2.0)
    raise ValueError(f"unknown upsample mode {mode!r}")


# ---------------------------------------------------------------------------
# dropout (MC semantics: applied whenever a key is given)
# ---------------------------------------------------------------------------

def dropout(x: jnp.ndarray, p: float, key) -> jnp.ndarray:
    """Element-wise dropout with 1/(1-p) scaling (F.dropout, training=True)."""
    keep = jax.random.bernoulli(key, 1.0 - p, x.shape)
    return jnp.where(keep, x / (1.0 - p), 0.0)


def dropout2d(x: jnp.ndarray, p: float, key) -> jnp.ndarray:
    """Channel dropout (F.dropout2d): zero whole channels, scale by 1/(1-p)."""
    n, _, _, c = x.shape
    keep = jax.random.bernoulli(key, 1.0 - p, (n, 1, 1, c))
    return jnp.where(keep, x / (1.0 - p), 0.0)


def gen_noise(x: jnp.ndarray, n_channels: int, key) -> jnp.ndarray:
    """Standard-normal noise tensor shaped like x but with ``n_channels``
    (ref models/common.py GenNoise:49-61 — unused by the runners, library
    parity)."""
    shape = (x.shape[0], x.shape[1], x.shape[2], n_channels)
    return jax.random.normal(key, shape, x.dtype)


# ---------------------------------------------------------------------------
# concat with center-crop (ref models/common.py:15-46)
# ---------------------------------------------------------------------------

def concat_center_crop(xs: list[jnp.ndarray]) -> jnp.ndarray:
    """Concat along channels, center-cropping all inputs to the minimum
    spatial size (shapes are static so the crop resolves at trace time)."""
    th = min(x.shape[1] for x in xs)
    tw = min(x.shape[2] for x in xs)
    cropped = []
    for x in xs:
        dh = (x.shape[1] - th) // 2
        dw = (x.shape[2] - tw) // 2
        cropped.append(x[:, dh:dh + th, dw:dw + tw, :])
    return jnp.concatenate(cropped, axis=-1)

"""Channels-first (NCHW) building blocks for the high-resolution U-Net
levels — the layout-robust half of the compute path.

Why this exists (round-3 profiling, scripts/profile_step.py): the moment a
tpu_custom_call (the banded Radon Pallas kernel) is present in a module, XLA's
layout assignment stops giving small-channel NHWC activations the
spatial-on-lanes {1,3,2,0:T(8,128)} layout and falls back to
channels-on-lanes {3,0,2,1:T(1,128)} — for C=16 that pads every lane vector
8x, which inflates the L0/L1 elementwise/BatchNorm/reduction fusions (65% of
the training-step cycles) by 3-4x. No kernel-interface shape fixes the flip
(operand padding and identity layout anchors were tried — see
ops/pallas/radon_banded.py). The durable fix is to carry the hot activations
in NCHW logical form: a (1, C, H, W) row-major tensor has W on lanes and H on
sublanes — fully dense under EITHER heuristic mode — so every elementwise op,
BatchNorm statistic, and pad around the convs runs at full memory bandwidth.

Semantics are bit-for-bit the NHWC path's (same torch-parity formulas,
tests/test_cf.py pins equality); only the memory layout changes.

Reference semantics: models/common.py:100-135 (conv sites), nn.BatchNorm2d
train mode, F.interpolate bilinear/nearest.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from . import layers


def to_cf(x_nhwc: jnp.ndarray) -> jnp.ndarray:
    """(N, H, W, C) -> (N, C, H, W)."""
    return x_nhwc.transpose(0, 3, 1, 2)


def from_cf(x_nchw: jnp.ndarray) -> jnp.ndarray:
    """(N, C, H, W) -> (N, H, W, C)."""
    return x_nchw.transpose(0, 2, 3, 1)


def conv2d(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray | None = None,
           stride: int = 1, padding: int = 0) -> jnp.ndarray:
    """NCHW conv with the same HWIO kernel tensor as layers.conv2d (the
    pytree layout is shared between both paths)."""
    out = jax.lax.conv_general_dilated(
        x, w,
        window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        dimension_numbers=("NCHW", "HWIO", "NCHW"),
    )
    if b is not None:
        out = out + b[None, :, None, None]
    return out


def batch_norm_train(x: jnp.ndarray, scale: jnp.ndarray, offset: jnp.ndarray,
                     eps: float = 1e-5) -> jnp.ndarray:
    """BatchNorm2d train mode on NCHW (biased batch stats over N, H, W).

    One-pass moments: E[x] and E[x^2] are sibling reduces XLA fuses into a
    single read of x (the (x-mean)^2 form costs a third full HBM pass —
    round-5 profile: BN lines were 26% of the while-body's modeled cycles).
    var = E[x^2] - mean^2 in f32 accumulators is torch's own train-mode
    accumulator form; the normalization collapses to one multiply-add with
    per-channel a = inv*scale, b = offset - mean*inv*scale."""
    xf = x.astype(jnp.float32)
    # per-channel shift from a cheap 8-row slice: E[(x-c)^2] - E[x-c]^2 is
    # exact algebra for any c, and c ~= mean kills the f32 cancellation the
    # raw E[x^2] - mean^2 form suffers under large channel means (the
    # bias-before-BN identity test drives |mean| ~ 50)
    c = jax.lax.stop_gradient(
        jnp.mean(xf[:, :, :8, :], axis=(0, 2, 3), keepdims=True))
    xc = xf - c
    mean_c = jnp.mean(xc, axis=(0, 2, 3), keepdims=True)
    ex2 = jnp.mean(xc * xc, axis=(0, 2, 3), keepdims=True)
    var = jnp.maximum(ex2 - mean_c * mean_c, 0.0)
    mean = c + mean_c
    inv = jax.lax.rsqrt(var + eps)
    sc = scale[None, :, None, None].astype(jnp.float32)
    a = (inv * sc).astype(x.dtype)
    b = (offset[None, :, None, None].astype(jnp.float32)
         - mean * inv * sc).astype(x.dtype)
    return x * a + b


def reflection_pad(x: jnp.ndarray, pad: int) -> jnp.ndarray:
    if pad == 0:
        return x
    return jnp.pad(x, ((0, 0), (0, 0), (pad, pad), (pad, pad)),
                   mode="reflect")


def avg_pool(x: jnp.ndarray, k: int) -> jnp.ndarray:
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 1, k, k), (1, 1, k, k), "VALID") / (k * k)


def max_pool(x: jnp.ndarray, k: int) -> jnp.ndarray:
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 1, k, k), (1, 1, k, k), "VALID")


def _resize_with_matrices(x: jnp.ndarray, mh: np.ndarray, mw: np.ndarray
                          ) -> jnp.ndarray:
    mh = jnp.asarray(mh, x.dtype)
    mw = jnp.asarray(mw, x.dtype)
    hi = jax.lax.Precision.HIGHEST
    x = jnp.einsum("oh,nchw->ncow", mh, x, precision=hi)
    return jnp.einsum("pw,nchw->nchp", mw, x, precision=hi)


def resize_bilinear(x: jnp.ndarray, scale: float,
                    out_hw: tuple[int, int] | None = None) -> jnp.ndarray:
    n, c, h, w = x.shape
    oh, ow = out_hw if out_hw is not None else (int(h * scale), int(w * scale))
    return _resize_with_matrices(
        x, layers._bilinear_matrix(h, oh, scale),
        layers._bilinear_matrix(w, ow, scale))


def resize_nearest(x: jnp.ndarray, scale: float,
                   out_hw: tuple[int, int] | None = None) -> jnp.ndarray:
    n, c, h, w = x.shape
    oh, ow = out_hw if out_hw is not None else (int(h * scale), int(w * scale))
    if scale == 2.0 and oh == 2 * h and ow == 2 * w:
        return jnp.repeat(jnp.repeat(x, 2, axis=2), 2, axis=3)
    return _resize_with_matrices(
        x, layers._nearest_matrix(h, oh, scale),
        layers._nearest_matrix(w, ow, scale))


def upsample2x(x: jnp.ndarray, mode: str) -> jnp.ndarray:
    if mode == "nearest":
        return resize_nearest(x, 2.0)
    if mode == "bilinear":
        return resize_bilinear(x, 2.0)
    raise ValueError(f"unknown upsample mode {mode!r}")


def dropout(x: jnp.ndarray, p: float, key) -> jnp.ndarray:
    """Element-wise dropout. NOTE: the mask is drawn in NHWC index order and
    transposed so the CF and NHWC paths are sample-for-sample identical."""
    n, c, h, w = x.shape
    keep = jax.random.bernoulli(key, 1.0 - p, (n, h, w, c))
    return jnp.where(keep.transpose(0, 3, 1, 2), x / (1.0 - p), 0.0)


def dropout2d(x: jnp.ndarray, p: float, key) -> jnp.ndarray:
    """Channel dropout; mask shape matches the NHWC path's (N,1,1,C) draw."""
    n, c, h, w = x.shape
    keep = jax.random.bernoulli(key, 1.0 - p, (n, 1, 1, c))
    return jnp.where(keep.transpose(0, 3, 1, 2), x / (1.0 - p), 0.0)


def concat_center_crop(xs: list[jnp.ndarray]) -> jnp.ndarray:
    th = min(x.shape[2] for x in xs)
    tw = min(x.shape[3] for x in xs)
    cropped = []
    for x in xs:
        dh = (x.shape[2] - th) // 2
        dw = (x.shape[3] - tw) // 2
        cropped.append(x[:, :, dh:dh + th, dw:dw + tw])
    return jnp.concatenate(cropped, axis=1)


# -- variational conv-leaf application (CF twin of nn/var_conv.py) ----------

def _conv_hot(x, w, b, stride, padding, pad_mode="zero"):
    """Conv dispatch for the CF path: the pallas valid kernel when the shape
    qualifies (it removes the conv op from XLA's layout assignment — see
    ops/pallas/cf_conv.py), else the XLA NCHW conv. Toggle off with
    MFVI_DIP_PALLAS_CF=0 for A/B runs. ``pad_mode='reflection'`` applies
    torch ReflectionPad2d semantics inside the conv (the pallas path merges
    it with the alignment pad into ONE materialization)."""
    import os
    if os.environ.get("MFVI_DIP_PALLAS_CF", "1") != "0":
        from ..ops.pallas.cf_conv import conv2d_cf_pallas
        return conv2d_cf_pallas(x, w, b, stride, padding, pad_mode=pad_mode)
    if padding and pad_mode == "reflection":
        x = reflection_pad(x, padding)
        padding = 0
    return conv2d(x, w, b, stride, padding)


def apply_conv_leaf_cf(leaf, x, *, stride: int, padding: int, key=None,
                       training: bool = True, reparam: str = "rt",
                       skip_bias: bool = False,
                       pad_mode: str = "zero") -> jnp.ndarray:
    """NCHW version of var_conv.apply_conv_leaf for 4-D kernels. For RT the
    PRNG consumption (kw, kb split; eps drawn in kernel HWIO shape) is
    identical to the NHWC path, so both paths produce the same samples. For
    LRT the activation-space eps is drawn in NCHW index order — statistically
    equivalent but not sample-for-sample identical to the NHWC path."""
    from .var_conv import is_variational_leaf

    if not is_variational_leaf(leaf):
        return _conv_hot(x, leaf["w"], None if skip_bias else leaf.get("b"),
                         stride, padding, pad_mode)

    w_mu, w_rho = leaf["w_mu"], leaf["w_rho"]
    b_mu = None if (skip_bias and reparam != "lrt") else leaf.get("b_mu")
    b_rho = leaf.get("b_rho")

    if not training:
        return _conv_hot(x, w_mu, b_mu, stride, padding, pad_mode)
    if key is None:
        raise ValueError("variational conv needs a PRNG key when training")

    if reparam == "lrt":
        # reflect(x)^2 == reflect(x^2) pointwise, so the same pad_mode is
        # correct for the variance conv
        act_mu = _conv_hot(x, w_mu, b_mu, stride, padding, pad_mode)
        act_var = _conv_hot(x * x, jax.nn.softplus(w_rho) ** 2, None,
                            stride, padding, pad_mode)
        if b_rho is not None:
            act_var = act_var + (jax.nn.softplus(b_rho) ** 2)[None, :, None,
                                                              None]
        eps = jax.random.normal(key, act_mu.shape, act_mu.dtype)
        return act_mu + jnp.sqrt(1e-16 + act_var) * eps

    kw, kb = jax.random.split(key)
    w = w_mu + jax.nn.softplus(w_rho) * jax.random.normal(kw, w_mu.shape,
                                                          w_mu.dtype)
    b = None
    if b_mu is not None:
        b = b_mu + jax.nn.softplus(b_rho) * jax.random.normal(kb, b_mu.shape,
                                                              b_mu.dtype)
    return _conv_hot(x, w, b, stride, padding, pad_mode)

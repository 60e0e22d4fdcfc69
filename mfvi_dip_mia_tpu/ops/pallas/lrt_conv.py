"""Local-reparameterization (LRT) variational convolution.

The LRT forward computes TWO convolutions over the same input patches
(ref BayTorch/modules/reparam_layers.py:58-72):
    act_mu  = conv(x,  W_mu) + b_mu
    act_var = conv(x^2, softplus(W_rho)^2) + softplus(b_rho)^2
    out     = act_mu + sqrt(act_var + 1e-16) * eps

``lrt_conv`` is the dispatch point: the default path expresses both convs as
ONE ``lax.conv_general_dilated`` by stacking [x, x^2] on the batch axis and
[W_mu, W_sigma^2] on the output-feature axis is NOT valid (different inputs
per kernel) — instead we stack on the *input feature* axis with block-diagonal
weights, which XLA fuses into a single MXU pass; see ``_fused_double_conv``.
With MFVI_DIP_PALLAS_LRT=1 the fused Pallas kernel
(``lrt_conv_pallas.lrt_double_conv_pallas``) takes the stride-1 conv sites
instead — one input stream, two zero-waste MXU contractions; shapes it does
not support (stride 2, 3-D) keep the XLA path automatically.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from ...nn import layers


def _fused_double_conv(x, w_mu, w_var, stride, padding):
    """One conv producing [conv(x, w_mu), conv(x^2, w_var)] stacked on the
    output channel axis: inputs stacked on channels, weights block-diagonal.

    in:  x (N,H,W,C) -> xx (N,H,W,2C);  w (kh,kw,2C,2O) block diagonal
    out: (N,H',W',2O) -> split
    """
    kh, kw, c, o = w_mu.shape
    xx = jnp.concatenate([x, x * x], axis=-1)
    zeros = jnp.zeros_like(w_mu)
    w_top = jnp.concatenate([w_mu, zeros], axis=-1)      # (kh,kw,C,2O)
    w_bot = jnp.concatenate([zeros, w_var], axis=-1)
    w = jnp.concatenate([w_top, w_bot], axis=2)          # (kh,kw,2C,2O)
    out = layers.conv2d(xx, w, None, stride, padding)
    return out[..., :o], out[..., o:]


def lrt_conv(x, w_mu, w_rho, b_mu, b_rho, stride: int, padding: int, key):
    """LRT sampled convolution (training mode)."""
    w_sigma2 = jax.nn.softplus(w_rho) ** 2
    use_pallas = os.environ.get("MFVI_DIP_PALLAS_LRT") == "1"
    if use_pallas:
        from . import lrt_conv_pallas as lp
        use_pallas = lp.supported(x, w_mu, stride, padding)
    if use_pallas:
        act_mu, act_var = lp.lrt_double_conv_pallas(x, w_mu, w_sigma2,
                                                    stride, padding)
    else:
        act_mu, act_var = _fused_double_conv(x, w_mu, w_sigma2, stride,
                                             padding)
    if b_mu is not None:
        act_mu = act_mu + b_mu
        act_var = act_var + jax.nn.softplus(b_rho) ** 2
    act_std = jnp.sqrt(1e-16 + act_var)
    eps = jax.random.normal(key, act_mu.shape, act_mu.dtype)
    return act_mu + act_std * eps

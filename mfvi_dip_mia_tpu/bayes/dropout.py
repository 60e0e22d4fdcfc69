"""MC-dropout as a network transform (BayTorch MCDropoutVI /
modules/dropout.py parity, functional form).

In this framework MC dropout is normally a *builder* config (SkipNet
dropout_mode_* flags, always-on when a key is supplied). This module provides
the wrapper equivalent for arbitrary apply functions plus the Gaussian-dropout
variants (multiplicative-noise moment matching via the fused double conv).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..nn import layers
from ..ops.pallas.lrt_conv import _fused_double_conv


def mc_dropout_apply(apply_fn, p: float = 0.5, mode: str = "2d"):
    """Wrap an apply(params, x, key=..., **kw) with always-on output dropout
    (the MCDropoutVI idea applied at the function boundary)."""

    def wrapped(params, x, key=None, **kwargs):
        out = apply_fn(params, x, key=key, **kwargs)
        if key is None:
            return out
        dkey = jax.random.fold_in(key, 0xD0)
        if mode == "2d":
            return layers.dropout2d(out, p, dkey)
        return layers.dropout(out, p, dkey)

    return wrapped


def gaussian_dropout_conv(x, w, p: float, key, stride: int = 1,
                          padding: int = 0, bias=None):
    """Gaussian dropout for a conv layer (ref BayTorch/modules/dropout.py:
    13-19): out = conv(x, w) + sqrt(p/(1-p) * conv(x^2, w^2)) * eps.
    Uses the fused double conv (one MXU pass)."""
    mu, second = _fused_double_conv(x, w, w * w, stride, padding)
    if bias is not None:
        mu = mu + bias
    sigma = jnp.sqrt(jnp.maximum(p / (1.0 - p) * second, 0.0))
    eps = jax.random.normal(key, mu.shape, mu.dtype)
    return mu + sigma * eps


def gaussian_dropout_dense(x, w, p: float, key):
    """Dense variant (ref dropout.py:21-26)."""
    mu = x @ w
    sigma = jnp.sqrt(jnp.maximum(p / (1.0 - p) * ((x * x) @ (w * w)), 0.0))
    eps = jax.random.normal(key, mu.shape, mu.dtype)
    return mu + sigma * eps

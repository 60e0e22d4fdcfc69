"""Reconstruction losses (jit-safe).

Parity targets:
  * gaussian_nll          — ref utils/bayesian_utils.py:29-32
  * gaussian_nll_masked   — ref utils/bayesian_utils.py:35-39
  * NLLLoss2d variant     — ref BayTorch/inference/losses.py:4-28

The (mu, neg_logvar) convention follows the reference: the network's second
output channel is the *negative* log variance, so
    loss = exp(neg_logvar) * (target - mu)^2 - neg_logvar
with neg_logvar clamped to [-20, 20] to prevent NaNs at extreme posterior
temperatures.
"""

from __future__ import annotations

import jax.numpy as jnp


def gaussian_nll(mu: jnp.ndarray, neg_logvar: jnp.ndarray,
                 target: jnp.ndarray, reduction: str = "mean") -> jnp.ndarray:
    """Heteroscedastic Gaussian NLL with the precision parameterization."""
    neg_logvar = jnp.clip(neg_logvar, -20.0, 20.0)
    loss = jnp.exp(neg_logvar) * (target - mu) ** 2 - neg_logvar
    return jnp.mean(loss) if reduction == "mean" else jnp.sum(loss)


def gaussian_nll_masked(mu: jnp.ndarray, neg_logvar: jnp.ndarray,
                        target: jnp.ndarray, mask: jnp.ndarray,
                        reduction: str = "mean") -> jnp.ndarray:
    """Masked NLL for inpainting. NOTE (parity): like the reference, the mean
    is taken over *all* pixels, not only unmasked ones."""
    neg_logvar = jnp.clip(neg_logvar, -20.0, 20.0)
    loss = (jnp.exp(neg_logvar) * (target - mu) ** 2 - neg_logvar) * mask
    return jnp.mean(loss) if reduction == "mean" else jnp.sum(loss)


def mse_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((pred - target) ** 2)


def tv_loss(x: jnp.ndarray, beta: float = 0.5) -> jnp.ndarray:
    """Total-variation loss (ref utils/sr_utils.py tv_loss, NHWC input):
    sum((dh^2 + dw^2)^beta) over valid pixels."""
    dh = (x[:, 1:, :, :] - x[:, :-1, :, :]) ** 2
    dw = (x[:, :, 1:, :] - x[:, :, :-1, :]) ** 2
    return jnp.sum((dh[:, :, :-1, :] + dw[:, :-1, :, :]) ** beta)


def nll_loss_2d(out: jnp.ndarray, target: jnp.ndarray,
                eps: float = 1e-6, reduction: str = "mean") -> jnp.ndarray:
    """BayTorch NLLLoss2d equivalent: network outputs (mu, logvar) stacked on
    the channel axis (NHWC); loss = 0.5*(exp(-logvar)*(t-mu)^2 + logvar)
    (ref BayTorch/inference/losses.py:4-28)."""
    c = out.shape[-1] // 2
    mu, logvar = out[..., :c], out[..., c:]
    prec = jnp.exp(-logvar)
    loss = 0.5 * (prec * (target - mu) ** 2 + logvar)
    return jnp.mean(loss) if reduction == "mean" else jnp.sum(loss)

"""Conv-leaf application: deterministic / RT / LRT variational sampling.

Lives in ``nn`` (not ``bayes``) to keep the import graph acyclic: the U-Net
apply dispatches on the leaf's pytree keys at trace time, so one network
serves every inference mode. Sampling semantics parity:
RT — BayTorch/modules/reparam_layers.py:26-37; LRT — :58-72.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import layers


def is_conv_leaf(node) -> bool:
    return isinstance(node, dict) and ("w" in node or "w_mu" in node)


def is_variational_leaf(node) -> bool:
    return isinstance(node, dict) and "w_mu" in node


def apply_conv_leaf(leaf, x, *, stride: int, padding: int, key=None,
                    training: bool = True, reparam: str = "rt") -> jnp.ndarray:
    """Apply one conv site given its parameter leaf.

    * deterministic leaf {'w','b'} -> plain conv
    * variational leaf, reparam='rt'  -> sample W = mu + softplus(rho)*eps per
      forward
    * variational leaf, reparam='lrt' -> local reparameterization: sample in
      activation space with std = sqrt(conv(x^2, sigma^2) + bias_var + 1e-16)
    * eval mode (training=False) -> posterior mean weights
    """
    if not is_variational_leaf(leaf):
        return layers.conv2d(x, leaf["w"], leaf.get("b"), stride, padding)

    w_mu, w_rho = leaf["w_mu"], leaf["w_rho"]
    b_mu = leaf.get("b_mu")
    b_rho = leaf.get("b_rho")

    if not training:
        return layers.conv2d(x, w_mu, b_mu, stride, padding)
    if key is None:
        raise ValueError("variational conv needs a PRNG key when training")

    if reparam == "lrt":
        from ..ops.pallas.lrt_conv import lrt_conv  # fused path w/ fallback
        return lrt_conv(x, w_mu, w_rho, b_mu, b_rho, stride, padding, key)

    # RT: weight-space sampling.
    kw, kb = jax.random.split(key)
    w = w_mu + jax.nn.softplus(w_rho) * jax.random.normal(kw, w_mu.shape,
                                                          w_mu.dtype)
    b = None
    if b_mu is not None:
        b = b_mu + jax.nn.softplus(b_rho) * jax.random.normal(kb, b_mu.shape,
                                                              b_mu.dtype)
    return layers.conv2d(x, w, b, stride, padding)

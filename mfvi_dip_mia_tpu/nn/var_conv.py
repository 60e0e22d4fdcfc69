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


def sample_rt_kernel(leaf, key, training: bool) -> jnp.ndarray:
    """Materialize the conv kernel an RT (or deterministic) site would use,
    consuming the PRNG stream exactly like ``apply_conv_leaf`` with
    ``skip_bias=True`` (kw/kb split, bias normal never drawn). Lets fused
    conv(+BN+act) kernels take a plain HWIO tensor while staying
    sample-for-sample identical to the unfused path."""
    if not is_variational_leaf(leaf):
        return leaf["w"]
    if not training:
        return leaf["w_mu"]
    if key is None:
        raise ValueError("variational conv needs a PRNG key when training")
    kw, _ = jax.random.split(key)
    w_mu, w_rho = leaf["w_mu"], leaf["w_rho"]
    return w_mu + jax.nn.softplus(w_rho) * jax.random.normal(
        kw, w_mu.shape, w_mu.dtype)


def apply_conv_leaf(leaf, x, *, stride: int, padding: int, key=None,
                    training: bool = True, reparam: str = "rt",
                    skip_bias: bool = False) -> jnp.ndarray:
    """Apply one conv site given its parameter leaf.

    * deterministic leaf {'w','b'} -> plain conv
    * variational leaf, reparam='rt'  -> sample W = mu + softplus(rho)*eps per
      forward
    * variational leaf, reparam='lrt' -> local reparameterization: sample in
      activation space with std = sqrt(conv(x^2, sigma^2) + bias_var + 1e-16)
    * eval mode (training=False) -> posterior mean weights

    Kernels may be 4-D (HWIO, 2-D conv) or 5-D (DHWIO, 3-D conv — the
    Conv3dRT/LRT analog).

    ``skip_bias=True`` elides the bias add (and, for RT, the bias sample).
    Callers set it when the site feeds train-mode BatchNorm directly: a
    per-channel constant is removed exactly by the mean subtraction (and for
    RT the sampled bias is constant over (N, H, W) too), so the output is
    identical to float rounding while the backward drops one full-map
    reduction per site — the reference computes the same gradients as exact
    zeros (torch Conv2d bias -> BatchNorm2d train mode). The bias leaves
    still exist and still receive their KL / weight-decay updates. Not valid
    for LRT (bias *variance* feeds per-pixel activation noise, which BN does
    not remove); callers gate on reparam.
    """
    def _conv(x_, w_, b_):
        if w_.ndim == 5:
            return layers.conv3d(x_, w_, b_, stride, padding)
        return layers.conv2d(x_, w_, b_, stride, padding)

    if not is_variational_leaf(leaf):
        return _conv(x, leaf["w"], None if skip_bias else leaf.get("b"))

    w_mu, w_rho = leaf["w_mu"], leaf["w_rho"]
    b_mu = None if (skip_bias and reparam != "lrt") else leaf.get("b_mu")
    b_rho = leaf.get("b_rho")

    if not training:
        return _conv(x, w_mu, b_mu)
    if key is None:
        raise ValueError("variational conv needs a PRNG key when training")

    if reparam == "lrt":
        if w_mu.ndim == 5:  # 3-D LRT: two explicit convs (Conv3dLRT parity)
            act_mu = _conv(x, w_mu, b_mu)
            act_var = _conv(x * x, jax.nn.softplus(w_rho) ** 2, None)
            if b_rho is not None:
                act_var = act_var + jax.nn.softplus(b_rho) ** 2
            eps = jax.random.normal(key, act_mu.shape, act_mu.dtype)
            return act_mu + jnp.sqrt(1e-16 + act_var) * eps
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
    return _conv(x, w, b)

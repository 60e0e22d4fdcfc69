"""Mean-field VI as a pytree transform (the TPU-native replacement for the
reference's module-graph surgery in BayTorch/freq_to_bayes.py:7-89).

Instead of recursively swapping nn.Conv2d modules for `Conv2dRT` objects, a
deterministic parameter pytree is *transformed*: every conv leaf
``{'w': HWIO, 'b': (C,)}`` becomes ``{'w_mu', 'w_rho', 'b_mu', 'b_rho'}``
(re-initialized exactly like BayTorch/modules/module.py:56-62 — mu ~ N(0,0.1),
rho ~ N(-3,0.1)). The network apply function recognizes variational leaves at
trace time (pytree structure is static under jit), so one apply serves all
inference modes with zero dispatch overhead.

KL semantics (parity with BayTorch/modules/module.py:64-80): the default
``kl_type='reverse'`` computes KL(prior || posterior) in closed form and sums
over all weight *and bias* elements; the prior scale gets the reference's
+1e-6 stabilizer (module.py:38) — at POTOBIM's extreme temperatures
(sqrt(temp)*sigma ~ 1e-12) this floor dominates and is load-bearing.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..nn import init as init_lib
from ..nn.var_conv import (apply_conv_leaf, is_conv_leaf,  # noqa: F401
                           is_variational_leaf)

PRIOR_SIGMA_STABILIZER = 1e-6  # ref BayTorch/modules/module.py:38


def _map_conv_leaves(tree, fn, key):
    """Recursively map conv leaves (dicts containing 'w'/'w_mu'), splitting the
    PRNG key once per leaf (deterministic order)."""
    counter = [0]

    def rec(node):
        if is_conv_leaf(node):
            k = jax.random.fold_in(key, counter[0])
            counter[0] += 1
            return fn(node, k)
        if isinstance(node, dict):
            return {name: rec(child) for name, child in node.items()}
        if isinstance(node, (list, tuple)):
            return type(node)(rec(child) for child in node)
        return node

    return rec(tree)


def to_mfvi(params, key, posterior_mu_init=(0.0, 0.1),
            posterior_rho_init=(-3.0, 0.1)):
    """Replace every conv leaf with variational (mu, rho) parameters."""

    def transform(leaf, k):
        k1, k2, k3, k4 = jax.random.split(k, 4)
        w = leaf["w"]
        new = {
            "w_mu": init_lib.normal(k1, w.shape, *posterior_mu_init, w.dtype),
            "w_rho": init_lib.normal(k2, w.shape, *posterior_rho_init, w.dtype),
        }
        if leaf.get("b") is not None:
            b = leaf["b"]
            new["b_mu"] = init_lib.normal(k3, b.shape, *posterior_mu_init, b.dtype)
            new["b_rho"] = init_lib.normal(k4, b.shape, *posterior_rho_init, b.dtype)
        return new

    return _map_conv_leaves(params, transform, key)


def posterior_mean_params(params):
    """Collapse a variational pytree to its posterior mean (eval-mode weights,
    ref BayTorch/modules/reparam_layers.py:33-35)."""

    def collapse(leaf, _k):
        if not is_variational_leaf(leaf):
            return leaf
        out = {"w": leaf["w_mu"]}
        out["b"] = leaf.get("b_mu")
        return out

    return _map_conv_leaves(params, collapse, jax.random.PRNGKey(0))


# ---------------------------------------------------------------------------
# KL divergence (closed form Normal-Normal, tree-reduced)
# ---------------------------------------------------------------------------

def _kl_normal_normal(mu_p, sigma_p, mu_q, sigma_q):
    """Elementwise KL(N(mu_p, sigma_p) || N(mu_q, sigma_q))."""
    log_ratio = jnp.log(sigma_q) - jnp.log(sigma_p)
    return (log_ratio
            + (sigma_p ** 2 + (mu_p - mu_q) ** 2) / (2.0 * sigma_q ** 2)
            - 0.5)


def kl_mfvi(params, prior_mu: float = 0.0, prior_sigma: float = 0.1,
            kl_type: str = "reverse") -> jnp.ndarray:
    """Sum of per-element KL over all variational leaves.

    kl_type='reverse' (the reference default, BayTorch/modules/module.py:76-80)
    computes KL(prior || posterior); 'forward' computes KL(posterior || prior).
    """
    sigma_pr = prior_sigma + PRIOR_SIGMA_STABILIZER
    leaves = []

    def collect(node):
        if is_variational_leaf(node):
            leaves.append((node["w_mu"], node["w_rho"]))
            if node.get("b_mu") is not None:
                leaves.append((node["b_mu"], node["b_rho"]))
            return
        if isinstance(node, dict):
            for child in node.values():
                collect(child)
        elif isinstance(node, (list, tuple)):
            for child in node:
                collect(child)

    collect(params)

    total = jnp.float32(0.0)
    for mu, rho in leaves:
        sigma_post = jax.nn.softplus(rho)
        if kl_type == "reverse":
            kl = _kl_normal_normal(prior_mu, sigma_pr, mu, sigma_post)
        else:
            kl = _kl_normal_normal(mu, sigma_post, prior_mu, sigma_pr)
        total = total + jnp.sum(kl)
    return total

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


def sample_mfvi_tree(params, key, out_dtype=None):
    """One fused RT draw for the WHOLE parameter tree.

    ``out_dtype`` (e.g. bfloat16) casts the sampled flat vector ONCE inside
    the draw fusion — the mixed-precision path then avoids a separate
    per-leaf f32->bf16 convert for every variational mu/rho leaf (~2 ops
    per conv site in the scanned step's HLO), and softplus(rho) runs at
    full f32 before the cast.

    Replaces every variational leaf with a sampled deterministic leaf
    ``{'w': mu + softplus(rho) * eps, 'b': ...}`` so ``apply()`` runs its
    deterministic conv path. Collapses the per-site sampling chains
    (split + normal + softplus + mul + add, ~2 x n_sites tiny loop fusions
    inside the scanned training step — the HLO cycle profile that motivated
    ``optax.flatten``, see tasks/trainer.py::_build_optimizer) into ONE
    normal draw and ONE elementwise fusion over the concatenated parameter
    vector, plus free reshape/slice views back to leaf shapes.

    Marginally identical to per-site RT sampling (BayTorch/modules/
    reparam_layers.py:26-37 — every element is mu + softplus(rho) * eps with
    iid standard-normal eps); only the PRNG stream *assignment* differs from
    apply()'s per-site kw/kb stream, which no reference semantics depend on
    (torch's global RNG stream differs run-to-run anyway).
    Non-variational trees pass through unchanged.
    """
    pairs = _collect_variational(params)
    if not pairs:
        return params
    sizes = [m.size for m, _ in pairs]
    mu = jnp.concatenate([m.reshape(-1) for m, _ in pairs])
    rho = jnp.concatenate([r.reshape(-1) for _, r in pairs])
    eps = jax.random.normal(key, mu.shape, mu.dtype)
    flat = mu + jax.nn.softplus(rho) * eps
    if out_dtype is not None:
        flat = flat.astype(out_dtype)

    offs = [0]
    for s in sizes:
        offs.append(offs[-1] + s)
    chunks = iter(jax.lax.slice(flat, (offs[i],), (offs[i + 1],))
                  for i in range(len(sizes)))

    def transform(leaf, _k):
        if not is_variational_leaf(leaf):
            return leaf
        out = {"w": next(chunks).reshape(leaf["w_mu"].shape)}
        out["b"] = (next(chunks).reshape(leaf["b_mu"].shape)
                    if leaf.get("b_mu") is not None else None)
        return out

    return _map_conv_leaves(params, transform, jax.random.PRNGKey(0))


# ---------------------------------------------------------------------------
# KL divergence (closed form Normal-Normal, tree-reduced)
# ---------------------------------------------------------------------------

def _kl_normal_normal(mu_p, sigma_p, mu_q, sigma_q):
    """Elementwise KL(N(mu_p, sigma_p) || N(mu_q, sigma_q))."""
    log_ratio = jnp.log(sigma_q) - jnp.log(sigma_p)
    return (log_ratio
            + (sigma_p ** 2 + (mu_p - mu_q) ** 2) / (2.0 * sigma_q ** 2)
            - 0.5)


def _collect_variational(params):
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
    return leaves


def kl_mfvi(params, prior_mu: float = 0.0, prior_sigma: float = 0.1,
            kl_type: str = "reverse") -> jnp.ndarray:
    """Sum of per-element KL over all variational leaves.

    kl_type='reverse' (the reference default, BayTorch/modules/module.py:76-80)
    computes KL(prior || posterior); 'forward' computes KL(posterior || prior).
    """
    sigma_pr = prior_sigma + PRIOR_SIGMA_STABILIZER
    leaves = _collect_variational(params)
    if not leaves:
        return jnp.float32(0.0)

    # one fused computation over the concatenated parameter plane instead of
    # ~2 x n_leaves tiny per-leaf fusions (the formula is elementwise and the
    # reduction order only reorders an fp sum)
    mu = jnp.concatenate([m.reshape(-1) for m, _ in leaves])
    sigma_post = jax.nn.softplus(
        jnp.concatenate([r.reshape(-1) for _, r in leaves]))
    if kl_type == "reverse":
        kl = _kl_normal_normal(prior_mu, sigma_pr, mu, sigma_post)
    else:
        kl = _kl_normal_normal(mu, sigma_post, prior_mu, sigma_pr)
    return jnp.sum(kl)


# ---------------------------------------------------------------------------
# Scale-mixture prior: MC KL (no closed form)
# ---------------------------------------------------------------------------

_LOG_SQRT_2PI = 0.9189385332046727


def _normal_lp(x, loc, scale):
    return (-((x - loc) ** 2) / (2.0 * scale ** 2)
            - jnp.log(scale) - _LOG_SQRT_2PI)


def _mixture_lp(x, loc, scale, pi):
    """log sum_k pi_k N(x; loc_k, scale_k); loc/scale/pi are (K,) traced
    arrays so BO candidates over mixture priors share one compiled graph."""
    lp = _normal_lp(x[..., None], loc, scale) + jnp.log(pi)
    return jax.scipy.special.logsumexp(lp, axis=-1)


def _mixture_sample(key, shape, loc, scale, pi):
    kc, kn = jax.random.split(key)
    comp = jax.random.categorical(kc, jnp.log(pi), shape=shape)
    return loc[comp] + scale[comp] * jax.random.normal(kn, shape)


def kl_mfvi_mc(params, key, prior_loc, prior_scale, prior_pi,
               kl_type: str = "reverse", n_samples: int = 1) -> jnp.ndarray:
    """MC estimate of the summed KL against a scale-mixture Normal prior.

    The reference wires ``mc_kl_divergence`` into ``_kl`` whenever the prior
    dict carries ``pi`` (BayTorch/modules/module.py:32-35, 66-75) — reverse
    KL samples from the PRIOR and scores prior-minus-posterior, forward
    samples from the posterior. ``prior_scale`` is expected pre-stabilized
    (+1e-6, module.py:34). One sample per weight element per step (the
    corrected sampler — the reference's MixtureNormal.rsample quirk is not
    reproduced; see bayes/priors.py)."""
    loc = jnp.asarray(prior_loc, jnp.float32)
    scale = jnp.asarray(prior_scale, jnp.float32)
    pi = jnp.asarray(prior_pi, jnp.float32)
    leaves = _collect_variational(params)

    total = jnp.float32(0.0)
    for i, (mu, rho) in enumerate(leaves):
        sigma_post = jax.nn.softplus(rho)
        for s_idx in range(n_samples):
            k = jax.random.fold_in(jax.random.fold_in(key, i), s_idx)
            if kl_type == "reverse":
                s = _mixture_sample(k, mu.shape, loc, scale, pi)
                kl = _mixture_lp(s, loc, scale, pi) - _normal_lp(
                    s, mu, sigma_post)
            else:
                s = mu + sigma_post * jax.random.normal(k, mu.shape)
                kl = _normal_lp(s, mu, sigma_post) - _mixture_lp(
                    s, loc, scale, pi)
            total = total + jnp.sum(kl) / n_samples
    return total

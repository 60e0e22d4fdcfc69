"""Flat AdamW with the MFVI KL gradient fused in analytically.

Why: the production training step spends ~0.6 ms of its ~3 ms on
(a) ``optax.flatten(inject_hyperparams(adamw))`` — whose wrapper layers
fragment the elementwise update into a dozen+ passes over the ~2M-element
parameter vector — and (b) the *autodiff* of the closed-form Normal-Normal
KL (bayes/vi.py::kl_mfvi), which replays concatenate/softplus/log chains
backward through the whole tree. Both are elementwise math over the same
flat (mu, rho) vectors, so this module does the entire thing in one
hand-fused chain:

    g_mu  += temp * dKL/dmu        (analytic, see below)
    g_rho += temp * dKL/drho
    m, v, update = AdamW(g)        (bitwise-identical formulas to optax.adamw)

For the reference's reverse KL (BayTorch/modules/module.py:76-80, the
runner default), with prior N(0, sigma_p) and posterior N(mu, sigma_q),
sigma_q = softplus(rho), sigma_p = prior_sigma + 1e-6:

    KL(p||q)    = log sigma_q - log sigma_p
                  + (sigma_p^2 + mu^2) / (2 sigma_q^2) - 1/2
    dKL/dmu     = mu / sigma_q^2
    dKL/dsigma  = 1/sigma_q - (sigma_p^2 + mu^2) / sigma_q^3
    dKL/drho    = dKL/dsigma * sigmoid(rho)

The trainer keeps computing the KL *value* for the logged loss (one cheap
forward fusion) under ``lax.stop_gradient``; only its backward pass is
replaced. Scale-mixture priors (kl_mfvi_mc) keep the autodiff path — the
trainer sets kl_temp=0 there so this transform reduces to plain AdamW.

Layout: parameters flatten (tree_flatten_with_path order) into three
concatenated segments [mu | rho | det] classified by the leaf key suffix
(``w_mu``/``b_mu`` -> mu, ``*_rho`` -> rho, everything else — BatchNorm
affine, deterministic nets — det). mu and rho segments align elementwise
because every variational leaf carries both (bayes/vi.py::to_mfvi).

Equivalence with the optax path is pinned by tests/test_fused_adamw.py.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

PRIOR_SIGMA_STABILIZER = 1e-6  # keep in sync with bayes/vi.py (ref module.py:38)


class FlatAdamWState(NamedTuple):
    count: jnp.ndarray  # int32 step counter (optax semantics: incremented first)
    m: jnp.ndarray      # first moment, flat over [mu | rho | det]
    v: jnp.ndarray      # second moment, same layout


def _classify(path_leaves):
    """Indices of mu / rho / det leaves in tree_flatten_with_path order."""
    idx_mu, idx_rho, idx_det = [], [], []
    for i, (path, _leaf) in enumerate(path_leaves):
        key = getattr(path[-1], "key", None) if path else None
        if isinstance(key, str) and key.endswith("_mu"):
            idx_mu.append(i)
        elif isinstance(key, str) and key.endswith("_rho"):
            idx_rho.append(i)
        else:
            idx_det.append(i)
    return idx_mu, idx_rho, idx_det


def _concat(leaves, idxs, dtype):
    if not idxs:
        return jnp.zeros((0,), dtype)
    return jnp.concatenate([leaves[i].reshape(-1) for i in idxs])


def flat_adamw(learning_rate, weight_decay=0.0, kl_temp=0.0,
               kl_prior_sigma=0.1, *, use_kl=False,
               b1=0.9, b2=0.999, eps=1e-8) -> optax.GradientTransformation:
    """One-pass flat AdamW(+analytic reverse-KL) over the whole tree.

    Numerically identical to ``optax.flatten(optax.adamw(...))`` applied to
    gradients that already include ``kl_temp * d(kl_mfvi)/dparams`` — the
    update formula is elementwise, so segment reordering is value-neutral.
    Wrap with ``optax.inject_hyperparams(flat_adamw,
    static_args=("use_kl", "b1", "b2", "eps"))`` to trace
    learning_rate / weight_decay / kl_temp / kl_prior_sigma.
    """

    def init(params):
        path_leaves, _ = jax.tree_util.tree_flatten_with_path(params)
        idx_mu, idx_rho, idx_det = _classify(path_leaves)
        leaves = [l for _, l in path_leaves]
        dtype = leaves[0].dtype if leaves else jnp.float32
        n = sum(int(leaves[i].size) for i in idx_mu + idx_rho + idx_det)
        return FlatAdamWState(count=jnp.zeros((), jnp.int32),
                              m=jnp.zeros((n,), dtype),
                              v=jnp.zeros((n,), dtype))

    def update(updates, state, params=None):
        if params is None:
            raise ValueError("flat_adamw requires params (weight decay / KL)")
        gp_leaves, treedef = jax.tree_util.tree_flatten_with_path(updates)
        pp_leaves, _ = jax.tree_util.tree_flatten_with_path(params)
        idx_mu, idx_rho, idx_det = _classify(pp_leaves)
        for i_m, i_r in zip(idx_mu, idx_rho):
            assert pp_leaves[i_m][1].shape == pp_leaves[i_r][1].shape, (
                "unpaired variational leaf", pp_leaves[i_m][0])

        g_leaves = [l for _, l in gp_leaves]
        p_leaves = [l for _, l in pp_leaves]
        dtype = p_leaves[0].dtype
        g_mu = _concat(g_leaves, idx_mu, dtype)
        g_rho = _concat(g_leaves, idx_rho, dtype)
        g_det = _concat(g_leaves, idx_det, dtype)
        p_mu = _concat(p_leaves, idx_mu, dtype)
        p_rho = _concat(p_leaves, idx_rho, dtype)
        p_det = _concat(p_leaves, idx_det, dtype)

        if use_kl and idx_mu:
            sig = jax.nn.softplus(p_rho)
            sp = kl_prior_sigma + PRIOR_SIGMA_STABILIZER
            g_mu = g_mu + kl_temp * (p_mu / (sig * sig))
            dkl_dsig = 1.0 / sig - (sp * sp + p_mu * p_mu) / (sig * sig * sig)
            g_rho = g_rho + kl_temp * dkl_dsig * jax.nn.sigmoid(p_rho)

        g = jnp.concatenate([g_mu, g_rho, g_det])
        p = jnp.concatenate([p_mu, p_rho, p_det])

        c = optax.safe_increment(state.count)
        m = b1 * state.m + (1.0 - b1) * g
        v = b2 * state.v + (1.0 - b2) * (g * g)
        # optax.bias_correction: 1 - decay**count, count cast to moment dtype
        cf = c.astype(m.dtype)
        m_hat = m / (1.0 - jnp.asarray(b1, m.dtype) ** cf)
        v_hat = v / (1.0 - jnp.asarray(b2, v.dtype) ** cf)
        upd = -learning_rate * (m_hat / (jnp.sqrt(v_hat) + eps)
                                + weight_decay * p)

        # scatter the flat update back to leaf views in [mu | rho | det] order
        out = [None] * len(p_leaves)
        off = 0
        for i in idx_mu + idx_rho + idx_det:
            leaf = p_leaves[i]
            out[i] = jax.lax.slice(upd, (off,), (off + leaf.size,)).reshape(
                leaf.shape)
            off += leaf.size
        return (jax.tree_util.tree_unflatten(treedef, out),
                FlatAdamWState(count=c, m=m, v=v))

    return optax.GradientTransformation(init, update)

"""Predictive uncertainty: vmapped MC posterior sampling and decomposition.

The reference approximates epistemic uncertainty with a 25-deep ring buffer of
*training* iterates (bayesian_optimization.py:515-517,601,618) and aleatoric
uncertainty as the mean exp(-neg_logvar) channel. Its library also offers a
proper MC predictor (BayTorch/inference/utils.py:11-37, utils/bayesian_utils.py
:7-26).

TPU-native: `mc_predict` vmaps the forward pass over MC sample keys, batching
all samples through the MXU at once — this is the "MC posterior samples/sec"
north-star axis (BASELINE.json). Decomposition follows Gal's regression form:
  epistemic = Var_samples[mu],  aleatoric = E_samples[exp(-neg_logvar)].
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp


def mc_predict(apply_fn, params, x, key, n_samples: int, batched: bool = False,
               **apply_kwargs):
    """Draw ``n_samples`` stochastic forwards inside one jit.

    apply_fn(params, x, key=..., **apply_kwargs) -> NHWC output.
    Returns stacked outputs with a leading sample axis (S, N, H, W, C).

    Default is ``lax.map`` (sequential-in-graph): vmapping over *weight*
    samples turns every conv into a grouped conv, which is ~7x slower on TPU
    (measured 899 vs 122 samples/s at 256^2); XLA pipelines the mapped
    iterations anyway. Set ``batched=True`` to force vmap (e.g. tiny nets).

    RT variational trees are pre-sampled per key with the fused whole-tree
    draw (vi.sample_mfvi_tree — same per-leaf marginals, one fusion instead
    of ~2 x n_sites); the key still reaches apply_fn for dropout. A/B gate
    MFVI_DIP_FLAT_SAMPLE=0; LRT must sample in activation space per site.
    """
    keys = jax.random.split(key, n_samples)
    flat = (apply_kwargs.get("reparam", "rt") == "rt"
            and apply_kwargs.get("training", True)
            and os.environ.get("MFVI_DIP_FLAT_SAMPLE", "1") != "0")

    def one(k):
        if flat:
            from .vi import sample_mfvi_tree
            return apply_fn(sample_mfvi_tree(params, k), x, key=k,
                            **apply_kwargs)
        return apply_fn(params, x, key=k, **apply_kwargs)

    if batched:
        return jax.vmap(one)(keys)
    return jax.lax.map(one, keys)


def uncert_regression_gal(outputs: jnp.ndarray, mean_channels: int = 1):
    """Decompose stacked MC outputs (S, N, H, W, C) into
    (mean, aleatoric, epistemic) maps. Channels [0:mean_channels] are mu,
    the rest is neg_logvar (ref BayTorch/inference/utils.py:11-24)."""
    mu = outputs[..., :mean_channels]
    mean = jnp.mean(mu, axis=0)
    epistemic = jnp.var(mu, axis=0)
    if outputs.shape[-1] > mean_channels:
        neg_logvar = outputs[..., mean_channels:]
        aleatoric = jnp.mean(jnp.exp(-neg_logvar), axis=0)
    else:
        aleatoric = jnp.zeros_like(epistemic)
    return mean, aleatoric, epistemic


def uncert_classification_kwon(probs: jnp.ndarray):
    """Kwon et al. decomposition for stacked MC class probabilities
    (S, N, K, ...): aleatoric = E[p - p^2], epistemic = E[(p - E p)^2]
    (ref BayTorch/inference/utils.py:27-37)."""
    p_mean = jnp.mean(probs, axis=0)
    aleatoric = jnp.mean(probs - probs ** 2, axis=0)
    epistemic = jnp.mean((probs - p_mean[None]) ** 2, axis=0)
    return p_mean, aleatoric, epistemic


def snr(mu: jnp.ndarray, rho: jnp.ndarray) -> jnp.ndarray:
    """Per-weight signal-to-noise ratio |mu| / softplus(rho)
    (ref BayTorch/inference/utils.py:62-105)."""
    return jnp.abs(mu) / jax.nn.softplus(rho)


def prune_mask_by_snr(params, amount: float):
    """Global SNR-based pruning masks for a variational pytree: zero the
    lowest-SNR fraction ``amount`` of weights (ref L1UnstructuredFFG,
    BayTorch/inference/utils.py:62-135). Returns a pytree of 0/1 masks with
    the same conv-leaf structure ('w' entries only)."""
    from .vi import is_variational_leaf

    snrs = []

    def collect(node):
        if is_variational_leaf(node):
            snrs.append(snr(node["w_mu"], node["w_rho"]).reshape(-1))
        elif isinstance(node, dict):
            for v in node.values():
                collect(v)
        elif isinstance(node, (list, tuple)):
            for v in node:
                collect(v)

    collect(params)
    if not snrs:
        raise ValueError("no variational leaves to prune")
    all_snr = jnp.concatenate(snrs)
    k = int(amount * all_snr.shape[0])
    thresh = jnp.sort(all_snr)[jnp.maximum(k - 1, 0)] if k > 0 else -jnp.inf

    def build(node):
        if is_variational_leaf(node):
            return {"w": (snr(node["w_mu"], node["w_rho"]) > thresh
                          ).astype(jnp.float32)}
        if isinstance(node, dict):
            return {k2: build(v) for k2, v in node.items()}
        if isinstance(node, (list, tuple)):
            return type(node)(build(v) for v in node)
        return node

    return build(params)


def get_beta(beta_type, epoch: int | None = None, num_epochs: int | None = None,
             batch_idx: int = 0, m: int = 1):
    """KL warm-up schedules (ref BayTorch/inference/utils.py:44-60):
    'Blundell' 2^(M-i)/(2^M-1), 'Soenderby' min(epoch/(n//4), 1), 'Standard'
    1/M, else constant beta."""
    if beta_type == "Blundell":
        # Overflow-free equivalent of 2^(M-i)/(2^M-1): the naive form
        # computes 2.0**(m - i) which hits f32 inf for m - i >= 128 when
        # batch_idx is traced (realistic: 391 batches/epoch) and raises
        # OverflowError untraced for m > 1024. 2^(-i)/(1 - 2^(-M)) keeps
        # every exponent small and merely underflows to 0 for late batches.
        return 2.0 ** (-(batch_idx + 1.0)) / (1.0 - 2.0 ** (-float(m)))
    if beta_type == "Soenderby":
        if epoch is None or num_epochs is None:
            raise ValueError("Soenderby schedule needs epoch/num_epochs")
        return min(epoch / (num_epochs // 4), 1.0)
    if beta_type == "Standard":
        return 1.0 / m
    return beta_type

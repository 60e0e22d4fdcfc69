"""Acquisition functions + candidate search.

Parity with the reference (bayesian_optimization.py:3603-3684):
  * EI (maximization form, no xi): imp = mu - max(mu(X_train));
    ei = sigma * (pdf(u) + u * cdf(u)), clamped at 0
  * UCB with kappa = 2
  * find_candidates: evaluate acq on the 100x100 normalized grid ->
    local peaks (min_distance=5, threshold_rel=0.1, up to 4) + the global
    max -> refine each by L-BFGS (strong-Wolfe line search) on the
    sigmoid-unconstrained coordinates -> up to 4 candidates.

The peak finder reimplements skimage.feature.peak_local_max's behavior for
this use case via scipy.ndimage.maximum_filter (skimage is not a dependency).
L-BFGS runs through scipy.optimize.minimize with JAX gradients in float64 —
host-side, the surface is 2-D and tiny.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from scipy import ndimage
from scipy.optimize import minimize

from .gp import _on_host


def expected_improvement(gp, x_query, x_train):
    with jax.enable_x64(), _on_host():
        mu, var = gp.predict(x_query)
        sigma = jnp.sqrt(jnp.maximum(var, 1e-9))
        mu_train, _ = gp.predict(x_train)
        imp = mu - jnp.max(mu_train)
        u = imp / sigma
        ucdf = jax.scipy.stats.norm.cdf(u)
        updf = jax.scipy.stats.norm.pdf(u)
        ei = sigma * (updf + u * ucdf)
        return jnp.maximum(ei, 0.0)


def upper_confidence_bound(gp, x_query, kappa: float = 2.0):
    with jax.enable_x64(), _on_host():
        mu, var = gp.predict(x_query)
        return mu + kappa * jnp.sqrt(var)


def acquisition_fun(gp, x_query, x_train, acq_fn: str = "ei", *args):
    if acq_fn == "ei":
        return expected_improvement(gp, x_query, x_train)
    if acq_fn == "ucb":
        return upper_confidence_bound(gp, x_query, *args)
    raise ValueError(acq_fn)


def peak_local_max(image: np.ndarray, min_distance: int = 5,
                   threshold_rel: float = 0.1, num_peaks: int = 4
                   ) -> np.ndarray:
    """skimage.feature.peak_local_max-compatible local maxima (indices sorted
    by descending intensity), with min_distance border exclusion."""
    size = 2 * min_distance + 1
    maxf = ndimage.maximum_filter(image, size=size, mode="constant",
                                  cval=-np.inf)
    thresh = threshold_rel * image.max()
    mask = (image == maxf) & (image > thresh)
    if min_distance > 0:
        border = np.zeros_like(mask)
        border[min_distance:-min_distance, min_distance:-min_distance] = True
        mask &= border
    coords = np.argwhere(mask)
    if len(coords) == 0:
        return coords.reshape(0, 2)
    order = np.argsort(image[tuple(coords.T)])[::-1]
    return coords[order][:num_peaks]


def find_candidates(gp, x_grid, x_train, acq_fn: str = "ei",
                    grid_shape=(100, 100), max_candidates: int = 4):
    """Grid acq -> peaks -> L-BFGS refinement (ref :3649-3684).

    Returns (candidates [k, 2] in [0,1]^2 normalized space,
             expected improvements [k], acq surface flattened)."""
    with jax.enable_x64(), _on_host():
        x_grid64 = jnp.asarray(np.asarray(x_grid), jnp.float64)
        x_train64 = jnp.asarray(np.asarray(x_train), jnp.float64)
        acq = np.asarray(acquisition_fun(gp, x_grid64, x_train64, acq_fn))

        acq_img = acq.reshape(grid_shape)
        peaks = peak_local_max(acq_img, min_distance=5, threshold_rel=0.1,
                               num_peaks=4)
        gmax = np.array(np.unravel_index(np.argmax(acq_img), grid_shape)
                        ).reshape(1, -1)
        peaks = np.unique(np.append(peaks, gmax, axis=0), axis=0)
        flat_idx = np.ravel_multi_index(peaks.T, grid_shape)
        x_init = np.asarray(x_grid)[flat_idx]

        def neg_acq_unconstrained(u):
            x = jax.nn.sigmoid(u).reshape(1, -1)
            return -acquisition_fun(gp, x, x_train64, acq_fn)[0]

        val_grad = jax.jit(jax.value_and_grad(neg_acq_unconstrained))

        candidates, eis = [], []
        for xi in x_init[:max_candidates]:
            xi = np.clip(xi, 1e-6, 1 - 1e-6)
            u0 = np.log(xi / (1.0 - xi))  # sigmoid^-1

            def f(u):
                v, g = val_grad(jnp.asarray(u, jnp.float64))
                return float(v), np.asarray(g, np.float64)

            res = minimize(f, u0, jac=True, method="L-BFGS-B")
            x_star = 1.0 / (1.0 + np.exp(-res.x))
            ei = float(acquisition_fun(
                gp, jnp.asarray(x_star.reshape(1, -1), jnp.float64),
                x_train64, acq_fn)[0])
            candidates.append(x_star)
            eis.append(ei)

        # Post-refinement dedup: when several acq peaks L-BFGS-converge to the
        # same optimum we evaluate it once (the reference re-evaluates
        # duplicates, bayesian_optimization.py:3666-3684 — documented
        # deviation, PARITY.md). np.unique sorts AND drops rows, so the ei
        # list must be re-indexed to stay aligned with its candidate.
        candidates, keep = np.unique(np.stack(candidates), axis=0,
                                     return_index=True)
        eis = [eis[i] for i in keep]
        return candidates, eis, acq

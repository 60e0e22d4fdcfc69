"""Hand-rolled exact Gaussian process in JAX (float64) — the gpytorch-free
surrogate for the BO loop.

Model parity with the reference's ExactGPModel + GaussianLikelihood
(bayesian_optimization.py:3547-3600):
  * mean: learned constant with a Normal(15, 4) prior
  * kernel: outputscale * RBF(lengthscale), lengthscale init 0.3,
    raw params through softplus (gpytorch's default positive constraint)
  * noise: 1e-4 + softplus(raw) (gpytorch GreaterThan(1e-4) default) with a
    Gamma(0.01, 100) prior
  * loss: -(log marginal likelihood + sum of prior log-probs) / n, optimized
    with Adam(lr=0.05) for 2000 iterations — exactly the reference recipe.

Float64 via jax.experimental.enable_x64 inside this module only (the DIP
training path stays f32/bf16).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

_LOG_2PI = float(np.log(2.0 * np.pi))
JITTER = 1e-8


def host_cpu():
    """The host CPU device for GP/acquisition compute.

    The GP is a tiny f64 problem (n <= ~100 observations): on the remote
    TPU relay every one of its thousands of eager dispatches is an HTTP
    round-trip (measured 146 s for one train_gp + 58 s per find_candidates
    per BO round — dwarfing the actual fits), and TPUs have no native f64
    anyway. Pinning to the host CPU backend makes it milliseconds and keeps
    the gpytorch-parity float64 semantics exact. Returns None when no CPU
    device exists (then placement is left to the default backend)."""
    try:
        return jax.devices("cpu")[0]
    except RuntimeError:
        return None


class _on_host:
    """Context: jax.default_device(host_cpu()) when available, else no-op."""

    def __init__(self):
        self._cm = None

    def __enter__(self):
        dev = host_cpu()
        if dev is not None:
            self._cm = jax.default_device(dev)
            self._cm.__enter__()
        return self

    def __exit__(self, *exc):
        if self._cm is not None:
            return self._cm.__exit__(*exc)
        return False


class GPParams(NamedTuple):
    raw_lengthscale: jnp.ndarray
    raw_outputscale: jnp.ndarray
    raw_noise: jnp.ndarray
    mean_const: jnp.ndarray


def _softplus(x):
    return jnp.logaddexp(x, 0.0)


def _inv_softplus(y):
    return np.log(np.expm1(y))


def lengthscale(p: GPParams):
    return _softplus(p.raw_lengthscale)


def outputscale(p: GPParams):
    return _softplus(p.raw_outputscale)


def noise(p: GPParams):
    return 1e-4 + _softplus(p.raw_noise)


def _rbf(x1, x2, ls):
    d2 = jnp.sum((x1[:, None, :] - x2[None, :, :]) ** 2, axis=-1)
    return jnp.exp(-0.5 * d2 / (ls ** 2))


def _kernel(p: GPParams, x1, x2):
    return outputscale(p) * _rbf(x1, x2, lengthscale(p))


def _neg_mll(p: GPParams, x, y):
    assert x.dtype == jnp.float64 and y.dtype == jnp.float64, (
        f"GP must run in float64, got {x.dtype}/{y.dtype}")
    n = x.shape[0]
    k = _kernel(p, x, x) + (noise(p) + JITTER) * jnp.eye(n, dtype=x.dtype)
    chol = jnp.linalg.cholesky(k)
    resid = y - p.mean_const
    alpha = jax.scipy.linalg.cho_solve((chol, True), resid)
    mll = (-0.5 * resid @ alpha
           - jnp.sum(jnp.log(jnp.diagonal(chol)))
           - 0.5 * n * _LOG_2PI)
    # gpytorch adds prior log-probs before dividing by n (_add_other_terms)
    mean_prior = -0.5 * ((p.mean_const - 15.0) / 4.0) ** 2 \
        - jnp.log(4.0) - 0.5 * _LOG_2PI
    # Gamma(concentration=0.01, rate=100): logp = a*log(b) - lgamma(a)
    #   + (a-1)*log(x) - b*x
    nz = noise(p)
    noise_prior = (0.01 * jnp.log(100.0) - jax.scipy.special.gammaln(0.01)
                   + (0.01 - 1.0) * jnp.log(nz) - 100.0 * nz)
    return -(mll + mean_prior + noise_prior) / n


@dataclasses.dataclass
class ExactGP:
    """Fitted GP: posterior mean / latent variance at query points."""
    params: GPParams
    x_train: jnp.ndarray
    y_train: jnp.ndarray
    chol: jnp.ndarray
    alpha: jnp.ndarray

    def predict(self, x_query):
        """Latent-f posterior (no observation noise), matching the
        reference's use of gp(X) in eval mode. Accepts numpy or jnp input;
        runs in float64 on the host CPU (see host_cpu)."""
        with jax.enable_x64(), _on_host():
            if isinstance(x_query, jax.Array):  # incl. tracers (jit-safe)
                x_query = x_query.astype(jnp.float64)
            else:
                x_query = jnp.asarray(np.asarray(x_query), jnp.float64)
            return self._predict_x64(x_query)

    def _predict_x64(self, x_query):
        assert x_query.dtype == jnp.float64, (
            f"GP predict must run in float64, got {x_query.dtype}")
        p = self.params
        k_star = _kernel(p, x_query, self.x_train)
        mean = p.mean_const + k_star @ self.alpha
        v = jax.scipy.linalg.solve_triangular(self.chol, k_star.T, lower=True)
        var = outputscale(p) - jnp.sum(v * v, axis=0)
        return mean, jnp.maximum(var, 0.0)

    @property
    def hyperparams(self):
        # host-side numpy so f64 params never touch jnp outside enable_x64
        # (jnp softplus on an f64 array would warn + truncate to f32)
        p = self.params
        return {"lengthscale": float(np.logaddexp(np.float64(p.raw_lengthscale), 0.0)),
                "outputscale": float(np.logaddexp(np.float64(p.raw_outputscale), 0.0)),
                "noise": float(1e-4 + np.logaddexp(np.float64(p.raw_noise), 0.0)),
                "mean": float(p.mean_const)}


def train_gp(x_train, y_train, iter_max: int = 2000, lr: float = 0.05,
             verbose: bool = False) -> ExactGP:
    """Fit hyperparameters by Adam on the exact MLL (reference recipe).

    The whole Adam loop runs as ONE jitted lax.scan dispatch on the host
    CPU (see host_cpu): identical update sequence to the eager loop, but
    no per-step dispatch (the verbose path keeps the eager loop for its
    per-iteration prints)."""
    with jax.enable_x64(), _on_host():
        x = jnp.asarray(np.asarray(x_train), jnp.float64)
        y = jnp.asarray(np.asarray(y_train), jnp.float64)

        p = GPParams(
            raw_lengthscale=jnp.asarray(_inv_softplus(0.3), jnp.float64),
            raw_outputscale=jnp.asarray(0.0, jnp.float64),
            raw_noise=jnp.asarray(0.0, jnp.float64),
            mean_const=jnp.asarray(0.0, jnp.float64),
        )
        opt = optax.adam(lr)
        opt_state = opt.init(p)

        def step(carry, _):
            p, opt_state = carry
            loss, g = jax.value_and_grad(_neg_mll)(p, x, y)
            updates, opt_state = opt.update(g, opt_state)
            return (optax.apply_updates(p, updates), opt_state), loss

        if verbose:
            for i in range(iter_max):
                (p, opt_state), loss = step((p, opt_state), None)
                if i % 100 == 0:
                    print(f"GP iter {i + 1:4d}/{iter_max} - "
                          f"loss {float(loss):.4f} "
                          f"lengthscale {float(lengthscale(p)):.3f} "
                          f"noise {float(noise(p)):.4f}")
        else:
            scan = jax.jit(lambda c: jax.lax.scan(step, c, None,
                                                  length=iter_max)[0])
            p, opt_state = scan((p, opt_state))

        n = x.shape[0]
        k = _kernel(p, x, x) + (noise(p) + JITTER) * jnp.eye(n, dtype=jnp.float64)
        chol = jnp.linalg.cholesky(k)
        alpha = jax.scipy.linalg.cho_solve((chol, True), y - p.mean_const)
        return ExactGP(params=p, x_train=x, y_train=y, chol=chol, alpha=alpha)

"""Weight priors: Normal and scale-mixture Normal, with MC KL fallback.

Parity targets: BayTorch/distributions/distributions.py:6-35 (MixtureNormal,
mc_kl_divergence). The closed-form Normal-Normal KL lives in bayes/vi.py; the
mixture prior has no closed form, so the reference falls back to a 1-sample MC
estimate — reproduced here with explicit PRNG keys.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

_LOG_SQRT_2PI = 0.9189385332046727  # log(sqrt(2*pi))


def normal_log_prob(x, loc, scale):
    return (-((x - loc) ** 2) / (2.0 * scale ** 2)
            - jnp.log(scale) - _LOG_SQRT_2PI)


@dataclasses.dataclass(frozen=True)
class NormalPrior:
    loc: float = 0.0
    scale: float = 0.1

    def log_prob(self, x):
        return normal_log_prob(x, self.loc, self.scale)

    def sample(self, key, shape):
        return self.loc + self.scale * jax.random.normal(key, shape)


@dataclasses.dataclass(frozen=True)
class MixtureNormalPrior:
    """Scale mixture of Normals (Blundell et al.); pi are mixture weights."""
    loc: tuple
    scale: tuple
    pi: tuple

    def log_prob(self, x):
        pdf = 0.0
        for loc, scale, pi in zip(self.loc, self.scale, self.pi):
            pdf = pdf + pi * jnp.exp(normal_log_prob(x, loc, scale))
        return jnp.log(pdf)

    def sample(self, key, shape):
        kc, kn = jax.random.split(key)
        comp = jax.random.categorical(
            kc, jnp.log(jnp.asarray(self.pi)), shape=shape)
        loc = jnp.asarray(self.loc)[comp]
        scale = jnp.asarray(self.scale)[comp]
        return loc + scale * jax.random.normal(kn, shape)


def mc_kl_divergence(key, p, q, shape, n_samples: int = 1):
    """1-sample-per-default MC estimate of KL(p || q)
    (ref BayTorch/distributions/distributions.py:30-35, with a correct
    sampler — the reference's MixtureNormal.rsample is a known quirk)."""
    total = 0.0
    for i in range(n_samples):
        s = p.sample(jax.random.fold_in(key, i), shape)
        total = total + (p.log_prob(s) - q.log_prob(s))
    return total / n_samples


def make_prior(spec: dict):
    """Build a prior from the reference's dict schema
    ({'mu', 'sigma'} or {'mu', 'sigma', 'pi'}); sigma gets the +1e-6
    stabilizer (ref BayTorch/modules/module.py:34,38)."""
    if "pi" in spec:
        sigma = tuple(s + 1e-6 for s in spec["sigma"])
        return MixtureNormalPrior(tuple(spec["mu"]), sigma, tuple(spec["pi"]))
    return NormalPrior(spec["mu"], spec["sigma"] + 1e-6)

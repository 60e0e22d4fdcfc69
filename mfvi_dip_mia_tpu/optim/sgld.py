"""SGLD-family optimizers as optax gradient transformations.

Three variants, mirroring what the reference *ships* and what it *uses*:

  * ``sgld``  — library SGLD (ref BayTorch/optimizer/sgld.py:12-58):
      p <- p - lr * 0.5 * (g + wd*p) + lr * N(0, 1)
    NOTE (documented reference quirk, replicated): the Langevin noise scale is
    ``lr``, not ``sqrt(lr)`` (sgld.py:50 multiplies by group['lr']).

  * ``psgld`` — RMSProp-preconditioned SGLD (ref sgld.py:60-172; the original
    has its methods accidentally dedented to module level — fixed here):
      V <- V + (1-alpha)(g^2 - V);  P = 1/sqrt(V + eps)
      p <- p - lr * (0.5*P*g*N_batches + N(0,1)*sigma*sqrt(P)),
      sigma = 1/sqrt(lr) after burn-in else 0.

  * the "as-used" paper variant (ref bayesian_optimization.py:166-170,979-984):
    AdamW + per-step Gaussian *parameter* noise sigma = 2*lr on all rank-4
    (conv kernel) leaves, with ExponentialLR(gamma) floored at 1e-8 — exposed
    as ``add_param_noise`` + ``exponential_decay_floored``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


class SGLDState(NamedTuple):
    key: jax.Array


def sgld(lr: float, weight_decay: float = 0.0, addnoise: bool = True,
         seed: int = 0) -> optax.GradientTransformation:
    def init_fn(params):
        del params
        return SGLDState(key=jax.random.PRNGKey(seed))

    def update_fn(updates, state, params=None):
        if weight_decay != 0.0:
            if params is None:
                raise ValueError("weight_decay needs params")
            updates = jax.tree.map(lambda g, p: g + weight_decay * p,
                                   updates, params)
        if not addnoise:
            new = jax.tree.map(lambda g: -lr * g, updates)
            return new, state

        leaves, treedef = jax.tree.flatten(updates)
        keys = jax.random.split(state.key, len(leaves) + 1)
        new_leaves = [
            -lr * 0.5 * g + lr * jax.random.normal(k, g.shape, g.dtype)
            for g, k in zip(leaves, keys[1:])
        ]
        return jax.tree.unflatten(treedef, new_leaves), SGLDState(key=keys[0])

    return optax.GradientTransformation(init_fn, update_fn)


class PSGLDState(NamedTuple):
    key: jax.Array
    momentum: optax.Params
    count: jax.Array


def psgld(lr: float = 1e-2, precondition_decay_rate: float = 0.95,
          num_pseudo_batches: int = 1, num_burn_in_steps: int = 3000,
          diagonal_bias: float = 1e-8, seed: int = 0
          ) -> optax.GradientTransformation:
    def init_fn(params):
        return PSGLDState(
            key=jax.random.PRNGKey(seed),
            momentum=jax.tree.map(jnp.ones_like, params),
            count=jnp.zeros((), jnp.int32),
        )

    def update_fn(updates, state, params=None):
        del params
        count = state.count + 1
        momentum = jax.tree.map(
            lambda v, g: v + (1.0 - precondition_decay_rate) * (g * g - v),
            state.momentum, updates)
        sigma = jnp.where(count > num_burn_in_steps,
                          1.0 / jnp.sqrt(jnp.float32(lr)), 0.0)

        leaves, treedef = jax.tree.flatten(updates)
        mom_leaves = jax.tree.leaves(momentum)
        keys = jax.random.split(state.key, len(leaves) + 1)
        new_leaves = []
        for g, v, k in zip(leaves, mom_leaves, keys[1:]):
            precond = 1.0 / jnp.sqrt(v + diagonal_bias)
            noise = jax.random.normal(k, g.shape, g.dtype)
            scaled = (0.5 * precond * g * num_pseudo_batches
                      + noise * sigma * jnp.sqrt(precond))
            new_leaves.append(-lr * scaled)
        return (jax.tree.unflatten(treedef, new_leaves),
                PSGLDState(key=keys[0], momentum=momentum, count=count))

    return optax.GradientTransformation(init_fn, update_fn)


# ---------------------------------------------------------------------------
# the paper's "as-used" SGLD-DIP machinery
# ---------------------------------------------------------------------------

def add_param_noise(params, key, param_noise_sigma: float, lr):
    """Add N(0, param_noise_sigma * lr) noise to every rank-4 leaf (conv
    kernels), matching add_noise() in the reference (it filters
    ``len(x.size()) == 4``). ``lr`` may be a traced scalar (decaying)."""
    leaves, treedef = jax.tree.flatten(params)
    keys = jax.random.split(key, len(leaves))
    out = []
    for p, k in zip(leaves, keys):
        if hasattr(p, "ndim") and p.ndim == 4:
            out.append(p + jax.random.normal(k, p.shape, p.dtype)
                       * param_noise_sigma * lr)
        else:
            out.append(p)
    return jax.tree.unflatten(treedef, out)


def param_noise_transform(param_noise_sigma: float, lr_schedule, seed: int = 0
                          ) -> optax.GradientTransformation:
    """Optax-composable version of add_param_noise: injects the parameter
    noise through the update (update += noise), equivalent to perturbing
    params *after* the step rather than before the forward — the reference
    perturbs before the forward, so the jit trainer uses add_param_noise
    directly; this transform exists for library users building optax chains."""

    class State(NamedTuple):
        key: jax.Array
        count: jax.Array

    def init_fn(params):
        del params
        return State(key=jax.random.PRNGKey(seed),
                     count=jnp.zeros((), jnp.int32))

    def update_fn(updates, state, params=None):
        del params
        lr = lr_schedule(state.count)
        leaves, treedef = jax.tree.flatten(updates)
        keys = jax.random.split(state.key, len(leaves) + 1)
        out = []
        for g, k in zip(leaves, keys[1:]):
            if hasattr(g, "ndim") and g.ndim == 4:
                out.append(g + jax.random.normal(k, g.shape, g.dtype)
                           * param_noise_sigma * lr)
            else:
                out.append(g)
        return (jax.tree.unflatten(treedef, out),
                State(key=keys[0], count=state.count + 1))

    return optax.GradientTransformation(init_fn, update_fn)


def exponential_decay_floored(init_lr: float, gamma: float,
                              floor: float = 1e-8):
    """ExponentialLR(gamma) that stops decaying once lr <= floor, matching
    the reference's ``if scheduler.get_last_lr()[0] > 1e-8: scheduler.step()``
    (bayesian_optimization.py:1784-1785): decay halts at the first value at
    or below the floor and holds it."""
    import math
    if gamma >= 1.0 or init_lr <= floor:
        n_stop = 0 if init_lr <= floor else jnp.inf
    else:
        n_stop = math.ceil(math.log(floor / init_lr) / math.log(gamma))

    def schedule(count):
        exponent = jnp.minimum(jnp.asarray(count, jnp.float32), n_stop)
        return init_lr * jnp.power(gamma, exponent)

    return schedule

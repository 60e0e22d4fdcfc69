"""Generic supervised Bayesian trainer + MC predictor.

Parity with BayTorch/inference/classification.py:13-193 (ClassificationTrainer
/ Predictor), re-designed functionally: one jit'd epoch step, ELBO with the
KL-warmup schedules from ``bayes.uncertainty.get_beta``, checkpoint save/load.
(The reference version is unused by the DIP runners; it ships as library
capability. Its ``self.net.kl`` attribute-vs-call bug is fixed by
construction here — the KL is a function of the params pytree.)
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from . import vi
from .uncertainty import get_beta


@dataclasses.dataclass
class TrainLog:
    losses: list
    accuracies: list


def cross_entropy(logits, labels):
    logp = jax.nn.log_softmax(logits)
    return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], axis=1))


def make_elbo_step(apply_fn: Callable, optimizer, prior_sigma: float,
                   n_batches: int, beta_type="Standard",
                   loss_fn: Callable = cross_entropy):
    """Returns jit'd step(params, opt_state, batch, key, batch_idx)."""

    @jax.jit
    def step(params, opt_state, x, y, key, batch_idx):
        def objective(p):
            logits = apply_fn(p, x, key=key, training=True)
            nll = loss_fn(logits, y)
            kl = vi.kl_mfvi(p, 0.0, prior_sigma)
            # batch_idx is traced: the Blundell warm-up 2^(M-i)/(2^M-1)
            # (BayTorch/inference/utils.py:44-60) must advance per batch
            # within an epoch, not stay frozen at i=0.
            beta = get_beta(beta_type, m=n_batches,
                            batch_idx=batch_idx) if isinstance(beta_type, str) \
                else beta_type
            return nll + beta * kl, logits

        (loss, logits), grads = jax.value_and_grad(objective,
                                                   has_aux=True)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        acc = jnp.mean(jnp.argmax(logits, -1) == y)
        return params, opt_state, loss, acc

    return step


class ClassificationTrainer:
    """Minimal epoch-driven trainer over (x, y) numpy batches."""

    def __init__(self, apply_fn, params, lr: float = 1e-3,
                 prior_sigma: float = 0.1, n_batches: int = 1,
                 beta_type="Standard", loss_fn=cross_entropy):
        self.apply_fn = apply_fn
        self.params = params
        self.optimizer = optax.adamw(lr)
        self.opt_state = self.optimizer.init(params)
        self.step = make_elbo_step(apply_fn, self.optimizer, prior_sigma,
                                   n_batches, beta_type, loss_fn)
        self.log = TrainLog([], [])

    def train_epoch(self, batches, key) -> float:
        losses = []
        for i, (x, y) in enumerate(batches):
            k = jax.random.fold_in(key, i)
            self.params, self.opt_state, loss, acc = self.step(
                self.params, self.opt_state, jnp.asarray(x), jnp.asarray(y),
                k, i)
            losses.append(float(loss))
            self.log.losses.append(float(loss))
            self.log.accuracies.append(float(acc))
        return float(np.mean(losses))

    # -- checkpointing (state_dict-save parity, classification.py:35-38) ----
    def save(self, path: str):
        flat, treedef = jax.tree.flatten((self.params, self.opt_state))
        np.savez(path, n=len(flat),
                 **{f"leaf_{i}": np.asarray(x) for i, x in enumerate(flat)})
        self._treedef = treedef

    def load(self, path: str):
        z = np.load(path, allow_pickle=True)
        flat = [jnp.asarray(z[f"leaf_{i}"]) for i in range(int(z["n"]))]
        _, treedef = jax.tree.flatten((self.params, self.opt_state))
        self.params, self.opt_state = jax.tree.unflatten(treedef, flat)


class Predictor:
    """MC-averaged predictor (BayTorch Predictor parity): softmax averaged
    over n_samples stochastic forwards, batched with vmap."""

    def __init__(self, apply_fn, params, n_samples: int = 25):
        self.apply_fn = apply_fn
        self.params = params
        self.n_samples = n_samples

        @jax.jit
        def _predict(params, x, key):
            keys = jax.random.split(key, n_samples)

            def one(k):
                return jax.nn.softmax(
                    apply_fn(params, x, key=k, training=True), -1)

            return jnp.mean(jax.vmap(one)(keys), axis=0)

        self._predict = _predict

    def __call__(self, x, key: Optional[jax.Array] = None):
        key = key if key is not None else jax.random.PRNGKey(0)
        return self._predict(self.params, jnp.asarray(x), key)

"""Multi-chip sharding: candidate x MC-sample x spatial device meshes.

The reference has NO distributed backend (SURVEY.md section 2: parallelism =
whole-fit-per-GPU via torch.multiprocessing). The TPU-native scaling axes for
this workload are:

  * ``cand`` — BO candidates (task parallel, embarrassingly parallel): each
    mesh slice trains an independent DIP fit with its own parameters and
    hyperparameters. Replaces process-per-GPU fanout with a single SPMD
    program.
  * ``mc``   — Monte-Carlo posterior samples (the data-parallel analog for a
    batch-size-1 workload): the ELBO is averaged over S stochastic forwards;
    sharding S across ``mc`` makes XLA insert one psum for the gradient
    reduction (this is the only collective the workload needs — it rides ICI).
  * ``sp``   — optional spatial partitioning of the image height for large
    images: convolutions under GSPMD get automatic halo exchanges.

TP/PP/EP are not applicable (2M-param CNN, no layer pipeline, no experts) —
recorded deliberately, per the reference survey.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..bayes import vi


def make_mesh(n_devices: int | None = None, shape=None,
              names=("cand", "mc")) -> Mesh:
    """Build a device mesh. Default factorization splits devices between the
    candidate and MC axes (candidate-major)."""
    devs = jax.devices()
    n = n_devices or len(devs)
    devs = np.array(devs[:n])
    if shape is None:
        if len(names) == 2:
            c = 1
            for d in range(int(np.sqrt(n)), 0, -1):
                if n % d == 0:
                    c = n // d
                    break
            shape = (c, n // c)
        else:
            raise ValueError("provide shape for meshes with >2 axes")
    return Mesh(devs.reshape(shape), names)


class SweepState(NamedTuple):
    """Stacked training state for C concurrent candidates."""
    params: optax.Params        # leading axis C
    opt_state: optax.OptState   # leading axis C
    out_avg: jnp.ndarray        # (C, 1, H, W, n_out)


def build_sharded_sweep_step(problem, method_name: str, n_samples: int,
                             mesh: Mesh, reparam: str = "rt"):
    """A single SPMD training step for C candidates x S MC samples, written
    with shard_map: each ``cand`` mesh slice trains its own candidate locally
    (no cross-candidate communication by construction — GSPMD's conv
    partitioner never sees the batched-weight convolutions), and the ELBO's
    gradient is averaged across the ``mc`` axis with ONE pmean — the only
    collective this workload needs, riding ICI.

    Returns (jit'd step, shardings dict); step signature:
        step(state, hp_stack, keys, z, it) -> (state, losses)
    where keys has shape (C, S) of PRNG keys, C == mesh 'cand' size and
    S == mesh 'mc' size (one sample per mc slice; raise S by folding more
    draws inside one_sample).
    """
    from ..tasks.trainer import (HyperParams, EXP_WEIGHT, REG_NOISE_STD,
                                 _tree_select, _build_optimizer, Method)

    net = problem.net
    is_mfvi = method_name == "mfvi"
    optimizer = _build_optimizer(Method(name=method_name), 1e-3)

    def per_candidate(params, opt_state, out_avg, hp: HyperParams,
                      keys_local, z_in, it):
        # keys_local: (S_local,) this mc-slice's sample keys
        kj = jax.random.fold_in(keys_local[0], 17)
        kj = jax.random.fold_in(kj, it)
        x = z_in + REG_NOISE_STD * jax.random.normal(kj, z_in.shape,
                                                     z_in.dtype)

        def loss_fn(p):
            def one_sample(k):
                out = net.apply(p, x, key=jax.random.fold_in(k, it),
                                training=True, reparam=reparam,
                                dropout_p=(hp.dropout_p
                                           if method_name == "mcd" else None))
                return problem.data_loss(out), out
            # lax.map, not vmap: batching over *weight* samples turns convs
            # into grouped convs (~7x slower on TPU, see bayes/uncertainty)
            losses, outs = jax.lax.map(one_sample, keys_local)
            loss = jnp.mean(losses)
            if is_mfvi:
                loss = loss + hp.temp * vi.kl_mfvi(p, 0.0, hp.prior_sigma)
            return loss, jnp.mean(outs, axis=0)

        (loss, out_mean), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        # average the stochastic (per-mc-slice) quantities across 'mc'
        loss = jax.lax.pmean(loss, "mc")
        grads = jax.lax.pmean(grads, "mc")
        out_mean = jax.lax.pmean(out_mean, "mc")

        opt_state.hyperparams["learning_rate"] = hp.lr
        opt_state.hyperparams["weight_decay"] = hp.weight_decay
        updates, new_opt = optimizer.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        ok = jnp.isfinite(loss)
        new_params = _tree_select(ok, new_params, params)
        new_opt = _tree_select(ok, new_opt, opt_state)
        out_t = problem.transform(out_mean)
        new_avg = jnp.where(it == 0, out_t,
                            out_avg * EXP_WEIGHT + out_t * (1 - EXP_WEIGHT))
        return new_params, new_opt, new_avg, loss

    def local_step(params, opt_state, out_avg, hp, keys_local, z_in, it):
        # leading local-candidate axis (usually length 1 per slice)
        new_p, new_o, new_avg, losses = jax.vmap(
            per_candidate, in_axes=(0, 0, 0, 0, 0, None, None)
        )(params, opt_state, out_avg, hp, keys_local, z_in, it)
        return new_p, new_o, new_avg, losses

    cand_spec = P("cand")
    sharded = jax.shard_map(
        local_step, mesh=mesh,
        in_specs=(cand_spec, cand_spec, cand_spec, cand_spec,
                  P("cand", "mc"), P(), P()),
        out_specs=(cand_spec, cand_spec, cand_spec, cand_spec),
        check_vma=False,
    )

    @jax.jit
    def step(state: SweepState, hp_stack, keys, z_in, it):
        new_p, new_o, new_avg, losses = sharded(
            state.params, state.opt_state, state.out_avg, hp_stack, keys,
            z_in, it)
        return SweepState(new_p, new_o, new_avg), losses

    cand = NamedSharding(mesh, P("cand"))
    shardings = {"cand": cand,
                 "keys": NamedSharding(mesh, P("cand", "mc")),
                 "z": NamedSharding(mesh, P()),
                 "repl": NamedSharding(mesh, P())}
    return step, shardings


def init_sweep_state(problem, method_name: str, n_candidates: int,
                     seed: int = 0):
    """Host-side construction of the stacked (C, ...) state."""
    from ..tasks.trainer import Method, _build_optimizer

    net = problem.net
    optimizer = _build_optimizer(Method(name=method_name), 1e-3)

    def one(i):
        key = jax.random.PRNGKey(seed + i)
        params = net.init(key)
        if method_name == "mfvi":
            params = vi.to_mfvi(params, jax.random.fold_in(key, 1))
        return params

    params_stack = jax.tree.map(
        lambda *xs: jnp.stack(xs), *[one(i) for i in range(n_candidates)])
    opt_stack = jax.vmap(optimizer.init)(params_stack)
    h, w = problem.imsize
    n_out = {"ct": 1, "den": 2, "sr": 2, "inp": 4}[problem.task]
    out_avg = jnp.zeros((n_candidates, 1, h, w, n_out), jnp.float32)
    return SweepState(params_stack, opt_stack, out_avg)


def stack_hyperparams(methods, lr: float):
    from ..tasks.trainer import HyperParams
    hps = [HyperParams.of(m, lr) for m in methods]
    return jax.tree.map(lambda *xs: jnp.stack(xs), *hps)

"""The single generic DIP trainer: one jit'd lax.scan replaces the
reference's 16 hand-unrolled training loops (bayesian_optimization.py:
261-3545).

Everything per-iteration — input jitter, stochastic forward, loss, AdamW (or
SGLD-schedule) update, NaN guard, EMA smoothing, MC ring buffers, PSNR/SSIM
triples — runs on-device inside a scan over ``show_every``-sized chunks; the
host only sees one small metrics array + snapshot tensors per chunk (the
reference paid 6+ GPU->host syncs *per iteration* for its .item() metric
reads).

Parity semantics preserved (each with its reference line):
  * ``num_iter + 1`` total iterations (:306 etc.)
  * input jitter: net_input = saved + N(0,1) * 0.1 fresh per iter (:1363)
  * EMA: out_avg = 0.99 * out_avg + 0.01 * out_transformed, seeded with the
    first iterate (:1378-1381)
  * NaN guard: skip param AND optimizer-state update when loss is non-finite
    (:380-381); with SGLD the pre-forward parameter noise persists either way
  * 25-deep MC ring buffers for epistemic/aleatoric maps, zero-initialized,
    unbiased variance (:515-517, 601, 618)
  * SGLD: param noise sigma = 2 * base_lr (NOT the decayed lr — :984 passes
    the constant LR), ExponentialLR(gamma) with the 1e-8 stop rule (:1784-85)
  * AdamW(lr, weight_decay) over all params incl. BatchNorm affine (:366)
"""

from __future__ import annotations

import dataclasses
import os
import threading
import time
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..bayes import vi
from ..optim.sgld import add_param_noise
from .problems import Problem, reinit_conv_weights_normal


def _enable_persistent_compile_cache():
    """Cache compiled executables on disk (~/.cache/mfvi_dip_mia_tpu): BO
    sweeps spawn many identical training graphs; first compile pays, the rest
    load in milliseconds. No-op when the user already configured a cache.

    CPU backend: OFF by default (MFVI_DIP_CPU_CACHE=1 re-enables). XLA:CPU's
    AOT loader warns its cached results "could lead to execution errors such
    as SIGILL" under machine-feature mismatches, and loading cache entries
    from fanout worker threads segfaulted reproducibly on this class of host;
    in-process executable sharing (structural run-chunk keys) covers the
    CPU use cases anyway."""
    import os
    if jax.config.jax_compilation_cache_dir:
        return
    try:
        if (jax.default_backend() == "cpu"
                and os.environ.get("MFVI_DIP_CPU_CACHE") != "1"):
            return
    except Exception:
        return
    path = os.path.join(os.path.expanduser("~"), ".cache",
                        "mfvi_dip_mia_tpu", "jax_cache")
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:  # pragma: no cover - cache is a best-effort speedup
        pass

MC_RING = 25          # ref :515
EXP_WEIGHT = 0.99     # ref :307
REG_NOISE_STD = 0.1   # ref :303


@dataclasses.dataclass(frozen=True)
class Method:
    """Inference-mode hyperparameters (the 2 BO axes per method)."""
    name: str                      # 'dip' | 'mfvi' | 'mcd' | 'sgld'
    temp: float = 0.0              # mfvi
    sigma: float = 0.0             # mfvi prior scale multiplier
    dropout_p: float = 0.3         # mcd
    weight_decay: float = 0.0      # mcd / sgld (AdamW decoupled wd)
    gamma: float = 0.9999          # sgld lr decay
    param_noise_sigma: float = 2.0 # sgld (ref :979)
    # optional scale-mixture prior in the reference's dict schema
    # ({'mu': [..], 'sigma': [..], 'pi': [..]}): routes the MFVI KL through
    # the MC estimator, as BayTorch does whenever 'pi' is present
    # (modules/module.py:32-35). None -> the runners' scalar prior.
    prior: dict | None = None

    @property
    def prior_sigma(self) -> float:
        # THE POTOBIM coupling: prior sigma = sqrt(temp) * sigma (ref :536-537)
        return float(np.sqrt(self.temp) * self.sigma)


class HyperParams(NamedTuple):
    """Numeric hyperparameters as traced scalars: BO candidates differ only in
    these values, so every candidate shares ONE compiled training graph
    (the torch reference pays full per-process startup per candidate)."""
    lr: jnp.ndarray
    temp: jnp.ndarray
    prior_sigma: jnp.ndarray
    weight_decay: jnp.ndarray
    gamma: jnp.ndarray
    dropout_p: jnp.ndarray
    param_noise_sigma: jnp.ndarray
    # (K,) mixture-prior components; K=0 means scalar prior (the K is shape-
    # static, so mixture vs scalar picks its branch at trace time while the
    # component VALUES stay traced like every other hyperparameter)
    prior_loc: jnp.ndarray
    prior_scale: jnp.ndarray
    prior_pi: jnp.ndarray

    @staticmethod
    def of(method: "Method", lr: float) -> "HyperParams":
        f = lambda v: jnp.asarray(v, jnp.float32)
        if method.prior is not None and "pi" in method.prior:
            loc = f(method.prior["mu"])
            scale = f(method.prior["sigma"]) + 1e-6  # module.py:34 stabilizer
            pi = f(method.prior["pi"])
        else:
            loc = scale = pi = jnp.zeros((0,), jnp.float32)
        return HyperParams(
            lr=f(lr), temp=f(method.temp), prior_sigma=f(method.prior_sigma),
            weight_decay=f(method.weight_decay), gamma=f(method.gamma),
            dropout_p=f(method.dropout_p),
            param_noise_sigma=f(method.param_noise_sigma),
            prior_loc=loc, prior_scale=scale, prior_pi=pi)


def _sgld_lr(hp: HyperParams, it, floor: float = 1e-8):
    """ExponentialLR(gamma) with the reference's stop-at-floor rule
    (:1784-1785), computed from traced scalars."""
    n_stop = jnp.ceil(jnp.log(floor / hp.lr) / jnp.log(hp.gamma))
    n_stop = jnp.where(hp.gamma >= 1.0, jnp.inf, jnp.maximum(n_stop, 0.0))
    expo = jnp.minimum(jnp.asarray(it, jnp.float32), n_stop)
    return hp.lr * jnp.power(hp.gamma, expo)


class TrainState(NamedTuple):
    params: optax.Params
    opt_state: optax.OptState
    out_avg: jnp.ndarray
    ring_epi: jnp.ndarray
    ring_ale: jnp.ndarray
    # snapshot buffers captured at iterations i % show_every == 0, so that
    # every scan chunk has identical length -> exactly ONE XLA compilation.
    snap_avg: jnp.ndarray
    snap_epi: jnp.ndarray
    snap_ale: jnp.ndarray


@dataclasses.dataclass
class FitResult:
    mse_corrupted: np.ndarray      # (N,)
    mse_gt: np.ndarray             # (N,)
    psnrs: np.ndarray              # (N, 3)
    ssims: np.ndarray              # (N, 3)
    recons: np.ndarray             # (S, mean_ch, H, W) CHW artifact parity
    uncerts_epi: np.ndarray        # (S, mean_ch, H, W)
    uncerts_ale: np.ndarray        # (S, mean_ch, H, W)
    params: optax.Params           # final parameters (posterior for MFVI)
    net_input: np.ndarray          # the fixed DIP input (1,H,W,D)
    iters_per_sec: float
    compile_seconds: float
    final_psnr: float              # psnrs[-1, 2]: the BO objective (ref :1444)
    executed: int = 0              # iterations actually run (< num_iter when
                                   # early_stop fired)
    wall_seconds: float = 0.0      # total fit wall incl. compile/dispatch


def _tree_select(pred, a, b):
    return jax.tree.map(lambda x, y: jnp.where(pred, x, y), a, b)


def make_step_fn(problem: Problem, method_name: str, optimizer,
                 hp: HyperParams, base_key, z_saved, num_iter, show_every,
                 reparam: str = "rt", metrics_every=1,
                 compute_dtype=jnp.float32, layout: str = "nhwc"):
    """Build the per-iteration step closure (pure; scanned under jit).

    Iterations >= num_iter are masked no-ops (state passes through) so the
    driver can always scan fixed-length chunks. ``num_iter``/``show_every``
    and all of ``hp`` may be traced scalars — run lengths and hyperparameter
    values don't trigger recompilation.
    """
    net = problem.net
    is_mfvi = method_name == "mfvi"
    is_sgld = method_name == "sgld"
    is_mcd = method_name == "mcd"
    # one fused whole-tree RT draw instead of per-site sampling chains
    # (bayes/vi.py::sample_mfvi_tree); A/B gate MFVI_DIP_FLAT_SAMPLE=0.
    # RT only — LRT samples in activation space and cannot pre-sample.
    flat_sample = (is_mfvi and reparam == "rt"
                   and os.environ.get("MFVI_DIP_FLAT_SAMPLE", "1") != "0")

    def step(state: TrainState, it):
        key_it = jax.random.fold_in(base_key, it)
        k_jit, k_net, k_pn, k_kl = jax.random.split(key_it, 4)

        x = z_saved + REG_NOISE_STD * jax.random.normal(
            k_jit, z_saved.shape, z_saved.dtype)

        params = state.params
        # fused analytic KL (optim/fused_adamw.py): only for the closed-form
        # Normal prior, and only when the fused optimizer is in play (its
        # inject_hyperparams state carries a "kl_temp" slot)
        fused_kl = (is_mfvi and hp.prior_pi.shape[0] == 0
                    and "kl_temp" in getattr(state.opt_state, "hyperparams",
                                             {}))
        if is_sgld:
            # pre-forward parameter perturbation at sigma = 2 * base_lr (the
            # CONSTANT lr — ref :984); persists in params (ref :166-170)
            params = add_param_noise(params, k_pn, hp.param_noise_sigma,
                                     hp.lr)

        def loss_fn(p):
            # optional reduced-precision forward/backward: bf16 activations
            # and weights ride the MXU at ~1.5x; master params, the KL and
            # the loss itself stay f32 (mixed-precision recipe)
            def cast_tree(t):
                return jax.tree.map(
                    lambda a: a.astype(compute_dtype)
                    if hasattr(a, "dtype") and a.dtype == jnp.float32 else a,
                    t)

            if flat_sample:
                # sample on the f32 master tree with the compute-dtype cast
                # fused into the flat draw: ONE convert of the concatenated
                # vector instead of per-leaf mu/rho casts (the <=16384-elem
                # convert population in the step HLO), and softplus(rho) at
                # full f32. The residual cast_tree covers only the
                # non-variational leaves (BN affine, plain-conv sites).
                p_c = vi.sample_mfvi_tree(
                    p, k_net,
                    out_dtype=(None if compute_dtype == jnp.float32
                               else compute_dtype))
                if compute_dtype != jnp.float32:
                    p_c = cast_tree(p_c)
                    x_c = x.astype(compute_dtype)
                else:
                    x_c = x
            elif compute_dtype != jnp.float32:
                p_c, x_c = cast_tree(p), x.astype(compute_dtype)
            else:
                p_c, x_c = p, x
            out = net.apply(p_c, x_c, key=k_net, training=True,
                            reparam=reparam,
                            dropout_p=hp.dropout_p if is_mcd else None,
                            layout=layout)
            out = out.astype(jnp.float32)
            loss = problem.data_loss(out)
            if is_mfvi:
                if hp.prior_pi.shape[0] > 0:   # scale-mixture prior: MC KL
                    kl = vi.kl_mfvi_mc(p, k_kl, hp.prior_loc,
                                       hp.prior_scale, hp.prior_pi)
                else:
                    kl = vi.kl_mfvi(p, 0.0, hp.prior_sigma)
                    if fused_kl:
                        # keep the KL *value* (logged loss parity) but let
                        # the fused optimizer add its analytic gradient —
                        # skips autodiff replaying the softplus/concat chain
                        kl = jax.lax.stop_gradient(kl)
                loss = loss + hp.temp * kl
            return loss, out

        (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)

        opt_state = state.opt_state
        # traced hyperparameters ride in the inject_hyperparams state
        opt_state.hyperparams["weight_decay"] = hp.weight_decay
        # Reference quirk (replicated): run_ct_sgld CREATES its ExponentialLR
        # scheduler but never calls scheduler.step() — only the den/sr/inp
        # SGLD runners decay (ref bayesian_optimization.py:1784-1785,
        # :2619-2620, :3470-3471; nothing in :955-1060). CT SGLD therefore
        # runs at CONSTANT lr. Decaying it here froze our CT fit while the
        # sigma=2*lr0 param noise kept kicking: 15.54 vs 16.21 dB at 500
        # iters, degrading to 13.97 vs 16.78 at 1500 (logs/
        # ct_sgld_confirm.json, pre-fix) — the r4 parity table's worst
        # non-inp delta, root-caused.
        sgld_decays = is_sgld and problem.task != "ct"
        opt_state.hyperparams["learning_rate"] = (
            _sgld_lr(hp, it) if sgld_decays else hp.lr)
        if "kl_temp" in opt_state.hyperparams:
            # fused flat AdamW: the analytic KL gradient rides the optimizer
            # (optim/fused_adamw.py); zero-scaled unless this step routed the
            # closed-form Normal prior through stop_gradient above
            opt_state.hyperparams["kl_temp"] = (
                hp.temp if fused_kl else jnp.float32(0.0))
            opt_state.hyperparams["kl_prior_sigma"] = hp.prior_sigma
        updates, new_opt = optimizer.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)

        ok = jnp.isfinite(loss)
        new_params = _tree_select(ok, new_params, params)
        new_opt = _tree_select(ok, new_opt, state.opt_state)

        out_t = problem.transform(out)
        out_avg = jnp.where(it == 0, out_t,
                            state.out_avg * EXP_WEIGHT
                            + out_t * (1.0 - EXP_WEIGHT))

        # the MC rings and snapshot maps are carried FLAT (2-D / 1-D): their
        # natural 4-D (25, H, W, 1) form tempts XLA's layout assignment into
        # T(1,128)-tiled layouts once a Pallas custom call (with row-major
        # operand constraints) joins the program, inserting ~ms-scale
        # layout-conversion copies of the ring every iteration. Flat buffers
        # are layout-unambiguous; the 4-D view is restored host-side when
        # snapshots are read (once per chunk).
        mc = problem.mean_ch
        slot = jnp.mod(it, MC_RING)
        ring_epi = state.ring_epi.at[slot].set(
            jnp.clip(out_t[0, ..., :mc], 0, 1).reshape(-1))
        if problem.has_ale:
            ale = jnp.clip(out_t[0, ..., mc:], 0, 1)
            # inp: 1 ale channel rides a 3-channel (mean_ch) ring slot — the
            # 4-D ring relied on .set's implicit broadcast; flat is explicit
            ale = jnp.broadcast_to(ale, ale.shape[:-1] + (mc,))
            ring_ale = state.ring_ale.at[slot].set(ale.reshape(-1))
        else:
            ring_ale = state.ring_ale

        # per-iteration metric triples; with metrics_every > 1 (BO sweeps,
        # benchmarking) the 6 PSNR/SSIM convs run only on boundary iterations
        # (lax.cond: one branch executes inside scan)
        metrics = jax.lax.cond(
            jnp.mod(it, metrics_every) == 0,
            lambda: problem.metrics(out_t, out_avg),
            lambda: jnp.full((8,), jnp.nan, jnp.float32))

        at_snap = jnp.logical_and(jnp.mod(it, show_every) == 0, it < num_iter)

        # snapshot reductions go under lax.cond, NOT a masked jnp.where:
        # unconditionally computing the ring var/mean every iteration is free
        # in the pure-XLA program (it fuses to nothing next to the matmuls)
        # but costs ~8 ms/iter the moment a Pallas call joins the program —
        # the custom-call boundary stops XLA from fusing the masked
        # reductions, so they materialize per step. cond executes them only
        # on the 1/show_every boundary iterations.
        snap_avg, snap_epi, snap_ale = jax.lax.cond(
            at_snap,
            lambda: (out_avg.reshape(-1), jnp.var(ring_epi, axis=0, ddof=1),
                     jnp.mean(ring_ale, axis=0)),
            lambda: (state.snap_avg, state.snap_epi, state.snap_ale))

        new_state = TrainState(new_params, new_opt, out_avg, ring_epi,
                               ring_ale, snap_avg, snap_epi, snap_ale)
        # mask past-the-end iterations so all chunks share one compiled shape
        new_state = _tree_select(it < num_iter, new_state, state)
        return new_state, metrics

    return step


import weakref

# Keyed by net.structure_key() when available (falls back to the net object,
# weakly): BO fanout builds a FRESH net per candidate, and object-identity
# keying would force every candidate to re-deserialize the same executable
# from the persistent cache — LLVM codegen per thread, measured in seconds
# and segfault-prone off the main thread. Structural keying gives all
# same-shape candidates the one in-process executable the architecture
# intends.
_RUN_CHUNK_CACHE: dict = {}
_RUN_CHUNK_CACHE_WEAK = weakref.WeakKeyDictionary()


def _net_cache(net) -> dict:
    key = getattr(net, "structure_key", None)
    if key is None:
        return _RUN_CHUNK_CACHE_WEAK.setdefault(net, {})
    return _RUN_CHUNK_CACHE.setdefault(key(), {})

# Serializes each fit's FIRST chunk dispatch: concurrent thread-fanout fits
# cold-compiling the same program race inside XLA's executable
# (de)serialization (observed SIGABRT in backend.deserialize_executable via
# the persistent cache). After one thread compiles, the others hit pjit's
# in-process cache and all later chunks run lock-free.
_COMPILE_LOCK = threading.Lock()


def _get_run_chunk(problem: Problem, method_name: str, optimizer,
                   reparam: str, compute_dtype=None, layout: str = "nhwc"):
    import jax.numpy as _jnp
    compute_dtype = compute_dtype or _jnp.float32
    """One compiled chunk runner per (net, task, method, reparam): data
    tensors, the PRNG key, run lengths and all hyperparameters are traced
    arguments, so repeated fits — every BO candidate, every seed — reuse a
    single XLA executable."""
    per_net = _net_cache(problem.net)
    cache_key = (problem.task, method_name, reparam, str(compute_dtype),
                 layout,
                 # module constants baked in at trace time (the lockstep
                 # test monkeypatches the jitter off)
                 REG_NOISE_STD,
                 # trace-time env gates baked into the executable (A/B runs
                 # flip them between fits in one process)
                 os.environ.get("MFVI_DIP_FLAT_SAMPLE", "1"),
                 os.environ.get("MFVI_DIP_FUSED_BLOCK", "1"),
                 os.environ.get("MFVI_DIP_FUSED_ADAMW", "1"),
                 problem.gt.shape, problem.target.shape,
                 None if problem.mask is None else problem.mask.shape,
                 # op_state may be any pytree (dense matrix, banded blocks...)
                 tuple((x.shape, str(x.dtype))
                       for x in jax.tree.leaves(problem.op_state)))
    if cache_key in per_net:
        return per_net[cache_key]

    @jax.jit
    def run_chunk(state, its, n_iter, show_ev, hp, data):
        bound = dataclasses.replace(
            problem, gt=data["gt"], target=data["target"], mask=data["mask"],
            op_state=data["op_state"])
        step = make_step_fn(bound, method_name, optimizer, hp, data["key"],
                            data["z"], n_iter, show_ev, reparam,
                            data["metrics_every"], compute_dtype, layout)
        return jax.lax.scan(step, state, its)

    per_net[cache_key] = run_chunk
    return run_chunk


def _get_init_fn(problem: Problem, method_name: str, optimizer,
                 init_normal_std):
    """One jit'd initializer: the eager per-leaf init is ~200 separate device
    dispatches (tens of seconds through a remote-TPU tunnel); fused it is one.
    Cached per (net, method) like the chunk runner."""
    per_net = _net_cache(problem.net)
    # the optimizer gate is part of the key: the fused flat AdamW's
    # inject_hyperparams state carries kl_temp/kl_prior_sigma slots that the
    # plain optax.adamw factory rejects (and vice versa misses), so an
    # opt_state initialized under one gate must never be reused by the other
    cache_key = ("init", method_name, init_normal_std,
                 os.environ.get("MFVI_DIP_FUSED_ADAMW", "1"))
    if cache_key in per_net:
        return per_net[cache_key]

    @jax.jit
    def init_fn(k_init, k_mfvi, k_reinit):
        params = problem.net.init(k_init)
        if init_normal_std is not None:
            params = reinit_conv_weights_normal(params, k_reinit,
                                                init_normal_std)
        if method_name == "mfvi":
            params = vi.to_mfvi(params, k_mfvi)
        return params, optimizer.init(params)

    per_net[cache_key] = init_fn
    return init_fn


def _build_optimizer(method: Method, lr: float):
    """AdamW with lr/weight_decay as *state-resident* (traced) hyperparams.
    SGLD's decayed lr and the per-method weight decay are written into
    opt_state.hyperparams inside the step (see make_step_fn).

    optax.flatten: AdamW is elementwise, so running it over ONE concatenated
    vector is bitwise-identical to the per-leaf form while collapsing ~300
    tiny per-leaf fusions (HLO cycle profile: 840 loop fusions dominated the
    step at 256^2) into a handful of big ones."""
    wd = method.weight_decay if method.name in ("mcd", "sgld") else 0.0
    if os.environ.get("MFVI_DIP_FUSED_ADAMW", "1") != "0":
        # hand-fused single-chain flat AdamW (+ analytic KL gradient for
        # mfvi) — numerically the optax path below, minus ~10 fragmented
        # passes over the 2M-element flat vector and the KL autodiff
        from ..optim.fused_adamw import flat_adamw
        return optax.inject_hyperparams(
            flat_adamw, static_args=("use_kl", "b1", "b2", "eps"))(
            learning_rate=lr, weight_decay=wd, kl_temp=0.0,
            kl_prior_sigma=0.1, use_kl=(method.name == "mfvi"))
    return optax.flatten(
        optax.inject_hyperparams(optax.adamw)(learning_rate=lr,
                                              weight_decay=wd))


def save_fit_checkpoint(path: str, state: TrainState, chunk: int,
                        metric_arrays: dict):
    """Mid-fit checkpoint: full TrainState + metric traces so far. The
    reference has no fit-level checkpointing (nets are throwaway per image);
    at 100k-iteration CT scale a resumable fit is a production requirement."""
    flat, _ = jax.tree.flatten(state)
    payload = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(flat)}
    payload.update({f"metric_{k}": v for k, v in metric_arrays.items()})
    np.savez(path, n_leaves=len(flat), chunk=chunk, **payload)


def load_fit_checkpoint(path: str, state_template: TrainState):
    z = np.load(path, allow_pickle=True)
    flat = [jnp.asarray(z[f"leaf_{i}"]) for i in range(int(z["n_leaves"]))]
    _, treedef = jax.tree.flatten(state_template)
    state = jax.tree.unflatten(treedef, flat)
    metrics = {k[len("metric_"):]: z[k] for k in z.files
               if k.startswith("metric_")}
    return state, int(z["chunk"]), metrics


def prepare_fit(problem: Problem, method: Method, *, lr: float,
                seed: int = 42, rng: np.random.Generator | None = None,
                metrics_every: int = 1, device=None, warm_transfer=True):
    """The exact initialization ``fit`` performs, factored out so the SPMD
    candidate sweep (parallel/sharding.py) can build bit-identical
    per-candidate states. Returns (state, hp, data, z_np, optimizer)."""
    from ..utils import images as I

    h, w = problem.imsize
    mc = problem.mean_ch

    rng = rng or np.random.default_rng(seed)
    z_np = I.get_noise(problem.input_depth, (h, w), rng=rng)
    z_saved = jnp.asarray(z_np)
    if device is not None:
        z_saved = jax.device_put(z_saved, device)

    key = jax.random.PRNGKey(seed)
    k_init, k_mfvi, k_reinit, k_train = jax.random.split(key, 4)
    if device is not None:
        k_init, k_mfvi, k_reinit = jax.device_put((k_init, k_mfvi, k_reinit),
                                                  device)

    optimizer = _build_optimizer(method, lr)
    init_fn = _get_init_fn(problem, method.name, optimizer,
                           problem.init_normal_std)
    params, opt_state = init_fn(k_init, k_mfvi, k_reinit)
    if warm_transfer:
        # warm the device->host transfer path (first transfer through a
        # remote TPU tunnel can pay a one-time multi-second setup; keep it
        # out of the per-chunk accounting)
        np.asarray(jax.tree.leaves(params)[0]).ravel()[:1]

    n_out = {"ct": 1, "den": 2, "sr": 2, "inp": 4}[problem.task]

    state = TrainState(
        params=params,
        opt_state=opt_state,
        out_avg=jnp.zeros((1, h, w, n_out), jnp.float32),
        ring_epi=jnp.zeros((MC_RING, h * w * mc), jnp.float32),
        ring_ale=jnp.zeros((MC_RING, h * w * mc), jnp.float32),
        snap_avg=jnp.zeros((h * w * n_out,), jnp.float32),
        snap_epi=jnp.zeros((h * w * mc,), jnp.float32),
        snap_ale=jnp.zeros((h * w * mc,), jnp.float32),
    )
    if device is not None:
        state = jax.device_put(state, device)

    hp = HyperParams.of(method, lr)
    data = {"z": z_saved, "gt": problem.gt, "target": problem.target,
            "mask": problem.mask, "key": k_train,
            "op_state": problem.op_state,
            "metrics_every": jnp.asarray(metrics_every, jnp.int32)}
    return state, hp, data, z_np, optimizer


class _EarlyStop:
    """Host-side early stopping on the smoothed-recon PSNR (the BO
    objective). OPT-IN — the reference always runs the full budget, so BO
    parity requires this off; when on, a fit stops once the best smoothed
    PSNR has not improved by ``min_delta`` dB within ``patience`` iterations.
    Decisions are per-chunk (the scan itself stays fixed-shape)."""

    def __init__(self, spec: dict):
        self.patience = int(spec.get("patience", 5000))
        self.min_delta = float(spec.get("min_delta", 0.05))
        self.best = -np.inf
        self.best_iter = 0

    def should_stop(self, psnr_sm_rows: np.ndarray, start: int) -> bool:
        col = np.asarray(psnr_sm_rows)
        finite = np.isfinite(col)
        if finite.any():
            i = int(np.nanargmax(np.where(finite, col, -np.inf)))
            if col[i] > self.best + self.min_delta:
                self.best = float(col[i])
                self.best_iter = start + i
                return False
        return (start + len(col) - 1 - self.best_iter) >= self.patience


def resolve_compute_dtype(dtype):
    """Accept 'f32'/'bf16' strings (the config / run_params spelling) or jnp
    dtypes for the trainer's ``compute_dtype`` knob. None -> float32."""
    if dtype is None:
        return jnp.float32
    if isinstance(dtype, str):
        names = {"f32": jnp.float32, "float32": jnp.float32,
                 "bf16": jnp.bfloat16, "bfloat16": jnp.bfloat16}
        if dtype not in names:
            raise ValueError(f"unknown compute_dtype {dtype!r} "
                             f"(expected one of {sorted(names)})")
        return names[dtype]
    return dtype


def fit(problem: Problem, method: Method, *, num_iter: int, lr: float,
        seed: int = 42, show_every: int = 100,
        log_fn: Optional[Callable] = None,
        snapshot_fn: Optional[Callable] = None,
        rng: np.random.Generator | None = None,
        reparam: str = "rt", device=None, metrics_every: int = 1,
        compute_dtype=jnp.float32, layout: str = "nhwc",
        checkpoint_path: Optional[str] = None,
        checkpoint_every_chunks: int = 100,
        resume: bool = False,
        collect_snapshots: bool = True,
        chunk_iters: Optional[int] = None,
        early_stop: Optional[dict] = None,
        shardings: Optional[dict] = None) -> FitResult:
    """Run one full DIP fit. Returns per-iteration metric traces + snapshot
    stacks with the reference's shapes and the final smoothed-recon PSNR
    as ``final_psnr`` (the BO objective).

    ``log_fn(i, metrics_row)`` and ``snapshot_fn(i, recon, epi, ale)`` fire at
    every ``show_every`` boundary (host-side).

    ``chunk_iters`` sets the scanned chunk length independently of
    ``show_every`` (default: equal). Longer chunks amortize per-dispatch
    overhead — +13% measured on the CT fit at 500 vs 100 — at the cost of
    coarser host-side logging; snapshot collection requires chunk
    boundaries to land on ``show_every`` boundaries.

    ``early_stop={'patience': iters, 'min_delta': dB}`` (opt-in; deviation
    from the reference's fixed budget) ends the fit once the smoothed PSNR
    plateaus; trailing metric entries are NaN and ``final_psnr`` is the last
    computed value.
    """
    _enable_persistent_compile_cache()

    compute_dtype = resolve_compute_dtype(compute_dtype)
    num_iter = num_iter + 1  # ref :306
    h, w = problem.imsize
    mc = problem.mean_ch
    n_out = {"ct": 1, "den": 2, "sr": 2, "inp": 4}[problem.task]

    state, hp, data, z_np, optimizer = prepare_fit(
        problem, method, lr=lr, seed=seed, rng=rng,
        metrics_every=metrics_every, device=device)
    if shardings is not None:
        # spatial ('sp') model parallelism: committed input shardings steer
        # GSPMD's partitioning of the jit'd chunk (parallel/sharding.py::
        # sp_shardings builds the tree; fit_sp is the entry point). A
        # callable receives THIS state as the shape template — fit_sp uses
        # that to avoid a duplicated prepare_fit and any template/actual
        # desync.
        if callable(shardings):
            shardings = shardings(state)
        state = jax.device_put(state, shardings["state"])
        data = {k: (jax.device_put(v, shardings["data"][k])
                    if v is not None else None)
                for k, v in data.items()}

    run_chunk = _get_run_chunk(problem, method.name, optimizer, reparam,
                               compute_dtype, layout)

    n_snaps = num_iter // show_every + 1
    mse_c = np.zeros(num_iter)
    mse_g = np.zeros(num_iter)
    psnrs = np.zeros((num_iter, 3))
    ssims = np.zeros((num_iter, 3))
    recons = np.zeros((n_snaps, mc, h, w), np.float32)
    unc_epi = np.zeros((n_snaps, mc, h, w), np.float32)
    unc_ale = np.zeros((n_snaps, mc, h, w), np.float32)

    chunk = chunk_iters or show_every
    if collect_snapshots and chunk != show_every:
        # with chunk > show_every the device snap buffers would hold only the
        # LAST in-chunk boundary snapshot — intermediate indices of the
        # snapshot stacks would silently stay zero and the stored map would
        # be attributed to the wrong iteration. Sweeps that want long chunks
        # run with collect_snapshots=False.
        raise ValueError(
            "chunk_iters must equal show_every when snapshots are collected; "
            "pass collect_snapshots=False (or plot=False, save=False via the "
            "runners) to use longer chunks")
    n_chunks = -(-num_iter // chunk)  # fixed-length chunks (one compile)

    start_chunk = 0
    if resume and checkpoint_path and os.path.isfile(checkpoint_path):
        state, start_chunk, saved = load_fit_checkpoint(checkpoint_path, state)
        if device is not None:
            state = jax.device_put(state, device)
        for name, dst in (("mse_c", mse_c), ("mse_g", mse_g),
                          ("psnrs", psnrs), ("ssims", ssims),
                          ("recons", recons), ("unc_epi", unc_epi),
                          ("unc_ale", unc_ale)):
            if name in saved:
                src = saved[name]
                dst[:len(src)] = src[:len(dst)]

    t0 = time.perf_counter()
    compile_s = 0.0
    es = _EarlyStop(early_stop) if early_stop else None
    executed = num_iter
    for s in range(start_chunk, n_chunks):
        start = s * chunk
        its = jnp.arange(start, start + chunk, dtype=jnp.int32)
        if s == start_chunk:
            tc = time.perf_counter()
            with _COMPILE_LOCK:
                state, rows = run_chunk(state, its, num_iter, show_every,
                                        hp, data)
            jax.block_until_ready(rows)
            compile_s = time.perf_counter() - tc
        else:
            state, rows = run_chunk(state, its, num_iter, show_every, hp,
                                    data)
        rows = np.asarray(rows)
        end = min(start + chunk, num_iter)
        n = end - start
        mse_c[start:end] = rows[:n, 0]
        mse_g[start:end] = rows[:n, 1]
        psnrs[start:end] = rows[:n, 2:5]
        ssims[start:end] = rows[:n, 5:8]

        # the chunk's first iteration (start) hit a snapshot boundary;
        # snap buffers hold the state right after that iteration
        # (device->host pulls cost ~0.5 s/chunk through a remote tunnel;
        # sweeps/benchmarks disable them via collect_snapshots=False)
        if collect_snapshots and start % show_every == 0 and start < num_iter:
            k = start // show_every
            snap_avg_img = np.asarray(state.snap_avg).reshape(h, w, n_out)
            recons[k] = np.clip(snap_avg_img[..., :mc], 0, 1).transpose(2, 0, 1)
            if method.name != "dip":
                unc_epi[k] = (np.asarray(state.snap_epi)
                              .reshape(h, w, mc).transpose(2, 0, 1))
                if problem.has_ale:
                    unc_ale[k] = (np.asarray(state.snap_ale)
                                  .reshape(h, w, mc).transpose(2, 0, 1))
            if snapshot_fn is not None:
                snapshot_fn(start, recons[k], unc_epi[k], unc_ale[k])
        if log_fn is not None:
            log_fn(end - 1, rows[n - 1])

        if (checkpoint_path and s + 1 < n_chunks
                and (s + 1) % checkpoint_every_chunks == 0):
            save_fit_checkpoint(
                checkpoint_path, jax.device_get(state), s + 1,
                {"mse_c": mse_c, "mse_g": mse_g, "psnrs": psnrs,
                 "ssims": ssims, "recons": recons, "unc_epi": unc_epi,
                 "unc_ale": unc_ale})

        if es is not None and es.should_stop(psnrs[start:end, 2], start):
            executed = end
            for arr in (mse_c, mse_g, psnrs, ssims):
                arr[end:] = np.nan
            break

    total_s = time.perf_counter() - t0
    steady = max(total_s - compile_s, 1e-9)
    # steady-state rate: the first chunk's WALL is inside compile_s, so its
    # ITERATIONS must leave the numerator too — counting them inflated short
    # benchmarks by up to n_chunks/(n_chunks-1) (358 vs a true 247 it/s at 2
    # chunks on the v5e)
    first_iters = min(chunk, num_iter - start_chunk * chunk)
    steady_iters = executed - start_chunk * chunk - first_iters
    iters_per_sec = steady_iters / steady if steady_iters > 0 else 0.0

    valid = np.where(np.isfinite(psnrs[:, 2]))[0]
    final_psnr = float(psnrs[valid[-1], 2]) if len(valid) else float("nan")
    return FitResult(
        mse_corrupted=mse_c, mse_gt=mse_g, psnrs=psnrs, ssims=ssims,
        recons=recons, uncerts_epi=unc_epi, uncerts_ale=unc_ale,
        params=jax.device_get(state.params), net_input=z_np,
        iters_per_sec=iters_per_sec, compile_seconds=compile_s,
        final_psnr=final_psnr, executed=int(executed),
        wall_seconds=float(total_s))


def fit_interleaved(problem: Problem, methods, *, num_iter: int, lr: float,
                    seed: int = 42, rngs=None, show_every: int = 100,
                    metrics_every: int = 1, chunk_iters: Optional[int] = None,
                    reparam: str = "rt", device=None,
                    compute_dtype=jnp.float32, layout: str = "nhwc",
                    early_stop: Optional[dict] = None) -> list:
    """K independent fits of the SAME problem (one per ``methods`` entry)
    time-multiplexed on ONE device via double-buffered async dispatch.

    All fits share one compiled chunk executable (hyperparameters are
    traced); each scan-chunk dispatch is asynchronous, so while the host
    materializes fit j's metric rows the device is already executing the
    other fits' chunks — per-chunk host work (np.asarray of the metric
    block) hides behind device time instead of serializing with it. This is
    the TPU-native replacement for over-subscribing a chip with candidate
    *processes* (the reference round-robins candidates onto GPUs one process
    each, bayesian_optimization.py:3756-3768, paying full per-process model
    setup; here extra candidates per chip cost one TrainState each).

    Sweep-oriented: no snapshot stacks, no checkpointing (use ``fit`` for
    single runs that need artifacts). Each fit consumes the identical PRNG
    stream it would under ``fit`` with the same seed, so results are
    bit-identical to sequential fits. ``rngs`` (optional, one numpy
    Generator per method) replays the per-candidate host-noise stream;
    default: a fresh ``default_rng(seed)`` per fit.

    Returns one FitResult per method (snapshot stacks zero-sized).
    """
    _enable_persistent_compile_cache()

    compute_dtype = resolve_compute_dtype(compute_dtype)
    assert len({m.name for m in methods}) == 1, \
        "interleaved fits must share a method (one compiled executable)"
    num_iter = num_iter + 1  # ref :306
    k_fits = len(methods)
    h, w = problem.imsize
    mc = problem.mean_ch

    states, hps, datas, zs = [], [], [], []
    optimizer = None
    for j, m in enumerate(methods):
        rng = (rngs[j] if rngs is not None
               else np.random.default_rng(seed))
        state, hp, data, z_np, optimizer = prepare_fit(
            problem, m, lr=lr, seed=seed, rng=rng,
            metrics_every=metrics_every, device=device,
            warm_transfer=(j == 0))
        if j > 0:
            # identical across fits by construction — share the big device
            # buffers (gt/target/op_state) instead of K copies
            data = dict(data, gt=datas[0]["gt"], target=datas[0]["target"],
                        mask=datas[0]["mask"], op_state=datas[0]["op_state"])
        states.append(state)
        hps.append(hp)
        datas.append(data)
        zs.append(z_np)

    run_chunk = _get_run_chunk(problem, methods[0].name, optimizer, reparam,
                               compute_dtype, layout)

    chunk = chunk_iters or show_every
    n_chunks = -(-num_iter // chunk)

    mse_c = [np.full(num_iter, np.nan) for _ in range(k_fits)]
    mse_g = [np.full(num_iter, np.nan) for _ in range(k_fits)]
    psnrs = [np.full((num_iter, 3), np.nan) for _ in range(k_fits)]
    ssims = [np.full((num_iter, 3), np.nan) for _ in range(k_fits)]

    active = [True] * k_fits
    executed = [num_iter] * k_fits
    es = [_EarlyStop(early_stop) if early_stop else None
          for _ in range(k_fits)]

    t0 = time.perf_counter()
    compile_s = 0.0
    for s in range(n_chunks):
        start = s * chunk
        its = jnp.arange(start, start + chunk, dtype=jnp.int32)
        pending = []
        if s == 0:
            tc = time.perf_counter()
            # cold compile under the same lock as fit() — device-group
            # threads race XLA executable (de)serialization otherwise
            with _COMPILE_LOCK:
                for j in range(k_fits):
                    if not active[j]:
                        continue
                    states[j], rows = run_chunk(states[j], its, num_iter,
                                                show_every, hps[j], datas[j])
                    pending.append((j, rows))
                if pending:
                    jax.block_until_ready(pending[0][1])
            compile_s = time.perf_counter() - tc
        else:
            for j in range(k_fits):
                if not active[j]:
                    continue
                states[j], rows = run_chunk(states[j], its, num_iter,
                                            show_every, hps[j], datas[j])
                pending.append((j, rows))
        end = min(start + chunk, num_iter)
        n = end - start
        for j, rows in pending:
            rows = np.asarray(rows)   # fit j materializes while j+1.. execute
            mse_c[j][start:end] = rows[:n, 0]
            mse_g[j][start:end] = rows[:n, 1]
            psnrs[j][start:end] = rows[:n, 2:5]
            ssims[j][start:end] = rows[:n, 5:8]
            if es[j] is not None and es[j].should_stop(psnrs[j][start:end, 2],
                                                       start):
                active[j] = False
                executed[j] = end
        if not any(active):
            break

    total_s = time.perf_counter() - t0
    steady = max(total_s - compile_s, 1e-9)

    results = []
    empty = np.zeros((0, mc, h, w), np.float32)
    for j in range(k_fits):
        valid = np.where(np.isfinite(psnrs[j][:, 2]))[0]
        final = float(psnrs[j][valid[-1], 2]) if len(valid) else float("nan")
        results.append(FitResult(
            mse_corrupted=mse_c[j], mse_gt=mse_g[j], psnrs=psnrs[j],
            ssims=ssims[j], recons=empty, uncerts_epi=empty,
            uncerts_ale=empty, params=jax.device_get(states[j].params),
            net_input=zs[j],
            # first-chunk iterations are inside compile_s (see fit):
            # exclude them from the steady-state numerator too
            iters_per_sec=max(executed[j] - min(chunk, num_iter), 0) / steady,
            compile_seconds=compile_s, final_psnr=final,
            executed=int(executed[j]), wall_seconds=float(total_s)))
    return results

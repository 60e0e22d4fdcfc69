"""Candidate -> device fanout: the TPU-native replacement for the reference's
process-per-GPU torch.multiprocessing dispatch (bayesian_optimization.py:
3709-3775).

Design: one *thread* per candidate, round-robined over devices. Threads are
the right unit on TPU — jit dispatch releases the GIL, per-device executions
overlap, and (unlike the reference's spawn-per-candidate) all candidates of a
method share ONE compiled executable (hyperparameters are traced; see
tasks/trainer.py), so a new BO round costs zero recompilation and zero
process startup.

Failure semantics match the reference: a crashed/NaN candidate contributes
nothing — it is logged, filtered, and the sweep continues (:3767-3781).
The reference's NaN filter has an index-shift bug when multiple NaNs occur
(`del candidates_run[i]` while enumerating, :3778-3781); here pairs are
filtered together, correctly.
"""

from __future__ import annotations

import threading
import traceback
from typing import Sequence

import numpy as np

TASK_ALIASES = {
    "denoising": "den", "den": "den",
    "inpainting": "inp", "inp": "inp",
    "super-resolution": "sr", "sr": "sr",
    "ct": "ct",
}

_METHOD_AXES = {
    # ref :3715-3718
    "mfvi": ("temp", "sigma"),
    "mcd": ("dropout_p", "weight_decay"),
    "sgld": ("gamma", "weight_decay"),
    "dip": (),
}


def candidate_kwargs(bayes: str, candidate) -> dict:
    axes = _METHOD_AXES[bayes]
    return {name: float(candidate[i]) for i, name in enumerate(axes)}


def run_candidates_spmd(task: str, bayes: str, candidates: Sequence,
                        run_params: dict, keep_nan: bool = False):
    """SPMD alternative to the thread fanout: all candidates advance as ONE
    jit'd program sharded over a 'cand' mesh axis (parallel/sharding.py::
    run_sweep_spmd, which executes the exact production trainer step per
    slice). Returns (kept_candidates, kept_scores) with NaN candidates
    dropped, like ``run_candidates``."""
    from ..parallel.sharding import run_sweep_spmd
    from ..tasks.problems import build_problem
    from ..tasks.runners import method_for
    from ..tasks.trainer import Method  # noqa: F401  (re-export convenience)

    task = TASK_ALIASES[task]
    rp = dict(run_params)
    rp.pop("bo_results_path", None)
    img = rp.pop("img", 0)
    lr = rp.pop("lr", 3e-4)
    num_iter = rp.pop("num_iter", 5000)
    seed = rp.pop("seed", 42)
    build_kw = {}
    if "p_sigma" in rp:
        build_kw["p_sigma"] = rp.pop("p_sigma")
    if "input_depth" in rp:
        build_kw["input_depth"] = rp.pop("input_depth")
    sweep_kw = {k: rp.pop(k) for k in ("show_every", "metrics_every",
                                       "chunk_iters", "compute_dtype",
                                       "layout", "reparam", "mesh")
                if k in rp}

    methods = [method_for(task, bayes, candidate_kwargs(bayes, c))
               for c in candidates]
    problem = build_problem(task, bayes, img, **build_kw)
    finals, _ = run_sweep_spmd(problem, methods, lr=lr, num_iter=num_iter,
                               seed=seed, **sweep_kw)

    if keep_nan:
        return ([tuple(np.asarray(c, np.float64)) for c in candidates],
                [float(y) for y in finals])

    kept_c, kept_y = [], []
    for cand, y in zip(candidates, finals):
        if np.isfinite(y):
            kept_c.append(tuple(np.asarray(cand, np.float64)))
            kept_y.append(float(y))
        else:
            print(f"[fanout/spmd] candidate {cand} diverged (NaN); dropped",
                  flush=True)
    return kept_c, kept_y


def _run_candidates_sp(task: str, bayes: str, candidates: Sequence,
                       run_params: dict, devices, n_sp: int,
                       keep_nan: bool = False):
    """Undersubscribed fanout: each candidate's fit spatially sharded over
    its own ``n_sp``-device sub-mesh (parallel/sharding.py::fit_sp — GSPMD
    halo exchanges over ICI, equivalence-tested vs the unsharded fit).

    This is the idle-chip recovery mode for the BO sweep's thin rounds: the
    reference's process-per-GPU dispatch (bayesian_optimization.py:3756-3768)
    leaves devices idle whenever a round has fewer candidates than GPUs —
    e.g. 4 candidates on v5e-8, or 1-2 candidates after `find_candidates`
    dedup. Here the spare chips join each fit's 'sp' axis instead."""
    import jax
    from jax.sharding import Mesh

    from ..tasks.problems import build_problem
    from ..tasks.runners import method_for
    from .sharding import fit_sp
    from ..utils.compile_guard import serialize_compiles

    serialize_compiles()

    rp = dict(run_params)
    rp.pop("bo_results_path", None)
    img = rp.pop("img", 0)
    lr = rp.pop("lr", 3e-4)
    num_iter = rp.pop("num_iter", 5000)
    seed = rp.pop("seed", 42)
    build_kw = {k: rp.pop(k) for k in ("p_sigma", "input_depth") if k in rp}
    fit_kw = {k: rp.pop(k) for k in ("show_every", "metrics_every",
                                     "chunk_iters", "compute_dtype",
                                     "layout") if k in rp}

    # one shared problem (read-only across threads; the op_state tensors are
    # placed per-mesh by fit_sp's device_put)
    problem = build_problem(task, bayes, img, **build_kw)
    h, _ = problem.imsize
    if h % n_sp != 0:
        raise ValueError(f"sp_split={n_sp} does not divide image height {h}")

    results = [None] * len(candidates)

    def work(i, cand, group):
        try:
            method = method_for(task, bayes, candidate_kwargs(bayes, cand))
            mesh = Mesh(np.asarray(group), ("sp",))
            res = fit_sp(problem, method, mesh=mesh, num_iter=num_iter,
                         lr=lr, seed=seed, collect_snapshots=False, **fit_kw)
            results[i] = float(res.final_psnr)
        except Exception:
            print(f"[fanout/sp] candidate {cand} failed on {group}:\n"
                  f"{traceback.format_exc()}", flush=True)
            results[i] = float("nan")

    threads = []
    for i, cand in enumerate(candidates):
        group = devices[i * n_sp:(i + 1) * n_sp]
        t = threading.Thread(target=work, args=(i, cand, group), daemon=True)
        t.start()
        threads.append(t)
    for t in threads:
        t.join()

    if keep_nan:
        return ([tuple(np.asarray(c, np.float64)) for c in candidates],
                [float("nan") if y is None else float(y) for y in results])
    kept_c, kept_y = [], []
    for cand, y in zip(candidates, results):
        if y is not None and np.isfinite(y):
            kept_c.append(tuple(np.asarray(cand, np.float64)))
            kept_y.append(float(y))
    return kept_c, kept_y


def run_candidates(task: str, bayes: str, candidates: Sequence,
                   run_params: dict, devices=None, runner=None,
                   use_spmd: bool = False, interleave: str | bool = "auto",
                   sp_split: int | bool = False, keep_nan: bool = False):
    """Evaluate every candidate concurrently; returns
    (kept_candidates, kept_scores) with NaN/crashed candidates dropped.
    ``keep_nan=True`` skips the filter and returns a score for EVERY input
    candidate (NaN for diverged/crashed) — the multi-host fanout needs the
    raw positional results to map scores back to global candidate indices
    (parallel/multihost.py).

    ``devices``: list of jax.Device / "tpu:0"-style strings / None for all
    local devices. ``runner`` overrides the runner callable (tests).
    ``use_spmd=True`` routes through the single-program sharded sweep
    instead of thread-per-candidate dispatch.

    ``interleave``: with more candidates than devices, "auto" (default)
    runs each device's candidate group as ONE interleaved multi-fit
    (tasks/runners.py::run_group_interleaved — double-buffered chunk
    dispatch, host work hidden behind device time) instead of
    over-subscribed threads. False forces thread-per-candidate; True forces
    grouping even at one candidate per device (no-op but exercises the
    path).

    ``sp_split``: with more devices than candidates, an int k >= 2 gives
    every candidate a k-device sub-mesh and spatially shards its fit over
    it (``_run_candidates_sp``); True derives k = n_devices // n_candidates.
    Opt-in (the win depends on image size vs ICI cost — see ROADMAP.md);
    requires k * n_candidates <= n_devices and k | image height."""
    import jax
    from ..tasks.runners import run_task, resolve_device
    from ..utils.compile_guard import serialize_compiles

    if use_spmd and runner is None:
        return run_candidates_spmd(task, bayes, candidates, run_params,
                                   keep_nan=keep_nan)

    if sp_split and runner is None:
        sp_devices = [resolve_device(d)
                      for d in (jax.devices() if devices is None else devices)]
        n_sp = (int(sp_split) if not isinstance(sp_split, bool)
                else len(sp_devices) // max(1, len(candidates)))
        if n_sp >= 2 and n_sp * len(candidates) <= len(sp_devices):
            return _run_candidates_sp(TASK_ALIASES[task], bayes, candidates,
                                      run_params, sp_devices, n_sp,
                                      keep_nan=keep_nan)
        # not enough devices for a >=2-way split: fall through to the
        # standard per-candidate dispatch

    # concurrent cold compiles from fanout threads crash the CPU backend
    # (see utils/compile_guard.py); execution stays fully concurrent
    serialize_compiles()

    task = TASK_ALIASES[task]

    if devices is None:
        devices = jax.devices()
    devices = [resolve_device(d) for d in devices]

    results = [None] * len(candidates)

    oversubscribed = len(candidates) > len(devices)
    if (runner is None and bayes != "dip"
            and (interleave is True
                 or (interleave == "auto" and oversubscribed))):
        groups = {d: [] for d in range(len(devices))}
        for i in range(len(candidates)):
            groups[i % len(devices)].append(i)

        def work_group(dev, idxs):
            from ..tasks.runners import run_group_interleaved
            try:
                finals = run_group_interleaved(
                    task, bayes, [candidates[i] for i in idxs], device=dev,
                    **run_params)
                for i, y in zip(idxs, finals):
                    results[i] = float(y)
            except Exception:
                print(f"[fanout] interleaved group {idxs} failed on {dev}:\n"
                      f"{traceback.format_exc()}", flush=True)
                for i in idxs:
                    results[i] = float("nan")

        threads = []
        for d, idxs in groups.items():
            if not idxs:
                continue
            t = threading.Thread(target=work_group,
                                 args=(devices[d], idxs), daemon=True)
            t.start()
            threads.append(t)
        for t in threads:
            t.join()
    else:
        if runner is None:
            def runner(idx, dev, cand):
                return run_task(task, bayes, index=idx, device=dev,
                                **candidate_kwargs(bayes, cand), **run_params)

        def work(idx, cand, dev):
            try:
                results[idx] = float(runner(idx, dev, cand))
            except Exception:
                print(f"[fanout] candidate {cand} failed on {dev}:\n"
                      f"{traceback.format_exc()}", flush=True)
                results[idx] = float("nan")

        threads = []
        for i, cand in enumerate(candidates):
            dev = devices[i % len(devices)]
            t = threading.Thread(target=work, args=(i, cand, dev),
                                 daemon=True)
            t.start()
            threads.append(t)
        for t in threads:
            t.join()

    if keep_nan:
        return ([tuple(np.asarray(c, np.float64)) for c in candidates],
                [float("nan") if y is None else float(y) for y in results])

    kept_c, kept_y = [], []
    for cand, y in zip(candidates, results):
        if y is not None and np.isfinite(y):
            kept_c.append(tuple(np.asarray(cand, np.float64)))
            kept_y.append(y)
    return kept_c, kept_y

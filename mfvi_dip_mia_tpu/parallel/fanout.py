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


def run_candidates(task: str, bayes: str, candidates: Sequence,
                   run_params: dict, devices=None, runner=None,
                   use_spmd: bool = False, interleave: str | bool = "auto",
                   keep_nan: bool = False):
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
    path)."""
    import jax
    from ..tasks.runners import run_task, resolve_device
    from ..utils.compile_guard import serialize_compiles

    if use_spmd and runner is None:
        return run_candidates_spmd(task, bayes, candidates, run_params,
                                   keep_nan=keep_nan)

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

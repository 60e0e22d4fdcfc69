"""The Bayesian-optimization outer loop (parity: bayesian_optimization.py:
3727-3887) with round-checkpointed state and resume.

Per round: fan candidates out across devices -> filter NaN -> accumulate
(X, Y) -> fit the exact GP -> EI grid + peak search + L-BFGS refinement ->
next candidates -> save ``{round}_fig_data.npz`` (the reference's BO-state
artifact) and optionally the 4 diagnostic figures.

Resume (an addition over the reference, per its own failure-handling gap):
``resume=True`` reloads observed (X, Y) and the next candidates from the
highest-numbered ``*_fig_data.npz`` in ``bo_results_path`` and continues.
"""

from __future__ import annotations

import glob
import itertools
import os
import re
import warnings
from pathlib import Path

import numpy as np

from .acquisition import find_candidates
from .gp import train_gp
from .normalize import normalize_X, unnormalize_X
from ..parallel.fanout import run_candidates, TASK_ALIASES


def _fanout_and_rank():
    """Resolve (fanout_fn, is_main_process). Under ``jax.distributed``
    (process_count > 1) candidates are partitioned across hosts and scores
    allgathered over DCN (parallel/multihost.py); artifacts/prints then
    happen on process 0 only. Single-host resolves the module-global
    ``run_candidates`` at call time so tests/tools can monkeypatch it."""
    import jax

    if jax.process_count() > 1:
        from ..parallel.multihost import run_candidates_multihost
        return run_candidates_multihost, jax.process_index() == 0
    return run_candidates, True


def _grid(p1_logbounds, p2_logbounds, n=100):
    x1 = np.logspace(p1_logbounds[0], p1_logbounds[1], n)
    x2 = np.logspace(p2_logbounds[0], p2_logbounds[1], n)
    xx1, xx2 = np.meshgrid(x1, x2, indexing="ij")  # torch.meshgrid default
    grid = np.stack([xx1.reshape(-1), xx2.reshape(-1)], axis=1)
    return xx1, xx2, grid


def _load_resume_state(bo_out_path):
    files = glob.glob(os.path.join(bo_out_path, "*_fig_data.npz"))
    if not files:
        return None
    rounds = [(int(re.match(r"(\d+)_fig_data", os.path.basename(f)).group(1)),
               f) for f in files if re.match(r"\d+_fig_data",
                                             os.path.basename(f))]
    if not rounds:
        return None
    k, path = max(rounds)
    z = np.load(path)
    return {
        "round": k + 1,
        "X": [tuple(row) for row in z["observed_X"]],
        "Y": list(z["observed_Y"]),
        "candidates": [tuple(row) for row in z["candidates"]],
    }


def evaluate_candidates(task, bayes, bo_params, run_params, runner=None):
    """Single-round fixed-candidate evaluation (eval_result.py:19-58 parity).
    Returns (candidates, psnrs) and prints the table."""
    run_params = dict(run_params)
    run_params.pop("bo_results_path", None)
    devices = run_params.pop("devices", None)
    names = list(bo_params.keys())
    candidates = list(itertools.product(
        *[v["candidates"] for v in bo_params.values()]))
    fanout_fn, is_main = _fanout_and_rank()
    kept_c, kept_y = fanout_fn(task, bayes, candidates, run_params,
                               devices, runner=runner)
    if is_main:
        print()
        print(f"{names[0]}      {names[1] if len(names) > 1 else ''}"
              "       psnr")
        for c, y in zip(kept_c, kept_y):
            print("  ".join(f"{v:.6f}" for v in c) + f"  {y:.6f}")
    return kept_c, kept_y


def bo(task: str, bayes: str, bo_params: dict, run_params: dict,
       n_rounds: int = 20, acq_fn: str = "ei", plot: bool = True,
       resume: bool = False, runner=None, gp_iters: int = 2000,
       use_spmd: bool = False, sp_split: int | bool = False,
       screen_iters: int | None = None):
    """Run the full BO sweep. Returns (X, Y) of all observations.

    ``use_spmd=True`` evaluates each round's candidates as one SPMD program
    sharded over a 'cand' mesh axis (parallel/sharding.py::run_sweep_spmd)
    instead of thread-per-candidate dispatch. ``sp_split`` (opt-in) lets
    rounds with fewer candidates than devices spatially shard each fit over
    the spare chips (fanout.run_candidates sp_split semantics).

    ``screen_iters`` (opt-in; the measured <1h sweep mode): run every BO
    round's candidate fits at this reduced budget. NOTE the mechanism
    precisely: the GP is fit on the screened PSNR *values* (they are
    appended to Y below), which at a reduced budget sit 1-2 dB below their
    full-budget values — so the GP posterior, the N(15,4) mean prior's pull
    and EI all see shifted observations, not just a reordering. The mode's
    evidence is therefore two-fold: (a) per-candidate ranking stability vs
    budget (bo_results/mfvi_ct_timed/rank_vs_budget.json: top-1 stable from
    30k, FULL ranking from 40k of 100k on bo_mfvi_ct — hence the 0.4x floor
    warning below), and (b) a sweep-level same-winner A/B of a screened vs a
    fixed-budget sweep with identical seeds
    (bo_results/screen_ab/screen_ab.json). After the rounds, the incumbent
    best candidate is CONFIRMED with ONE fit at the full
    ``run_params.num_iter`` budget, so the sweep's reported optimum (best
    hyperparams + their full-budget smoothed PSNR, ref
    bayesian_optimization.py:1444) is evaluated exactly as the reference's
    fixed-budget sweep evaluates it. The confirmed observation is recorded
    in ``screen_confirm.json`` and returned separately (NOT appended to the
    screened (X, Y) — mixing budgets would bias any downstream GP refit).
    Off by default (reference parity: every fit at the full budget)."""
    task = TASK_ALIASES[task]
    run_params = dict(run_params)
    bo_out_path = run_params.pop("bo_results_path")
    Path(bo_out_path).mkdir(parents=True, exist_ok=True)
    devices = run_params.pop("devices", None)
    full_iters = run_params.get("num_iter", 5000)
    if screen_iters is not None:
        if screen_iters >= full_iters:
            raise ValueError(f"screen_iters={screen_iters} must be < "
                             f"num_iter={full_iters}")
        if screen_iters < 0.4 * full_iters:
            # evidence floor: full-ranking budget stability is measured only
            # from 40% of the full budget on bo_mfvi_ct
            # (rank_vs_budget.json: full-rank match from 40k of 100k;
            # top-1-only from 30k). Below it you are outside the evidence.
            warnings.warn(
                f"screen_iters={screen_iters} is below the measured "
                f"ranking-stability floor of 0.4*num_iter="
                f"{int(0.4 * full_iters)} (bo_results/mfvi_ct_timed/"
                "rank_vs_budget.json); screened observations may reorder "
                "vs the full budget", stacklevel=2)
        run_params["num_iter"] = int(screen_iters)

    (p1_logbounds, p2_logbounds) = [v["logbounds"] for v in bo_params.values()]
    xx1, xx2, grid_unnorm = _grid(p1_logbounds, p2_logbounds)
    grid_norm = normalize_X(grid_unnorm, p1_logbounds, p2_logbounds)

    candidates = list(itertools.product(
        *[v["candidates"] for v in bo_params.values()]))
    X, Y = [], []
    start_round = 0

    fanout_fn, is_main = _fanout_and_rank()

    if resume:
        state = _load_resume_state(bo_out_path)
        if state is not None:
            X, Y = state["X"], state["Y"]
            candidates = state["candidates"]
            start_round = state["round"]
            if is_main:
                print(f"[bo] resuming from round {start_round} "
                      f"({len(X)} observations)")
        from ..parallel.multihost import check_resume_consistency
        check_resume_consistency(start_round)

    names = list(bo_params.keys())
    for runs_num in range(start_round, n_rounds):
        kept_c, kept_y = fanout_fn(task, bayes, candidates, run_params,
                                   devices, runner=runner,
                                   use_spmd=use_spmd, sp_split=sp_split)
        if is_main:
            print()
            print(f"{names[0]}      {names[1]}       psnr")
            for c, y in zip(kept_c, kept_y):
                print(f"{c[0]:.6f}  {c[1]:.6f}  {y:.6f}")

        X += kept_c
        Y += kept_y
        if not X:
            raise RuntimeError("all candidates failed in round "
                               f"{runs_num}; nothing to fit")

        x_train = normalize_X(np.asarray(X, np.float64), p1_logbounds,
                              p2_logbounds)
        y_train = np.asarray(Y, np.float64)
        gp = train_gp(x_train, y_train, iter_max=gp_iters)

        cand_norm, exp_imp, acq = find_candidates(gp, grid_norm, x_train,
                                                  acq_fn)
        candidates = [tuple(row) for row in
                      unnormalize_X(cand_norm, p1_logbounds, p2_logbounds)]

        if is_main:
            pred_mean, pred_var = (np.asarray(a)
                                   for a in gp.predict(grid_norm))
            # gpytorch confidence_region width
            confidence = 4.0 * np.sqrt(pred_var)
            np.savez(
                os.path.join(bo_out_path, f"{runs_num}_fig_data.npz"),
                XX_lr=xx1, XX_wd=xx2,
                pred=pred_mean.reshape(100, 100),
                observed_X=np.asarray(X), observed_Y=np.asarray(Y),
                expected_improvement=np.asarray(exp_imp),
                confidence=confidence.reshape(100, 100),
                acq=acq.reshape(100, 100),
                candidates=np.asarray(candidates),
            )

            if plot:
                _round_figures(bo_out_path, runs_num, xx1, xx2,
                               pred_mean.reshape(100, 100),
                               confidence.reshape(100, 100),
                               acq.reshape(100, 100), np.asarray(X),
                               np.asarray(candidates), exp_imp)
            print(f"[bo] round {runs_num} done: best psnr so far "
                  f"{max(Y):.3f}; gp {gp.hyperparams}")

    confirm_path = os.path.join(bo_out_path, "screen_confirm.json")
    if screen_iters is not None and X and os.path.exists(confirm_path):
        # resume on an already-completed screened sweep: the expensive
        # full-budget confirm already ran — don't re-run it
        if is_main:
            print(f"[bo] screen confirm already recorded at {confirm_path}; "
                  "skipping re-confirm")
    elif screen_iters is not None and X:
        # confirm the screened winner at the FULL budget (one fit) — the
        # sweep's reported optimum is then a true fixed-budget observation.
        # The confirm row is persisted to screen_confirm.json, NOT appended
        # to the screened (X, Y): the observation set must stay
        # single-budget or a downstream GP refit would see the winner twice
        # at inconsistent budgets.
        best_idx = int(np.argmax(Y))
        best_cand = X[best_idx]
        confirm_rp = dict(run_params)
        confirm_rp["num_iter"] = int(full_iters)
        kept_c, kept_y = fanout_fn(task, bayes, [best_cand], confirm_rp,
                                   devices, runner=runner,
                                   use_spmd=use_spmd, sp_split=sp_split)
        if kept_c and is_main:
            import json as _json
            with open(confirm_path, "w") as f:
                _json.dump({
                    "screen_iters": int(screen_iters),
                    "full_iters": int(full_iters),
                    "best_candidate": [float(v) for v in best_cand],
                    "screened_psnr": float(Y[best_idx]),
                    "confirmed_psnr": float(kept_y[0]),
                }, f, indent=2)
            print(f"[bo] screen winner {best_cand} confirmed at "
                  f"{full_iters} iters: {kept_y[0]:.3f} "
                  f"(screened {Y[best_idx]:.3f})")

    return X, Y


def _round_figures(out, k, xx1, xx2, pred, conf, acq, observed, candidates,
                   exp_imp):
    """The reference's 4 per-round diagnostic figures (:3816-3874)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib import cm

    def contour(data, points, title, fname, label):
        fig, ax = plt.subplots()
        ln = ax.contourf(xx1, xx2, data)
        if len(points):
            ax.plot(points[:, 0], points[:, 1], "g.", label=label)
        ax.set_title(title)
        fig.colorbar(ln, ax=ax)
        ax.set_xlabel("beta")
        ax.set_ylabel("tau")
        ax.loglog()
        fig.tight_layout()
        fig.savefig(os.path.join(out, fname), bbox_inches="tight")
        plt.close(fig)

    contour(pred, observed, f"{k} mean acc", f"{k}_fig1.pdf", "observed")
    contour(conf, observed, f"{k} uncertainty", f"{k}_fig2.pdf", "observed")
    contour(acq, candidates, f"{k} acq_fun", f"{k}_fig3.pdf", "candidates")

    fig4, ax4 = plt.subplots(subplot_kw={"projection": "3d"})
    ax4.plot_surface(np.log10(xx1), np.log10(xx2), acq, cmap=cm.jet,
                     linewidth=0, antialiased=False)
    if len(candidates):
        ax4.plot(np.log10(candidates[:, 0]), np.log10(candidates[:, 1]),
                 exp_imp, "gx")
    ax4.set_title(f"{k} acq_fun")
    fig4.tight_layout()
    fig4.savefig(os.path.join(out, f"{k}_fig4.pdf"), bbox_inches="tight")
    plt.close(fig4)

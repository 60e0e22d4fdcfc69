"""Timed, scaled bo_mfvi_ct sweep — the north-star wall-clock artifact.

Runs the REAL BO loop (configs/bo_mfvi_ct.json bounds/candidates, the exact
GP + acquisition + fanout path ``bo()`` uses) at a scaled iteration budget on
the available device(s), times every phase, and prints the extrapolation
arithmetic to the full-scale sweep (20 rounds x 4 candidates x 100k iters on
v5e-8, reference workload bayesian_optimization.py:3727-3887).

Extrapolation model (documented in ROADMAP.md):
  full_wall = 20 * (100_000 / single_fit_rate) + 20 * overhead_round
On v5e-8 the 4 candidates spread one-per-chip, so a round's fanout wall is
ONE fit and the per-fit rate is the SINGLE-fit rate — measured here
directly with a dedicated 1-candidate fit after the sweep (the sweep's own
fanout seconds are K-candidates-interleaved-on-one-chip aggregate numbers,
which do NOT extrapolate to the spread-out case). overhead_round = GP fit +
acquisition + problem build, measured per round.

Usage:
    python scripts/timed_sweep.py [--rounds 6] [--iters 2000] [--out DIR]
                                  [--interleave|--no-interleave] [--spmd]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=6)
    ap.add_argument("--iters", type=int, default=2000)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--out", default="bo_results/mfvi_ct_timed")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--layout", default="auto", choices=["nhwc", "auto"])
    ap.add_argument("--interleave", dest="interleave", action="store_true",
                    default=True)
    ap.add_argument("--no-interleave", dest="interleave",
                    action="store_false")
    ap.add_argument("--early-stop", action="store_true",
                    help="opt-in early-stop variant (parity deviation)")
    ap.add_argument("--screen-iters", type=int, default=None,
                    help="FULL-SCALE screening budget for the projection "
                         "(e.g. 50000): rounds screened at this budget + one "
                         "100k confirm fit (bo(screen_iters=...)); the "
                         "scaled run exercises the real screened path at "
                         "iters//2. Rank-fidelity evidence: "
                         "rank_vs_budget.json")
    args = ap.parse_args(argv)

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from mfvi_dip_mia_tpu.utils.prng import configure as configure_prng
    configure_prng()

    import mfvi_dip_mia_tpu.tasks.data as D
    import mfvi_dip_mia_tpu.tasks.problems as P
    from mfvi_dip_mia_tpu.bo.loop import bo
    from mfvi_dip_mia_tpu.parallel import fanout
    from mfvi_dip_mia_tpu.utils.config import load_config

    size = args.size
    P.D.get_img_ct = lambda img: (D.synthetic_ct(img, size), (size, size))

    cfg = load_config("configs/bo_mfvi_ct.json")
    bo_params = {k: {"logbounds": v.logbounds, "candidates": v.candidates}
                 for k, v in cfg.bo_params.items()}
    run_params = dict(cfg.run_params)
    chunk = min(500, args.iters)  # sweep setting, bounded for tiny smokes
    # align num_iter+1 (trainer's ref-parity +1) to whole chunks: a partial
    # final chunk still EXECUTES its masked iterations, deflating measured
    # it/s by up to chunk/num_iter (bench.py does the same)
    args.iters = -(-(args.iters + 1) // chunk) * chunk - 1
    run_params.update(
        num_iter=args.iters, show_every=chunk, metrics_every=10,
        chunk_iters=chunk, plot=False, save=False,
        compute_dtype="bf16", layout=args.layout,
        bo_results_path=args.out, devices=None)
    if args.early_stop:
        run_params["early_stop"] = {"patience": max(args.iters // 4, 500),
                                    "min_delta": 0.05}

    os.makedirs(args.out, exist_ok=True)
    phases = []

    orig_rc = fanout.run_candidates

    def timed_rc(task, bayes, candidates, rp, devices=None, runner=None,
                 use_spmd=False, interleave="auto", **kw):
        t0 = time.perf_counter()
        out = orig_rc(task, bayes, candidates, rp, devices, runner,
                      use_spmd, "auto" if args.interleave else False, **kw)
        phases.append({"phase": "fanout", "n_cand": len(candidates),
                       "num_iter": int(rp.get("num_iter", args.iters)),
                       "seconds": time.perf_counter() - t0})
        return out

    import mfvi_dip_mia_tpu.bo.loop as loop_mod
    loop_mod.run_candidates = timed_rc

    # per-round host-side overhead breakdown (GP fit + acquisition): these
    # run pinned to the host CPU (bo/gp.py::host_cpu) — on the remote TPU
    # relay the eager per-step dispatch alternative measured 146 s/train_gp
    orig_train_gp = loop_mod.train_gp
    orig_fc = loop_mod.find_candidates

    def timed_train_gp(*a, **kw):
        t0 = time.perf_counter()
        out = orig_train_gp(*a, **kw)
        phases.append({"phase": "gp", "seconds": time.perf_counter() - t0})
        return out

    def timed_fc(*a, **kw):
        t0 = time.perf_counter()
        out = orig_fc(*a, **kw)
        phases.append({"phase": "acq", "seconds": time.perf_counter() - t0})
        return out

    loop_mod.train_gp = timed_train_gp
    loop_mod.find_candidates = timed_fc

    # scaled screened path: exercise the REAL bo(screen_iters=...) control
    # flow (screened rounds + full-budget confirm) at half the scaled budget
    scaled_screen = None
    if args.screen_iters is not None:
        # align to whole chunks like args.iters above, so the per-entry
        # num_iter recorded in phases equals the iterations that execute
        scaled_screen = max(((args.iters + 1) // 2 // chunk) * chunk - 1,
                            chunk - 1)
        if scaled_screen >= args.iters:  # tiny single-chunk smokes
            scaled_screen = max((args.iters + 1) // 2 - 1, 1)

    t_all = time.perf_counter()
    X, Y = bo("ct", "mfvi", bo_params, run_params, n_rounds=args.rounds,
              plot=False, screen_iters=scaled_screen)
    wall = time.perf_counter() - t_all

    fan_entries = [p for p in phases if p["phase"] == "fanout"]
    fan = [p["seconds"] for p in fan_entries]
    n_cand = [p["n_cand"] for p in fan_entries]
    overhead = wall - sum(fan)
    # the screened mode's confirm fit adds one fanout entry beyond the
    # rounds; overhead is per ROUND either way
    per_round_overhead = overhead / max(args.rounds, 1)
    # steady-state per-round fanout (drop round 0: compile + cache warmup).
    # Each entry is normalized by ITS OWN executed iteration count
    # (num_iter+1): in screened mode rounds run at ~half budget while the
    # confirm entry runs at full — dividing everything by args.iters+1
    # overstated the aggregate rate ~2x (ADVICE r4).
    steady = fan_entries[1:] or fan_entries
    total_cand_iters = sum(p["n_cand"] * (p["num_iter"] + 1) for p in steady)
    sec_per_cand_iter = sum(p["seconds"] for p in steady) / total_cand_iters
    # one-chip aggregate rate over however many candidates ran concurrently
    agg_rate = 1.0 / sec_per_cand_iter

    # v5e-8 projection: 4 candidates spread one-per-chip -> each fit runs
    # ALONE, so the round's fanout wall is ONE fit at the SINGLE-fit rate.
    # agg_rate above is K-interleaved-on-one-chip aggregate throughput and
    # does NOT extrapolate; measure the single-fit rate directly (compile
    # already cached from the sweep).
    from mfvi_dip_mia_tpu.tasks.trainer import Method, fit
    import mfvi_dip_mia_tpu.tasks.runners as R
    problem = R.build_problem("ct", "mfvi", run_params.get("img", 0),
                              input_depth=run_params.get("input_depth", 16))
    res1 = fit(problem, Method(name="mfvi", temp=2.2e-10, sigma=1.7e-7),
               num_iter=args.iters, lr=run_params.get("lr", 1e-3), seed=1,
               show_every=chunk, metrics_every=10, chunk_iters=chunk,
               collect_snapshots=False, layout=args.layout,
               compute_dtype="bf16")
    single_fit_rate = float(res1.iters_per_sec)

    n_rounds_full, iters_full = 20, 100_000
    proj = (n_rounds_full * (iters_full / single_fit_rate)
            + n_rounds_full * per_round_overhead)

    result = {
        "measured": {
            "rounds": args.rounds, "iters": args.iters,
            "wall_seconds": wall,
            "fanout_seconds": fan, "candidates_per_round": n_cand,
            "per_round_overhead_s": per_round_overhead,
            "gp_seconds": [p["seconds"] for p in phases
                           if p["phase"] == "gp"],
            "acq_seconds": [p["seconds"] for p in phases
                            if p["phase"] == "acq"],
            "aggregate_cand_iters_per_sec": agg_rate,
            "single_fit_iters_per_sec": single_fit_rate,
            "interleave": args.interleave,
            "early_stop": args.early_stop,
            "layout": args.layout,
            "devices": [str(d) for d in jax.devices()],
            "best_psnr": float(max(Y)) if Y else None,
        },
        "projection_v5e8": {
            "model": "20 * (100k / single_fit_rate) + 20 * overhead "
                     "(4 candidates spread 1-per-chip on 8 chips; round "
                     "wall = one fit; single_fit_rate measured directly)",
            "projected_wall_seconds": proj,
            "projected_wall_hours": proj / 3600.0,
        },
    }
    if args.screen_iters is not None:
        # screened-mode projection: every quantity measured on this chip —
        # single_fit_rate (above), per-round host overhead (above), the
        # screening budget's rank fidelity (rank_vs_budget.json: top-1 at
        # the screening budget == top-1 at 100k for every candidate class)
        proj_screen = (n_rounds_full * (args.screen_iters / single_fit_rate)
                       + iters_full / single_fit_rate
                       + n_rounds_full * per_round_overhead)
        result["projection_v5e8_screened"] = {
            "model": f"20 * ({args.screen_iters} / single_fit_rate) + "
                     "100k / single_fit_rate (confirm fit) + 20 * overhead; "
                     "bo(screen_iters) exercised by this run at the scaled "
                     "budget (screen_confirm.json)",
            "screen_iters": args.screen_iters,
            "rank_fidelity_evidence": "bo_results/mfvi_ct_timed/"
                                      "rank_vs_budget.json",
            "projected_wall_seconds": proj_screen,
            "projected_wall_hours": proj_screen / 3600.0,
        }
    with open(os.path.join(args.out, "timing.json"), "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()

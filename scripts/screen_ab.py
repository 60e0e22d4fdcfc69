"""Sweep-level screened-vs-fixed-budget BO A/B (VERDICT r4 weak #1).

The screened mode's prior evidence (rank_vs_budget.json) showed per-candidate
RANKING stability vs budget for 5 fixed candidates — but ``bo(screen_iters)``
fits the GP on the screened PSNR *values* (1-2 dB below their full-budget
values), which shifts the posterior, the N(15,4) mean prior's pull and EI.
This script produces the missing sweep-level evidence: TWO production-shaped
20-round BO sweeps on the CT MFVI workload with identical seeds/config —
one fixed-budget, one screened at the 0.4x evidence floor + full-budget
confirm — and records whether they land on the same winner, plus how their
GP observation trajectories diverge.

Budgets are scaled (default 10k full / 4k screened, same 0.4 ratio as the
production 40k/100k floor) so both sweeps fit one chip in ~1 h; the artifact
records the scaling.

Usage:
    python scripts/screen_ab.py [--out bo_results/screen_ab]
        [--rounds 20] [--iters 10000] [--size 256] [--resume]

Writes {out}/fixed/ and {out}/screened/ (full bo() artifacts, resumable)
and {out}/screen_ab.json (the committed comparison).
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
    ap.add_argument("--out", default="bo_results/screen_ab")
    ap.add_argument("--rounds", type=int, default=20)
    ap.add_argument("--iters", type=int, default=10_000,
                    help="full-budget num_iter (screened = 0.4x this)")
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--layout", default="auto")
    args = ap.parse_args(argv)

    from mfvi_dip_mia_tpu.utils.prng import configure as configure_prng
    configure_prng()

    import mfvi_dip_mia_tpu.tasks.data as D
    import mfvi_dip_mia_tpu.tasks.problems as P
    from mfvi_dip_mia_tpu.bo.loop import bo
    from mfvi_dip_mia_tpu.utils.config import load_config

    size = args.size
    P.D.get_img_ct = lambda img: (D.synthetic_ct(img, size), (size, size))

    cfg = load_config("configs/bo_mfvi_ct.json")
    bo_params = {k: {"logbounds": v.logbounds, "candidates": v.candidates}
                 for k, v in cfg.bo_params.items()}

    chunk = min(500, args.iters)
    full_iters = -(-(args.iters + 1) // chunk) * chunk - 1
    screen = max((int(0.4 * (full_iters + 1)) // chunk) * chunk - 1,
                 chunk - 1)

    def rp(path):
        out = dict(cfg.run_params)
        out.update(num_iter=full_iters, show_every=chunk, metrics_every=10,
                   chunk_iters=chunk, plot=False, save=False,
                   compute_dtype="bf16", layout=args.layout,
                   bo_results_path=path, devices=None)
        return out

    results = {}
    for mode, screen_iters in (("fixed", None), ("screened", screen)):
        path = os.path.join(args.out, mode)
        os.makedirs(path, exist_ok=True)
        t0 = time.perf_counter()
        X, Y = bo("ct", "mfvi", bo_params, rp(path), n_rounds=args.rounds,
                  plot=False, resume=args.resume, screen_iters=screen_iters)
        wall = time.perf_counter() - t0
        best = int(max(range(len(Y)), key=lambda i: Y[i]))
        rec = {"wall_seconds": round(wall, 1),
               "n_observations": len(Y),
               "best_candidate": [float(v) for v in X[best]],
               "best_psnr": float(Y[best]),
               "observations_X": [[float(v) for v in x] for x in X],
               "observations_Y": [float(y) for y in Y]}
        if mode == "screened":
            with open(os.path.join(path, "screen_confirm.json")) as f:
                rec["confirm"] = json.load(f)
        results[mode] = rec
        print(f"[ab] {mode}: winner {rec['best_candidate']} "
              f"psnr {rec['best_psnr']:.3f} wall {wall:.0f}s", flush=True)

    # the screened sweep's ANSWER is its confirmed winner (full-budget fit);
    # compare against the fixed sweep's winner in log10 hyperparam space
    import numpy as np
    fx = np.log10(results["fixed"]["best_candidate"])
    sx = np.log10(results["screened"]["confirm"]["best_candidate"])
    names = list(bo_params.keys())
    spans = [abs(bo_params[n]["logbounds"][1] - bo_params[n]["logbounds"][0])
             for n in names]
    rel = [abs(float(f - s)) / sp for f, s, sp in zip(fx, sx, spans)]
    # winners "the same" when they coincide within 5% of each log10 axis
    # (BO proposals are continuous; exact-equality would be meaningless)
    same_winner = all(r < 0.05 for r in rel)

    comparison = {
        "schema": "screen_ab_v1",
        "workload": f"ct/mfvi {size}^2, configs/bo_mfvi_ct.json grid/bounds",
        "rounds": args.rounds,
        "full_iters": full_iters,
        "screen_iters": screen,
        "scaling_note": "budgets scaled from the production 100k/40k at the "
                        "same 0.4 screening ratio so both sweeps fit one "
                        "chip; seeds/config identical across arms",
        "fixed": {k: v for k, v in results["fixed"].items()},
        "screened": {k: v for k, v in results["screened"].items()},
        "log10_axis_names": names,
        "winner_log10_gap_fraction_of_bounds": [round(r, 4) for r in rel],
        "same_winner_within_5pct_of_log_bounds": bool(same_winner),
        "winner_psnr_gap_db": round(
            abs(results["fixed"]["best_psnr"]
                - results["screened"]["confirm"]["confirmed_psnr"]), 3),
    }
    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, "screen_ab.json"), "w") as f:
        json.dump(comparison, f, indent=2)
    print(json.dumps({k: comparison[k] for k in
                      ("same_winner_within_5pct_of_log_bounds",
                       "winner_psnr_gap_db",
                       "winner_log10_gap_fraction_of_bounds")}))


if __name__ == "__main__":
    main()

"""Rank-fidelity vs iteration budget: the measured basis for the screened
BO mode (bo(screen_iters=...) + full-budget confirm fit).

Runs the 5 CT MFVI candidate classes (bo_mfvi_ct grid corners + pinned
optimum) at the FULL 100k budget with dense PSNR traces, then reports, for
every candidate and budget b in {10k..100k}: smoothed PSNR at b, plus
whether the top-1 candidate and the full ranking at b match the 100k
ranking. BO only consumes the RANKING (the GP is refit per round on
relative observations; the final answer is the best candidate confirmed at
the full budget), so the smallest b with stable top-1/ranking is the
measured screening budget. Ref objective: bayesian_optimization.py:1444
(final smoothed PSNR at the configured budget).

Usage: python scripts/rank_vs_budget.py [--out FILE]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=100_000)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--out", default="bo_results/mfvi_ct_timed/rank_vs_budget.json")
    args = ap.parse_args(argv)

    from mfvi_dip_mia_tpu.utils.prng import configure as configure_prng
    configure_prng()
    import mfvi_dip_mia_tpu.tasks.data as D
    import mfvi_dip_mia_tpu.tasks.problems as P
    from mfvi_dip_mia_tpu.tasks import build_problem
    from mfvi_dip_mia_tpu.tasks.trainer import Method, fit

    size = args.size
    P.D.get_img_ct = lambda img: (D.synthetic_ct(img, size), (size, size))
    problem = build_problem("ct", "mfvi", 0, input_depth=16)

    candidates = [
        ("grid_hi_hi", 1e-4, 1e-1),
        ("grid_hi_lo", 1e-4, 1e-6),
        ("grid_lo_hi", 1e-7, 1e-1),
        ("grid_lo_lo", 1e-7, 1e-6),
        ("optimum", 2.2e-10, 1.7e-7),
    ]
    chunk = 500
    iters = -(-(args.iters + 1) // chunk) * chunk - 1

    traces = {}
    rates = {}
    for i, (name, temp, sigma) in enumerate(candidates):
        res = fit(problem, Method(name="mfvi", temp=temp, sigma=sigma),
                  num_iter=iters, lr=1e-3, seed=1, show_every=chunk,
                  metrics_every=100, chunk_iters=chunk,
                  collect_snapshots=False, layout="auto",
                  compute_dtype="bf16")
        traces[name] = res.psnrs[:, 2]
        rates[name] = float(res.iters_per_sec)
        print(name, "final", round(float(res.final_psnr), 3),
              "rate", round(rates[name], 1), flush=True)

    budgets = list(range(10_000, args.iters + 1, 10_000))
    names = [c[0] for c in candidates]

    def psnr_at(tr, b):
        idx = np.where(np.isfinite(tr[:b]))[0]
        return float(tr[idx[-1]]) if len(idx) else float("nan")

    rows = []
    full_rank = None
    for b in budgets:
        vals = {n: psnr_at(traces[n], b) for n in names}
        rank = sorted(names, key=lambda n: -vals[n])
        rows.append({"budget": b, "psnr": {n: round(vals[n], 3) for n in names},
                     "ranking": rank})
    full_rank = rows[-1]["ranking"]
    for r in rows:
        r["top1_matches_full"] = (r["ranking"][0] == full_rank[0])
        r["rank_matches_full"] = (r["ranking"] == full_rank)

    out = {"workload": f"ct/mfvi {size}^2 45ang bf16/auto seed=1, "
                       f"{iters} iters, metrics_every=100",
           "full_ranking": full_rank,
           "single_fit_iters_per_sec": rates,
           "budget_rows": rows,
           # dense traces (every 100th iter) for re-analysis
           "traces_every_100": {n: [None if not np.isfinite(v) else round(float(v), 3)
                                    for v in traces[n][::100]] for n in names}}
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f)
    for r in rows:
        print(r["budget"], r["ranking"][0], r["top1_matches_full"],
              r["rank_matches_full"], flush=True)


if __name__ == "__main__":
    main()

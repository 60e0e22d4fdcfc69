"""Full-scale early-stop A/B evidence: CT MFVI at the REAL 100k-iteration
budget (the bo_mfvi_ct workload, ref bayesian_optimization.py:3756 +
bo_configs/bo_mfvi_ct.json:14-15), one fit per candidate, each run twice —
fixed budget vs early_stop={patience 5000, min_delta 0.05} — on the v5e chip.

Measures, per candidate: final smoothed PSNR both ways (the BO objective,
ref :648), the stop iteration, and single-fit it/s. This is the
quality-gate evidence for the early-stop BO mode (VERDICT r4 item 2): the
gate is sound iff |psnr_es - psnr_full| is within BO noise for every
candidate class the sweep visits (initial grid corners + the BO optimum).

Usage: python scripts/es_fullscale_ab.py [--iters 100000] [--out FILE]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=100_000)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--patience", type=int, default=5000)
    ap.add_argument("--min-delta", type=float, default=0.05)
    ap.add_argument("--out", default="bo_results/mfvi_ct_timed/es_fullscale_ab.json")
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

    # initial grid corners of configs/bo_mfvi_ct.json + the pinned optimum
    # (configs/test_mfvi_ct.json) — the candidate classes a sweep visits
    candidates = [
        ("grid_hi_hi", 1e-4, 1e-1),
        ("grid_hi_lo", 1e-4, 1e-6),
        ("grid_lo_hi", 1e-7, 1e-1),
        ("grid_lo_lo", 1e-7, 1e-6),
        ("optimum", 2.2e-10, 1.7e-7),
    ]
    chunk = 500
    # align to whole chunks (trainer runs num_iter+1 iterations)
    iters = -(-(args.iters + 1) // chunk) * chunk - 1
    es_spec = {"patience": args.patience, "min_delta": args.min_delta}

    rows = []
    for i, (name, temp, sigma) in enumerate(candidates):
        method = Method(name="mfvi", temp=temp, sigma=sigma)
        row = {"candidate": name, "temp": temp, "sigma": sigma}
        for mode, es in (("full", None), ("es", es_spec)):
            res = fit(problem, method, num_iter=iters, lr=1e-3,
                      seed=1,  # the sweep's run_params seed
                      show_every=chunk, metrics_every=100, chunk_iters=chunk,
                      collect_snapshots=False, layout="auto",
                      compute_dtype="bf16", early_stop=es)
            row[mode] = {
                "final_psnr": round(float(res.final_psnr), 3),
                "executed_iters": int(res.executed),
                "iters_per_sec": round(float(res.iters_per_sec), 1),
                "wall_seconds": round(float(res.wall_seconds), 1),
            }
            print(name, mode, json.dumps(row[mode]), flush=True)
        row["delta_psnr"] = round(row["es"]["final_psnr"]
                                  - row["full"]["final_psnr"], 3)
        row["stop_fraction"] = round(row["es"]["executed_iters"]
                                     / row["full"]["executed_iters"], 3)
        rows.append(row)

    out = {"workload": f"ct/mfvi {size}^2, 45 angles, {iters} iters, "
                       "bf16/auto, metrics_every=100, chunk=500",
           "early_stop": es_spec, "rows": rows}
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()

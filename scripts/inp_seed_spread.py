"""Seed-spread evidence for the one-sided inpainting parity rows
(VERDICT r4 weak #2 / round-5 item 3).

Round-5 established the deficit is NOT semantics: the 6-scale transplant
forward golden passes (tests/test_skip.py) and a deterministic lockstep
(transplanted weights, fixed input, jitter off) reproduces torch's
per-iteration trajectory to 1e-5 dB. What remains is the stochastic draw
(init + input z + jitter + dropout streams). This script measures OUR
seed spread at the parity budgets, and optionally extra ORACLE seeds, so
the recorded single-seed deltas can be judged against the seed noise.

Usage:
  MFVI_DIP_SPREAD_TPU=1 python scripts/inp_seed_spread.py --method dip \
      --seeds 1 2 3 7 43 44      # our side on the chip (seconds per fit)
  python scripts/inp_seed_spread.py --method dip --oracle-seeds 43  # torch CPU

A 256^2 300-iter our-side fit takes >60 min on this 1-core host but
seconds on the chip; seed-variance estimation does not need the CPU
backend (f32 either way; the lockstep test pins the dynamics).

Appends to logs/inp_seed_spread.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

SIZE = 256


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--method", default="dip",
                    choices=["dip", "mfvi", "mcd", "sgld"])
    ap.add_argument("--iters", type=int, default=300)
    ap.add_argument("--seeds", type=int, nargs="*", default=[])
    ap.add_argument("--oracle-seeds", type=int, nargs="*", default=[])
    args = ap.parse_args(argv)

    import jax
    if os.environ.get("MFVI_DIP_SPREAD_TPU", "0") == "0":
        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from mfvi_dip_mia_tpu.tasks.data import synthetic_hair
    img, mask = synthetic_hair(0, SIZE)

    # parity-test hyperparameters (tests/test_reference_parity.py inp rows)
    HP = {"dip": dict(lr=2e-3, fit=dict(), build=dict(input_depth=32)),
          "mfvi": dict(lr=2e-3, fit=dict(temp=4e-6, sigma=0.01),
                       build=dict(input_depth=32)),
          "mcd": dict(lr=3e-4, fit=dict(dropout_p=0.2, weight_decay=1e-4),
                      build=dict(dropout_p=0.2)),
          "sgld": dict(lr=3e-4, fit=dict(gamma=0.996, weight_decay=1e-4),
                       build=dict(input_depth=32))}[args.method]

    def smoothed_tail(x, k=25):
        return float(np.nanmean(np.asarray(x)[-k:]))

    rows = []
    if args.seeds:
        import mfvi_dip_mia_tpu.tasks.data as D
        from mfvi_dip_mia_tpu.tasks import build_problem
        from mfvi_dip_mia_tpu.tasks.trainer import Method, fit
        D.get_img_inpainting = lambda i: (img, mask, (SIZE, SIZE))
        problem = build_problem("inp", args.method, 0, **HP["build"])
        for seed in args.seeds:
            res = fit(problem, Method(name=args.method, **HP["fit"]),
                      num_iter=args.iters, lr=HP["lr"], seed=seed,
                      show_every=args.iters)
            rows.append({"side": "ours", "seed": seed,
                         "psnr_sm": smoothed_tail(res.psnrs[:, 2]),
                         "ssim_sm": smoothed_tail(res.ssims[:, 2])})
            print(json.dumps(rows[-1]), flush=True)

    if args.oracle_seeds:
        import ref_oracle
        import pathlib
        ref = ref_oracle.import_reference()
        ref.get_img_inpainting = lambda i: (img, mask, (SIZE, SIZE))
        import torch
        torch.set_num_threads(os.cpu_count() or 8)
        runner = {"dip": ref.run_inp_dip, "mfvi": ref.run_inp_mfvi,
                  "mcd": ref.run_inp_mcd, "sgld": ref.run_inp_sgld}[
            args.method]
        kw = {"dip": dict(lr=2e-3),
              "mfvi": dict(lr=2e-3, temp=4e-6, sigma=0.01),
              "mcd": dict(lr=3e-4, dropout_p=0.2, weight_decay=1e-4),
              "sgld": dict(lr=3e-4, gamma=0.996, weight_decay=1e-4)}[args.method]
        for seed in args.oracle_seeds:
            with tempfile.TemporaryDirectory() as td:
                runner(img=0, num_iter=args.iters, plot=False, save=True,
                       save_path=td, show_every=200, seed=seed, **kw)
                sub = [p for p in pathlib.Path(td).iterdir() if p.is_dir()]
                z = np.load(sub[0] / "save.npz", allow_pickle=True)
                psnrs = z["psnrs"].item()[args.method]
                ssims = z["ssims"].item()[args.method]
            rows.append({"side": "oracle", "seed": seed,
                         "psnr_sm": smoothed_tail(psnrs[:, 2]),
                         "ssim_sm": smoothed_tail(ssims[:, 2])})
            print(json.dumps(rows[-1]), flush=True)

    os.makedirs("logs", exist_ok=True)
    path = "logs/inp_seed_spread.json"
    all_rows = []
    if os.path.exists(path):
        with open(path) as f:
            all_rows = json.load(f)
    all_rows += [dict(r, method=args.method, iters=args.iters)
                 for r in rows]
    with open(path, "w") as f:
        json.dump(all_rows, f, indent=2)
    print(f"wrote {path} ({len(all_rows)} rows total)")


if __name__ == "__main__":
    main()

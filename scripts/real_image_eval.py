"""Measured accuracy rows on a REAL medical image (BASELINE.md 'measured
here' column).

Runs the den/mfvi and ct/mfvi test-config workloads on img=9 — the vendored
real MRI head slice (data/real/s1045.ima.gz; see tasks/data.py::
real_mri_slice) — and reports the reference's table metrics (PSNR/SSIM
converged = mean over final 100 iters of the smoothed recon, early-stop =
max, UCE calibration) via tasks/evaluation.py, exactly as the reference's
eval notebooks compute them (eval_denoising.ipynb cells 4-9).

The reference's own dataset images (chest X-rays, coronacases CT) are not
redistributable (reference .gitignore:10), so its published rows cannot be
reproduced bit-for-bit here; this anchors the same pipeline on real anatomy.

Usage: python scripts/real_image_eval.py [--iters 30000] [--tasks den ct]
"""
from __future__ import annotations

import argparse
import json
import os
import pathlib
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_one(task: str, iters: int, out_root: str,
            hp_override: dict | None = None) -> dict:
    from mfvi_dip_mia_tpu.tasks.runners import run_task
    from mfvi_dip_mia_tpu.tasks.evaluation import (summarize_run,
                                                   calibration_from_run)

    save_path = os.path.join(out_root, task)
    # defaults: the reference's pinned optima for OTHER images
    # (test_configs/mfvi_den.json img 5, test_mfvi_ct.json) — override with
    # img-9-tuned values from the bo_mfvi_den_img9 sweep when available
    hp = {"den": dict(temp=5.66e-7, sigma=1.46e-5),
          "ct": dict(temp=2.2e-10, sigma=1.7e-7),
          # reference pinned optima (configs/test_mfvi_sr.json /
          # test_mfvi_inp.json run_params + candidates)
          "sr": dict(temp=4.38e-7, sigma=4.9e-8, input_depth=32),
          "inp": dict(temp=1e-12, sigma=6.5e-4)}[task]
    lr = {"den": 1e-3, "ct": 1e-3, "sr": 1e-3, "inp": 2e-3}[task]
    if hp_override:
        hp.update(hp_override)
    final = run_task(task, "mfvi", img=9, num_iter=iters, lr=lr, seed=1,
                     show_every=500, metrics_every=10, chunk_iters=500,
                     plot=False, save=True, save_path=save_path, **hp)
    runs = sorted(pathlib.Path(save_path).iterdir())
    npz = str(runs[-1] / "save.npz")
    row = {"task": task, "img": 9, "iters": iters, "final_psnr": float(final)}
    row.update(summarize_run(npz)["mfvi"])
    try:
        cal = calibration_from_run(npz)
        if "mfvi" in cal:
            row["uce"] = cal["mfvi"]["uce"]
    except Exception as e:
        row["uce_error"] = str(e)
    return row


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30000)
    ap.add_argument("--ct-iters", type=int, default=None,
                    help="default: 2x --iters (reference CT budget ratio)")
    ap.add_argument("--tasks", nargs="+", default=["den", "ct"])
    ap.add_argument("--den-temp", type=float, default=None,
                    help="img-9-tuned denoising temp (bo_mfvi_den_img9)")
    ap.add_argument("--den-sigma", type=float, default=None,
                    help="img-9-tuned denoising sigma (bo_mfvi_den_img9)")
    ap.add_argument("--out", default="logs/real_image_eval")
    args = ap.parse_args(argv)

    from mfvi_dip_mia_tpu.utils.prng import configure
    configure()

    rows = []
    for task in args.tasks:
        iters = (args.ct_iters or 2 * args.iters) if task == "ct" \
            else args.iters
        hp = None
        if task == "den" and (args.den_temp or args.den_sigma):
            hp = {}
            if args.den_temp:
                hp["temp"] = args.den_temp
            if args.den_sigma:
                hp["sigma"] = args.den_sigma
        rows.append(run_one(task, iters, args.out, hp))
        print(json.dumps(rows[-1]), flush=True)
    # merge with existing rows (replace same-task entries) — a partial
    # --tasks run must not clobber the other tasks' committed rows
    path = os.path.join(args.out, "rows.json")
    existing = []
    if os.path.exists(path):
        with open(path) as f:
            existing = json.load(f)
    done = {r["task"] for r in rows}
    merged = [r for r in existing if r.get("task") not in done] + rows
    with open(path, "w") as f:
        json.dump(merged, f, indent=2)


if __name__ == "__main__":
    main()

"""A/B the fused LRT Pallas kernel vs the XLA block-diagonal LRT path on
TPU: full CT/MFVI fit with reparam='lrt', MFVI_DIP_PALLAS_LRT=1 vs 0.

The reference's runners use RT (reparam='', bayesian_optimization.py:543),
so LRT is off the BO hot path — this measures whether the Pallas kernel
(ops/pallas/lrt_conv_pallas.py) earns default-on for LRT users; the
decision + numbers are recorded in ROADMAP.md (VERDICT r2 item 7).

Usage: python scripts/ab_lrt.py [--iters 600] [--size 256]
"""
from __future__ import annotations

import argparse
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_one(pallas: bool, iters: int, size: int):
    code = f"""
import json
from mfvi_dip_mia_tpu.utils.prng import configure
configure()
import mfvi_dip_mia_tpu.tasks.data as D
import mfvi_dip_mia_tpu.tasks.problems as P
from mfvi_dip_mia_tpu.tasks import build_problem
from mfvi_dip_mia_tpu.tasks.trainer import Method, fit
size = {size}
P.D.get_img_ct = lambda img: (D.synthetic_ct(img, size), (size, size))
problem = build_problem("ct", "mfvi", 0, input_depth=16)
res = fit(problem, Method(name="mfvi", temp=2.2e-10, sigma=1.7e-7),
          num_iter={iters}, lr=1e-3, seed=1, show_every=100,
          chunk_iters=100, collect_snapshots=False, metrics_every=10,
          reparam="lrt")
print(json.dumps({{"pallas_lrt": {pallas},
                   "final_psnr": float(res.final_psnr),
                   "iters_per_sec": float(res.iters_per_sec)}}))
"""
    env = dict(os.environ)
    env["MFVI_DIP_PALLAS_LRT"] = "1" if pallas else "0"
    out = subprocess.run([sys.executable, "-c", code], cwd=ROOT,
                         capture_output=True, text=True, timeout=1800,
                         env=env)
    printed = False
    for line in out.stdout.splitlines():
        if line.startswith("{"):
            print(line, flush=True)
            printed = True
    if not printed:
        print(f"FAILED pallas={pallas} rc={out.returncode}\n"
              f"{out.stderr[-2000:]}", flush=True)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=600)
    ap.add_argument("--size", type=int, default=256)
    args = ap.parse_args(argv)
    run_one(False, args.iters, args.size)
    run_one(True, args.iters, args.size)


if __name__ == "__main__":
    main()

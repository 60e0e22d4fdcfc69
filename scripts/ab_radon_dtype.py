"""A/B the banded Radon band dtype (f32 vs bf16 storage) end-to-end:
same CT/MFVI fit, same seed, compare PSNR trajectories + wall clock.

Usage: python scripts/ab_radon_dtype.py [--iters 5000] [--size 256]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_one(mode: str, iters: int, size: int):
    os.environ["MFVI_DIP_RADON"] = mode
    import subprocess
    code = f"""
import json
import mfvi_dip_mia_tpu.tasks.data as D
import mfvi_dip_mia_tpu.tasks.problems as P
from mfvi_dip_mia_tpu.tasks import build_problem
from mfvi_dip_mia_tpu.tasks.trainer import Method, fit
size = {size}
P.D.get_img_ct = lambda img: (D.synthetic_ct(img, size), (size, size))
problem = build_problem("ct", "mfvi", 0, input_depth=16)
res = fit(problem, Method(name="mfvi", temp=2.2e-10, sigma=1.7e-7),
          num_iter={iters}, lr=1e-3, seed=1, show_every=500,
          collect_snapshots=False, metrics_every=10)
print(json.dumps({{"mode": "{mode}", "final_psnr": float(res.final_psnr),
                   "iters_per_sec": float(res.iters_per_sec)}}))
"""
    out = subprocess.run([sys.executable, "-c", code],
                         cwd=os.path.dirname(os.path.dirname(
                             os.path.abspath(__file__))),
                         capture_output=True, text=True, timeout=1800,
                         env=dict(os.environ))
    for line in out.stdout.splitlines():
        if line.startswith("{"):
            print(line)
            return line
    print(out.stderr[-2000:], file=sys.stderr)
    raise RuntimeError(f"{mode} run failed")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=5000)
    ap.add_argument("--size", type=int, default=256)
    args = ap.parse_args()
    run_one("banded", args.iters, args.size)
    run_one("banded-bf16", args.iters, args.size)


if __name__ == "__main__":
    main()

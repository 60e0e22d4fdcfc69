"""A/B the U-Net compute layout + dtype end-to-end on the CT/MFVI north-star
workload: same seed, full 5k-iter fits, compare final smoothed PSNR + it/s.

Validates ROADMAP levers 1-2 (bf16 compute path, channels-first high-res
levels + fused Pallas block) preserve convergence: the gate for making
'auto'+bf16 the sweep default is 5k-iter PSNR within 0.1 dB of f32/nhwc
(VERDICT r2 "done" criterion).

Usage: python scripts/ab_layout_dtype.py [--iters 5000] [--size 256]
Each config runs in a subprocess (clean compile cache semantics, env gates
read at trace time).
"""
from __future__ import annotations

import argparse
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_one(layout: str, dtype: str, fused: bool, iters: int, size: int):
    code = f"""
import json
from mfvi_dip_mia_tpu.utils.prng import configure
configure()
import mfvi_dip_mia_tpu.tasks.data as D
import mfvi_dip_mia_tpu.tasks.problems as P
import jax.numpy as jnp
from mfvi_dip_mia_tpu.tasks import build_problem
from mfvi_dip_mia_tpu.tasks.trainer import Method, fit
size = {size}
P.D.get_img_ct = lambda img: (D.synthetic_ct(img, size), (size, size))
problem = build_problem("ct", "mfvi", 0, input_depth=16)
res = fit(problem, Method(name="mfvi", temp=2.2e-10, sigma=1.7e-7),
          num_iter={iters}, lr=1e-3, seed=1, show_every=500,
          chunk_iters=500, collect_snapshots=False, metrics_every=10,
          layout="{layout}",
          compute_dtype=jnp.bfloat16 if "{dtype}" == "bf16"
          else jnp.float32)
print(json.dumps({{"layout": "{layout}", "dtype": "{dtype}",
                   "fused": {fused}, "final_psnr": float(res.final_psnr),
                   "iters_per_sec": float(res.iters_per_sec)}}))
"""
    env = dict(os.environ)
    env["MFVI_DIP_FUSED_BLOCK"] = "1" if fused else "0"
    out = subprocess.run([sys.executable, "-c", code], cwd=ROOT,
                         capture_output=True, text=True, timeout=3600,
                         env=env)
    printed = False
    for line in out.stdout.splitlines():
        if line.startswith("{"):
            print(line, flush=True)
            printed = True
    if not printed:
        print(f"FAILED {layout}/{dtype}/fused={fused} rc={out.returncode}\n"
              f"{out.stderr[-2000:]}", flush=True)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=5000)
    ap.add_argument("--size", type=int, default=256)
    args = ap.parse_args(argv)
    for layout, dtype, fused in [("nhwc", "f32", False),
                                 ("auto", "f32", True),
                                 ("auto", "bf16", True)]:
        run_one(layout, dtype, fused, args.iters, args.size)


if __name__ == "__main__":
    main()

"""Bench battery: all four north-star throughput metrics as ONE committed
JSON artifact (VERDICT r4 missing #4 — BENCH_r*.json carries only the CT
metric; the other three lived as ROADMAP prose with no machine-readable
record of how they were produced).

Runs each metric as a fresh ``python bench.py`` subprocess (clean backend
state, per-metric compile cache) on the real chip and writes
``BENCH_battery_r{N}.json`` with the full methodology: exact argv, git rev,
devices, and the one-line JSON each bench printed.

Usage:
    python scripts/bench_battery.py [--out BENCH_battery_r05.json] [--quick]

MUST run on a quiet host (CLAUDE.md: CPU jobs deflate chip rates ~7x).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# the four north-star metrics (ROADMAP.md round-4 table) and the exact
# production settings each is defined at
METRICS = [
    {"name": "ct_mfvi_256", "argv": ["--metric", "ct", "--size", "256"],
     "workload": "CT MFVI 256^2 / 45-angle banded Radon, bf16/auto, "
                 "metrics_every=10, chunk 500 (the bo_mfvi_ct sweep fit)"},
    {"name": "den_dip_256", "argv": ["--metric", "train", "--size", "256"],
     "workload": "Denoising MFVI-DIP 256^2, f32, per-iteration "
                 "PSNR/SSIM triple (the reference's workhorse loop)"},
    {"name": "mc_samples_256", "argv": ["--metric", "mc", "--size", "256"],
     "workload": "MC posterior samples/sec at 256^2: one lax.map dispatch "
                 "of S samples, device-side scalar sync, 3 reps"},
    {"name": "ct_mfvi_512", "argv": ["--metric", "ct", "--size", "512"],
     "workload": "CT MFVI 512^2 / 45 angles (banded-bf16 Radon built "
                 "dense-free; the dense matrix would be 24 GB)"},
]


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(REPO,
                                                  "BENCH_battery_r05.json"))
    ap.add_argument("--quick", action="store_true",
                    help="smoke run (short fits; NOT the committed numbers)")
    args = ap.parse_args(argv)

    rev = subprocess.run(["git", "rev-parse", "HEAD"], cwd=REPO,
                         capture_output=True, text=True).stdout.strip()
    rows = []
    for m in METRICS:
        cmd = [sys.executable, os.path.join(REPO, "bench.py")] + m["argv"]
        if args.quick:
            cmd.append("--quick")
        t0 = time.time()
        proc = subprocess.run(cmd, cwd=REPO, capture_output=True, text=True,
                              timeout=3600)
        wall = time.time() - t0
        line = None
        for out_line in proc.stdout.strip().splitlines():
            try:
                line = json.loads(out_line)
            except json.JSONDecodeError:
                continue
        row = {"name": m["name"], "workload": m["workload"],
               "argv": m["argv"] + (["--quick"] if args.quick else []),
               "wall_seconds": round(wall, 1),
               "returncode": proc.returncode, "result": line}
        if proc.returncode != 0 or line is None:
            row["stderr_tail"] = proc.stderr.strip().splitlines()[-5:]
        rows.append(row)
        print(json.dumps(row.get("result") or row), flush=True)

    out = {
        "schema": "bench_battery_v1",
        "git_rev": rev,
        "quick": bool(args.quick),
        "host": os.uname().nodename,
        "timestamp": time.strftime("%Y-%m-%dT%H:%M:%S%z"),
        "methodology": "each metric is a fresh `python bench.py` subprocess "
                       "on the real TPU through the axon relay; steady-state "
                       "rates exclude the compile/warmup chunk; inputs vary "
                       "per call (the relay memoizes identical requests); "
                       "quiet-host requirement per CLAUDE.md",
        "metrics": rows,
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(f"# wrote {args.out}", file=sys.stderr)
    return 0 if all(r["returncode"] == 0 for r in rows) else 1


if __name__ == "__main__":
    sys.exit(main())

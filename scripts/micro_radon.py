"""Isolated fwd / fwd+bwd timing of each Radon mode on the live device.

Times jit(radon.apply) and jit(grad(||A x||^2)) alone — no U-Net — with
fresh inputs per call (the relay memoizes identical requests) and a value
fetch as the only reliable sync. Separates "the kernel is slow" from "the
kernel hurts the surrounding program" (see scripts/ab_radon.sh for the
end-to-end A/B).
"""

import argparse
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--angles", type=int, default=45)
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--modes", default="matmul,pallas,banded,banded-bf16")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from mfvi_dip_mia_tpu.ops.radon import FastRadonTransform

    theta = np.arange(0.0, 180.0, 180.0 / args.angles)
    shape = (1, args.size, args.size, 1)
    key = jax.random.PRNGKey(0)

    def sync(o):
        return np.asarray(o).ravel()[:1]

    for mode in args.modes.split(","):
        r = FastRadonTransform(shape, theta, mode=mode)
        m = r.matrix()
        reps = args.reps

        # the whole rep loop runs device-side in ONE dispatch (per-dispatch
        # relay overhead would otherwise swamp ms-scale kernels); each rep
        # sees a fresh image so nothing memoizes or CSEs away
        @jax.jit
        def loop_fwd(k, mat):
            def body(acc, i):
                im = jax.random.uniform(jax.random.fold_in(k, i), shape)
                return acc + jnp.sum(r.apply(im, mat)), None
            return jax.lax.scan(body, 0.0, jnp.arange(reps))[0]

        @jax.jit
        def loop_grd(k, mat):
            g = jax.grad(lambda im: jnp.sum(r.apply(im, mat) ** 2))

            def body(acc, i):
                im = jax.random.uniform(jax.random.fold_in(k, i), shape)
                return acc + jnp.sum(g(im)), None
            return jax.lax.scan(body, 0.0, jnp.arange(reps))[0]

        for label, f in (("fwd", loop_fwd), ("fwd+bwd", loop_grd)):
            sync(f(key, m))                      # compile
            t0 = time.perf_counter()
            sync(f(jax.random.fold_in(key, 999), m))
            dt = (time.perf_counter() - t0) / reps * 1e3
            print(f"{mode:12s} {label:8s} {dt:7.3f} ms/iter", flush=True)


if __name__ == "__main__":
    main()

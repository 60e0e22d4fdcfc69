"""Wall-clock decomposition of the CT/MFVI training iteration on the real
chip. Each component is scanned N times inside ONE jit (the trainer's own
structure) so remote-dispatch overhead is amortized exactly as in
production; a varying counter argument defeats the relay's request
memoization (CLAUDE.md).

Usage: python scripts/time_components.py [--size 256] [--iters 200]
                                         [--layout nhwc|auto] [--dtype bf16]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--iters", type=int, default=200)
    ap.add_argument("--layout", default="nhwc")
    ap.add_argument("--dtype", default="f32", choices=["f32", "bf16"])
    args = ap.parse_args(argv)

    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    import mfvi_dip_mia_tpu.tasks.data as D
    import mfvi_dip_mia_tpu.tasks.problems as P
    from mfvi_dip_mia_tpu.bayes import vi
    from mfvi_dip_mia_tpu.tasks import build_problem
    from mfvi_dip_mia_tpu.tasks.trainer import (
        HyperParams, Method, _build_optimizer, _get_init_fn)
    from mfvi_dip_mia_tpu.utils import images as I

    size = args.size
    P.D.get_img_ct = lambda img: (D.synthetic_ct(img, size), (size, size))
    problem = build_problem("ct", "mfvi", 0, input_depth=16)
    method = Method(name="mfvi", temp=2.2e-10, sigma=1.7e-7)
    optimizer = _build_optimizer(method, 1e-3)
    init_fn = _get_init_fn(problem, method.name, optimizer,
                           problem.init_normal_std)
    key = jax.random.PRNGKey(0)
    k_init, k_mfvi, k_reinit, k_train = jax.random.split(key, 4)
    params, opt_state = init_fn(k_init, k_mfvi, k_reinit)
    net = problem.net
    h, w = problem.imsize
    rng = np.random.default_rng(1)
    z = jnp.asarray(I.get_noise(problem.input_depth, (h, w), rng=rng))
    dt = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    layout = args.layout
    hp = HyperParams.of(method, 1e-3)
    n = args.iters

    def scan_time(label, body, init_carry, extra=()):
        """body(carry, i, *extra) -> carry; scanned n times, timed over 3
        calls with a varying offset (relay memoization)."""
        @jax.jit
        def run(c0, off, *ex):
            def f(c, i):
                return body(c, i + off, *ex), ()
            c, _ = jax.lax.scan(f, c0, jnp.arange(n, dtype=jnp.int32))
            return c
        def materialize(x):
            # jax.block_until_ready does NOT reliably block through the axon
            # relay (measured: 50x 2048^3 matmuls "complete" in 0.4 ms);
            # only a host transfer forces execution.
            return float(np.sum(np.asarray(jax.tree.leaves(x)[0])))

        out = run(init_carry, jnp.int32(12345), *extra)  # compile+warm
        materialize(out)
        times = []
        for r in range(3):
            t0 = time.perf_counter()
            out = run(init_carry, jnp.int32(r * n), *extra)
            materialize(out)
            times.append((time.perf_counter() - t0) / n)
        ms = min(times) * 1e3
        print(f"{label:<22}{ms:8.3f} ms/iter   ({1 / (ms / 1e3):7.1f} it/s)")
        return ms

    cast = lambda p: jax.tree.map(lambda x: x.astype(dt), p)

    # 1. U-Net forward only (carry a scalar so the scan isn't dead-code'd)
    def fwd_body(c, i):
        out = net.apply(cast(params), z.astype(dt),
                        key=jax.random.fold_in(k_train, i), training=True,
                        layout=layout)
        return c + jnp.sum(out.astype(jnp.float32))
    scan_time("unet_fwd", fwd_body, jnp.float32(0))

    # 2. U-Net fwd+bwd (params carried so each iter differs)
    def fwdbwd_body(p, i):
        def loss(p_):
            out = net.apply(cast(p_), z.astype(dt),
                            key=jax.random.fold_in(k_train, i), training=True,
                            layout=layout)
            return jnp.sum(out.astype(jnp.float32) ** 2)
        g = jax.grad(loss)(p)
        return jax.tree.map(lambda a, b: a - 1e-12 * b, p, g)
    scan_time("unet_fwd_bwd", fwdbwd_body, params)

    # 3. Radon fwd / fwd+bwd (image carried; op_state threaded as jit arg)
    op = problem.operator
    if op is not None:
        img0 = jnp.asarray(np.random.default_rng(2).random((1, h, w, 1)),
                           jnp.float32)

        def radon_body(x, i, st):
            s = op(x, st)
            return x + 1e-12 * jnp.sum(s) * x
        scan_time("radon_fwd", radon_body, img0, (problem.op_state,))

        def radonfb_body(x, i, st):
            g = jax.grad(lambda x_: jnp.sum(op(x_, st) ** 2))(x)
            return x - 1e-12 * g
        scan_time("radon_fwd_bwd", radonfb_body, img0, (problem.op_state,))

    # 4. full loss fwd+bwd + optimizer update (no metrics/rings)
    def step_body(carry, i, st):
        p, o = carry
        bound = dataclasses.replace(problem, op_state=st)

        def loss(p_):
            out = net.apply(cast(p_), z.astype(dt),
                            key=jax.random.fold_in(k_train, i), training=True,
                            layout=layout)
            out = out.astype(jnp.float32)
            return bound.data_loss(out) + hp.temp * vi.kl_mfvi(
                p_, 0.0, hp.prior_sigma)
        g = jax.grad(loss)(p)
        up, o2 = optimizer.update(g, o, p)
        return (optax.apply_updates(p, up), o2)
    scan_time("loss_grad_update", step_body, (params, opt_state),
              (problem.op_state,))

    # 5. KL alone fwd+bwd
    def kl_body(p, i):
        g = jax.grad(lambda p_: vi.kl_mfvi(
            p_, 0.0, hp.prior_sigma * (1 + 1e-9 * i.astype(jnp.float32))))(p)
        return jax.tree.map(lambda a, b: a - 1e-12 * b, p, g)
    scan_time("kl_grad", kl_body, params)

    # 5b. whole-tree RT sampling alone (the per-iteration posterior draw)
    def sample_body(c, i):
        s = vi.sample_mfvi_tree(params, jax.random.fold_in(k_train, i))
        return c + jnp.sum(jax.tree.leaves(s)[0].astype(jnp.float32))
    scan_time("sample_tree", sample_body, jnp.float32(0))

    # 6. metric triple (PSNR + SSIM, varying recon)
    from mfvi_dip_mia_tpu.ops import metrics as M

    def met_body(c, i):
        a = jax.random.uniform(jax.random.fold_in(k_train, i), (1, h, w, 1))
        return c + M.psnr(a, problem.gt) + M.ssim(a, problem.gt)
    scan_time("psnr_ssim", met_body, jnp.float32(0))

    # 7. adam update alone
    def adam_body(carry, i):
        p, o = carry
        g = jax.tree.map(
            lambda x: x * (1e-9 * i.astype(jnp.float32)), p)
        up, o2 = optimizer.update(g, o, p)
        return (optax.apply_updates(p, up), o2)
    scan_time("adam_update", adam_body, (params, opt_state))


if __name__ == "__main__":
    main()

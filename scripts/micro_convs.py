"""Per-site conv microbench for the 5-scale skip U-Net on the real chip.

Times every distinct (H, W, cin, cout, k, stride) conv site of the CT net
(tasks/problems.py::_standard_net: skip_n33d=[16,32,64,128,128], input 16ch,
256^2) forward and forward+backward, in NHWC conv form and NCHW matmul form
(what layout='auto' lowers the high-res levels to), f32 and bf16. Each site
is scanned N times inside one jit with a varying offset so the axon relay
cannot memoize (CLAUDE.md). The table localizes the U-Net's wall-clock
(time_components.py: fwd+bwd 2.44 ms at 256^2 bf16/auto) to sites.

Usage: python scripts/micro_convs.py [--iters 200] [--dtype bf16]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=200)
    ap.add_argument("--dtype", default="bf16", choices=["f32", "bf16"])
    ap.add_argument("--impl", default="xla", choices=["xla", "cf"],
                    help="xla: NHWC conv_general_dilated (round-2 baseline); "
                         "cf: the production channels-first pallas path "
                         "(ops/pallas/cf_conv.conv2d_cf_pallas, zero pad)")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    dt = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    n_it = args.iters

    # (label, H, cin, cout, k, stride) — the CT net's conv sites at 256^2.
    # Down level i: stride-2 conv c_{i-1}->c_i at H_i output, then 3x3
    # c_i->c_i; up level i: 3x3 (c_i + skip)->c_i after concat, then 1x1;
    # skip branches are 1x1 cin->4 at the DOWN resolution.
    sites = []
    chans = [16, 32, 64, 128, 128]
    res = [256, 128, 64, 32, 16]
    cin_prev = 16  # input_depth
    for i, (c, r) in enumerate(zip(chans, res)):
        h_in = res[i - 1] if i else 256
        sites.append((f"d{i}_s2 {h_in}->{r} {cin_prev}->{c}",
                      r, cin_prev, c, 3, 2, h_in))
        sites.append((f"d{i}_33 {r} {c}->{c}", r, c, c, 3, 1, r))
        sites.append((f"skip{i}_11 {r} {cin_prev}->4", r, cin_prev, 4, 1, 1,
                      r))
        up_in = c + 4
        sites.append((f"u{i}_33 {r} {up_in}->{c}", r, up_in, c, 3, 1, r))
        sites.append((f"u{i}_11 {r} {c}->{c}", r, c, c, 1, 1, r))
        cin_prev = c

    def scan_time(label, fn, *xs):
        @jax.jit
        def run(off, *ex):
            def f(c, i):
                return fn(c + (i + off).astype(c.dtype) * 0, i), ()
            out, _ = jax.lax.scan(f, ex[0], jnp.arange(n_it))
            # scalar output: the relay ships result buffers back in the
            # HTTP response, and a 2 MB carry costs ~30 ms — which at
            # n=200 reads as a flat 0.15 ms/iter floor on every site
            return jnp.sum(out.astype(jnp.float32))

        r = run(jnp.zeros((), jnp.int32), *xs)
        jax.tree_util.tree_map(
            lambda a: a.block_until_ready() if hasattr(a, "block_until_ready")
            else None, r)
        t0 = time.perf_counter()
        r = run(jnp.ones((), jnp.int32), *xs)
        jax.tree_util.tree_map(
            lambda a: a.block_until_ready() if hasattr(a, "block_until_ready")
            else None, r)
        ms = (time.perf_counter() - t0) / n_it * 1e3
        print(f"{label:<34}{ms:8.4f} ms", flush=True)
        return ms

    rng = np.random.default_rng(0)
    total = {"fwd": 0.0, "fb": 0.0}
    for label, r, cin, cout, k, stride, h_in in sites:
        if args.impl == "cf":
            from mfvi_dip_mia_tpu.ops.pallas.cf_conv import conv2d_cf_pallas
            x = jnp.asarray(rng.normal(size=(1, cin, h_in, h_in)), dt)
            w = jnp.asarray(rng.normal(size=(k, k, cin, cout)) * 0.05, dt)
            padding = k // 2 if stride == 1 else 1

            def conv(xx, ww, _s=stride, _p=padding):
                return conv2d_cf_pallas(xx, ww, None, _s, _p,
                                        pad_mode="zero")
        else:
            x = jnp.asarray(rng.normal(size=(1, h_in, h_in, cin)), dt)
            w = jnp.asarray(rng.normal(size=(k, k, cin, cout)) * 0.05, dt)
            dimn = jax.lax.conv_dimension_numbers(
                x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
            pad = [(k // 2, k // 2)] * 2 if stride == 1 else [(1, 1)] * 2

            def conv(xx, ww):
                return jax.lax.conv_general_dilated(
                    xx, ww, (stride, stride), pad, dimension_numbers=dimn)

        def fwd(c, i, _w=w):
            y = conv(c, _w)
            # fold back to input shape so the scan carry is closed: cheap
            # reduce — keeps the conv un-DCE'd
            return c + jnp.mean(y).astype(c.dtype)

        ms_f = scan_time(f"fwd  {label}", fwd, x)

        def fb(c, i, _w=w):
            def loss(xx, ww):
                return jnp.sum(conv(xx, ww).astype(jnp.float32) ** 2)
            gx, gw = jax.grad(loss, argnums=(0, 1))(c, _w)
            # keep both grads live (1e-20 scale: not constant-folded away)
            return (c + gx.astype(c.dtype) * 1e-9
                    + jnp.sum(gw).astype(c.dtype) * 1e-20)

        ms_b = scan_time(f"f+b  {label}", fb, x)
        total["fwd"] += ms_f
        total["fb"] += ms_b
    print(f"\nTOTAL fwd {total['fwd']:.3f} ms   f+b {total['fb']:.3f} ms")


if __name__ == "__main__":
    main()

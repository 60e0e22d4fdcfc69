"""Profile the jit'd training chunk: per-op estimated_cycles from the
compiled HLO (the technique that diagnosed the round-2 Pallas layout
regression — see ROADMAP.md "SOLVED").

Usage:
    python scripts/profile_step.py [--task ct] [--method mfvi] [--size 256]
                                   [--top 40] [--cpu] [--dtype bf16]

Prints a sorted table of (cycles, count, op-kind, name-sample) aggregated
over the while-loop body of the scanned chunk, plus totals. ``--groupby
fusion`` lists individual fusions instead of kinds.
"""

from __future__ import annotations

import argparse
import collections
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--task", default="ct")
    ap.add_argument("--method", default="mfvi")
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--dtype", default="f32", choices=["f32", "bf16"])
    ap.add_argument("--layout", default="nhwc", choices=["nhwc", "auto"])
    ap.add_argument("--groupby", default="kind", choices=["kind", "op"])
    ap.add_argument("--dump", default=None, help="write full HLO text here")
    ap.add_argument("--prng", default="auto",
                    help="jax_default_prng_impl: 'auto' = production setting "
                         "(rbg on TPU), or threefry2x32/rbg explicitly")
    args = ap.parse_args(argv)

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from mfvi_dip_mia_tpu.utils.prng import configure as configure_prng
    configure_prng(None if args.prng == "auto" else args.prng)
    import jax.numpy as jnp
    import numpy as np

    import mfvi_dip_mia_tpu.tasks.data as D
    import mfvi_dip_mia_tpu.tasks.problems as P
    from mfvi_dip_mia_tpu.tasks import build_problem
    from mfvi_dip_mia_tpu.tasks.trainer import (
        HyperParams, Method, TrainState, _build_optimizer, _get_init_fn,
        _get_run_chunk, MC_RING)
    from mfvi_dip_mia_tpu.utils import images as I

    size = args.size
    P.D.get_image_denoising = lambda img: (D.synthetic_xray(img, size),
                                           (size, size))
    P.D.get_img_ct = lambda img: (D.synthetic_ct(img, size), (size, size))

    problem = build_problem(args.task, args.method, 0, input_depth=16)
    method = Method(name=args.method, temp=2.2e-10, sigma=1.7e-7)
    lr = 1e-3
    optimizer = _build_optimizer(method, lr)
    init_fn = _get_init_fn(problem, method.name, optimizer,
                           problem.init_normal_std)
    key = jax.random.PRNGKey(0)
    k_init, k_mfvi, k_reinit, k_train = jax.random.split(key, 4)
    params, opt_state = init_fn(k_init, k_mfvi, k_reinit)

    h, w = problem.imsize
    mc = problem.mean_ch
    n_out = {"ct": 1, "den": 2, "sr": 2, "inp": 4}[problem.task]
    state = TrainState(
        params=params, opt_state=opt_state,
        out_avg=jnp.zeros((1, h, w, n_out), jnp.float32),
        ring_epi=jnp.zeros((MC_RING, h * w * mc), jnp.float32),
        ring_ale=jnp.zeros((MC_RING, h * w * mc), jnp.float32),
        snap_avg=jnp.zeros((h * w * n_out,), jnp.float32),
        snap_epi=jnp.zeros((h * w * mc,), jnp.float32),
        snap_ale=jnp.zeros((h * w * mc,), jnp.float32))

    rng = np.random.default_rng(1)
    z = jnp.asarray(I.get_noise(problem.input_depth, (h, w), rng=rng))
    hp = HyperParams.of(method, lr)
    data = {"z": z, "gt": problem.gt, "target": problem.target,
            "mask": problem.mask, "key": k_train,
            "op_state": problem.op_state,
            "metrics_every": jnp.asarray(10, jnp.int32)}
    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    run_chunk = _get_run_chunk(problem, method.name, optimizer, "rt", dtype,
                               args.layout)

    chunk = 500
    its = jnp.arange(0, chunk, dtype=jnp.int32)
    lowered = run_chunk.lower(state, its, jnp.asarray(chunk + 1, jnp.int32),
                              jnp.asarray(100, jnp.int32), hp, data)
    compiled = lowered.compile()
    text = compiled.as_text()
    if args.dump:
        with open(args.dump, "w") as f:
            f.write(text)
        print(f"# HLO written to {args.dump}", file=sys.stderr)

    # Aggregate estimated_cycles over ops inside the while body computation.
    # HLO text lines look like:
    #   %op.name = f32[...] fusion(...), kind=kLoop, ...
    #     backend_config={..."estimated_cycles":"12345"...}
    cyc_re = re.compile(r'"estimated_cycles"\s*:\s*"?(\d+)"?')
    # op name at line start; opcode = the lowercase word directly before the
    # operand list '(' (shape tokens like {3,0,2,1:T(1,128)} contain parens
    # too, but never a space-preceded lowercase word before one)
    name_re = re.compile(r'^\s*(?:ROOT\s+)?%?([\w.\-]+)\s*=')
    op_re = re.compile(r'\s([a-z][\w\-]*)\(')
    agg = collections.Counter()
    cnt = collections.Counter()
    sample = {}
    total = 0
    for line in text.splitlines():
        m = cyc_re.search(line)
        if not m:
            continue
        cycles = int(m.group(1))
        nm = name_re.match(line)
        name = nm.group(1) if nm else "?"
        om = op_re.search(line[nm.end():] if nm else line)
        kind = om.group(1) if om else "?"
        if kind == "fusion":
            km = re.search(r'kind=k(\w+)', line)
            kind = f"fusion.{km.group(1) if km else '?'}"
            # pull the fused root op from calls= if present
            cm = re.search(r'calls=%?([\w.\-]+)', line)
            if cm:
                kind += f"[{cm.group(1).split('.')[0]}]"
        group = name if args.groupby == "op" else kind
        agg[group] += cycles
        cnt[group] += 1
        if group not in sample or cycles > sample[group][0]:
            sample[group] = (cycles, name)
        total += cycles

    print(f"# total estimated_cycles (all ops w/ estimates): {total:,}")
    # v5e ~ 940 MHz nominal; cycles -> time guide only (cycles/940e3 = us,
    # so 7.5M cycles ~= 8 ms — the old label said 'us' off by 1000x)
    print(f"# at ~940MHz: {total / 940e6 * 1e3:.2f} ms modeled per invocation")
    print(f"{'cycles':>14} {'%':>6} {'n':>5}  group (top sample)")
    for g, c in agg.most_common(args.top):
        print(f"{c:>14,} {100 * c / total:>5.1f} {cnt[g]:>5}  {g} "
              f"({sample[g][1]}:{sample[g][0]:,})")


if __name__ == "__main__":
    main()

"""Channels-first VALID convolution as a Pallas TPU kernel.

Why a hand-written conv: XLA's convolution ops pin channels-minor
({...:T(1,128)}-family) layouts onto their operands whenever a custom call is
present in the module (the banded Radon kernel — see nn/cf.py), padding every
C=16/32 lane vector 8x/4x and inflating the surrounding elementwise/reduce
fusions 3-4x. Replacing the high-res levels' convs with this kernel removes
the conv ops from XLA's sight entirely: the (C, H, W) activations keep W on
lanes / H on sublanes (dense under any heuristic), and the conv itself is a
K=kh*kw*C_in MXU contraction per row tile.

Scope (deliberately minimal — composition happens in XLA on dense tensors):
  * VALID convolution only; reflection/zero padding is a jnp.pad OUTSIDE
    (cheap on dense CF tensors, and its transpose — the reflect fold — is
    autodiff'd by JAX).
  * stride 1 only; stride-2 sites subsample the stride-1 output ([::2, ::2]
    — identical values, and the 4x extra compute at 16-36 channels is noise
    next to the layout win).
  * batch 1 (the DIP workload), square kernels 1/3/5.

Backward (custom_vjp):
  dx = same kernel on the zero-padded cotangent with the flipped/transposed
       kernel (a full correlation);
  dw = kh*kw multi-dim dot_generals (XLA dots carry no conv layout
       preference) contracting (H, W).

Weights enter as the same HWIO tensors the rest of the framework uses; the
kernel consumes a per-tap zero-padded (O, kh*kw*I_pad) matrix so every
sublane write in the patch build is 8-aligned.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os as _os

_TH_FORCED = _os.environ.get("MFVI_DIP_CFCONV_TH")  # set => fixed everywhere
TH = int(_TH_FORCED) if _TH_FORCED else 8  # legacy fixed default (dw kernel)


def _pick_th(i_ch: int, kh: int, kw: int, wp: int, w_run: int, o_ch: int,
             itemsize: int, extra_blocks: int = 0) -> int:
    """Output rows per grid step, per site: the largest of 32/16/8 whose
    scratch (input slab + patch matrix) plus double-buffered VMEM blocks fit
    a conservative scoped-VMEM budget. Small-channel high-res sites (the
    U-Net's hot levels) get 32 — 4x fewer DMA round-trips and grid steps —
    while wide concat sites (i_ch=132) fall back to 8, which is what the
    fixed TH=16 experiment OOM'd on (scoped 15.4M > 14.2M at 256^2)."""
    if _TH_FORCED:
        return int(_TH_FORCED)
    i_pad = _round8(i_ch)
    n_buf = 2 if _os.environ.get("MFVI_DIP_CFCONV_DB", "1") != "0" else 1
    for th in (32, 16, 8):
        slab = n_buf * i_ch * _round8(th + kh - 1) * wp * itemsize
        patches = kh * kw * i_pad * th * w_run * itemsize
        blocks = 2 * (1 + extra_blocks) * o_ch * th * w_run * itemsize
        if slab + patches + blocks <= 6 * 1024 * 1024:
            return th
    return 8


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _round8(n: int) -> int:
    return -(-n // 8) * 8


def supported(x_chw, w, stride: int) -> bool:
    """Static gate; callers fall back to the XLA NCHW conv when False.
    (Non-tile-divisible output heights are handled by row padding inside
    conv_valid_cf, so the only requirements are kernel/rank/stride shape and
    a wide-enough row for the lane dimension to pay off.)"""
    if w.ndim != 4 or w.shape[0] != w.shape[1] or w.shape[0] not in (1, 3, 5):
        return False
    if x_chw.ndim != 3:
        return False
    if stride not in (1, 2):
        return False
    kh = w.shape[0]
    return x_chw.shape[2] - kh + 1 >= 64


def _wmat(w: jnp.ndarray, i_pad: int) -> jnp.ndarray:
    """(kh, kw, I, O) -> (O, kh*kw*i_pad) with per-tap zero padding so the
    kernel's patch rows are 8-aligned."""
    kh, kw, i, o = w.shape
    wm = jnp.transpose(w, (3, 0, 1, 2))           # (O, kh, kw, I)
    if i_pad != i:
        wm = jnp.pad(wm, ((0, 0), (0, 0), (0, 0), (0, i_pad - i)))
    return wm.reshape(o, kh * kw * i_pad)


@functools.partial(jax.jit, static_argnames=("kh", "kw", "h_out", "w_out",
                                              "th"))
def _conv_call(xp, wmat, *, kh: int, kw: int, h_out: int, w_out: int,
               th: int = TH):
    """xp: (I, Hp, Wp); wmat: (O, kh*kw*I_pad). Returns (O, h_out, w_out)."""
    TH = th
    i_ch, hp, wp = xp.shape
    i_pad = wmat.shape[1] // (kh * kw)
    o_ch = wmat.shape[0]
    n_tiles = h_out // TH
    # DMA slices must be 8-aligned on the sublane (row) dim: round the slab
    # up and over-read zero-padded rows (the caller guarantees hp covers it)
    slab_rows = _round8(TH + kh - 1)
    acc_dtype = jnp.float32
    precision = (jax.lax.Precision.HIGHEST if xp.dtype == jnp.float32
                 else jax.lax.Precision.DEFAULT)

    # double-buffered input slab: prefetch tile t+1's rows while tile t
    # computes, hiding the HBM->VMEM latency behind the patch build + dot
    # (gate: MFVI_DIP_CFCONV_DB=0 reverts to the serial copy-wait-compute)
    db = _os.environ.get("MFVI_DIP_CFCONV_DB", "1") != "0"
    n_buf = 2 if db else 1

    def kernel(x_hbm, wm_ref, o_ref, slab, patches, sem):
        t = pl.program_id(0)
        cur = t % n_buf

        def copy(idx, buf):
            return pltpu.make_async_copy(
                x_hbm.at[:, pl.ds(idx * TH, slab_rows), :],
                slab.at[buf], sem.at[buf])

        @pl.when(t == 0)
        def _():
            if i_pad != i_ch:
                patches[:] = jnp.zeros_like(patches)
            copy(0, 0).start()

        if db:
            @pl.when(t + 1 < n_tiles)
            def _():
                copy(t + 1, (t + 1) % n_buf).start()

        copy(t, cur).wait()
        for ky in range(kh):
            for kx in range(kw):
                tap = ky * kw + kx
                patches[tap * i_pad:tap * i_pad + i_ch] = (
                    slab[cur, :, ky:ky + TH, kx:kx + w_out])
        out = jax.lax.dot_general(
            wm_ref[:], patches[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=acc_dtype,
            precision=precision)
        o_ref[:] = out.astype(o_ref.dtype)

        if not db:
            @pl.when(t + 1 < n_tiles)
            def _():
                copy(t + 1, 0).start()

    scratch = [
        pltpu.VMEM((n_buf, i_ch, slab_rows, wp), xp.dtype),
        pltpu.VMEM((kh * kw * i_pad, TH, w_out), xp.dtype),
        pltpu.SemaphoreType.DMA((n_buf,)),
    ]

    grid = (n_tiles,)
    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pltpu.VMEM),
    ]
    out_specs = pl.BlockSpec((o_ch, TH, w_out), lambda t: (0, t, 0),
                             memory_space=pltpu.VMEM)

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=jax.ShapeDtypeStruct((o_ch, h_out, w_out), xp.dtype),
        scratch_shapes=scratch,
        cost_estimate=pl.CostEstimate(
            flops=2 * o_ch * kh * kw * i_pad * h_out * w_out,
            bytes_accessed=(xp.size + o_ch * h_out * w_out + wmat.size)
            * xp.dtype.itemsize,
            transcendentals=0),
        compiler_params=(None if _interpret() else pltpu.CompilerParams(
            # 24M, not the conservative 10M: wide-concat sites (i_ch=132) at
            # f32 need a ~16M Mosaic stack frame even at th=8 (v5e VMEM is
            # 128M/core; the bf16 production path stays well under 10M either
            # way). 10M OOM'd bench --metric train (f32/auto) at 256^2.
            vmem_limit_bytes=24 * 1024 * 1024,
            dimension_semantics=("arbitrary",))),
        interpret=_interpret(),
    )(xp, wmat)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def conv_valid_cf(xp: jnp.ndarray, w: jnp.ndarray, kdims) -> jnp.ndarray:
    """VALID conv: xp (I, Hp, Wp) x w (kh, kw, I, O) -> (O, H, W).
    ``kdims`` = (kh, kw) static (w's shape, passed statically for the vjp).
    Output heights that do not tile by TH are handled by zero-row padding
    (extra VALID outputs are sliced off — values unaffected)."""
    kh, kw = kdims
    i_pad = _round8(xp.shape[0])
    h_out = xp.shape[1] - kh + 1
    w_out = xp.shape[2] - kw + 1
    # Mosaic needs 128-aligned lane extents twice over: the HBM->VMEM DMA
    # slice width AND the (K, TH, w) -> (K, TH*w) patch reshape inside the
    # in-kernel dot. Run the kernel at a 128-padded output width on a
    # 128-padded input; the zero pad columns produce garbage VALID outputs
    # that are sliced off (values of the kept columns unaffected).
    w_run = -(-w_out // 128) * 128
    wp_target = -(-max(xp.shape[2], w_run + kw - 1) // 128) * 128
    th = _pick_th(xp.shape[0], kh, kw, wp_target, w_run, w.shape[3],
                  xp.dtype.itemsize)
    pad_r = (-h_out) % th
    h_run = h_out + pad_r
    # rows the kernel's (8-aligned) slab DMA can touch on its last tile
    need_rows = (h_run - th) + _round8(th + kh - 1)
    pad_rows = max(need_rows - xp.shape[1], pad_r)
    pad_cols = wp_target - xp.shape[2]
    if pad_rows or pad_cols:
        xp = jnp.pad(xp, ((0, 0), (0, pad_rows), (0, pad_cols)))
    out = _conv_call(xp, _wmat(w, i_pad), kh=kh, kw=kw,
                     h_out=h_run, w_out=w_run, th=th)
    if pad_r or w_run != w_out:
        out = out[:, :h_out, :w_out]
    return out


def _fwd(xp, w, kdims):
    return conv_valid_cf(xp, w, kdims), (xp, w)


@functools.partial(jax.jit, static_argnames=("kh", "kw", "th"))
def _dw_call(xp, g, *, kh: int, kw: int, th: int = TH):
    """All-tap weight gradient in ONE pass over the input.

    xp: (I, Hp, Wp) padded input; g: (O, h_run, w_run) zero-padded cotangent.
    Returns (kh*kw*i_pad, O) f32 = sum over output rows of
    patches(K, TH*W) @ g_block(O, TH*W)^T, accumulated across row tiles.

    Why: the XLA formulation (one dot per tap) re-reads the full input
    kh*kw times — ~40 MB of HBM traffic per 256^2 conv site versus ~4.5 MB
    here (input + cotangent each read once, patch build in VMEM)."""
    TH = th
    i_ch, hp, wp = xp.shape
    i_pad = _round8(i_ch)
    o_ch, h_run, w_run = g.shape
    n_tiles = h_run // TH
    slab_rows = _round8(TH + kh - 1)
    kk = kh * kw * i_pad
    precision = (jax.lax.Precision.HIGHEST if xp.dtype == jnp.float32
                 else jax.lax.Precision.DEFAULT)

    db = _os.environ.get("MFVI_DIP_CFCONV_DB", "1") != "0"
    n_buf = 2 if db else 1

    def kernel(x_hbm, g_ref, o_ref, slab, patches, sem):
        t = pl.program_id(0)
        cur = t % n_buf

        def copy(idx, buf):
            return pltpu.make_async_copy(
                x_hbm.at[:, pl.ds(idx * TH, slab_rows), :],
                slab.at[buf], sem.at[buf])

        @pl.when(t == 0)
        def _():
            if i_pad != i_ch:
                patches[:] = jnp.zeros_like(patches)
            o_ref[:] = jnp.zeros_like(o_ref)
            copy(0, 0).start()

        if db:
            # prefetch t+1 into the other buffer while t computes
            @pl.when(t + 1 < n_tiles)
            def _():
                copy(t + 1, (t + 1) % n_buf).start()

        copy(t, cur).wait()
        for ky in range(kh):
            for kx in range(kw):
                tap = ky * kw + kx
                patches[tap * i_pad:tap * i_pad + i_ch] = (
                    slab[cur, :, ky:ky + TH, kx:kx + w_run])
        # explicit f32 promotion: this dot contracts BOTH operands on their
        # lane dim (an A @ B^T), for which Mosaic inserts an operand
        # transpose — its implicit bf16->f32 vector.broadcast there does not
        # compile on v5e (same fix as the banded Radon's mul-reduce)
        pf = patches[:].reshape(kk, TH * w_run).astype(jnp.float32)
        gf = g_ref[:].reshape(o_ch, TH * w_run).astype(jnp.float32)
        contrib = jax.lax.dot_general(
            pf, gf,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision)
        o_ref[:] += contrib

        if not db:
            # serial mode: start the next copy only after this tile's
            # compute consumed the single buffer
            @pl.when(t + 1 < n_tiles)
            def _():
                copy(t + 1, 0).start()

    return pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((o_ch, TH, w_run), lambda t: (0, t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((kk, o_ch), lambda t: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((kk, o_ch), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((n_buf, i_ch, slab_rows, wp), xp.dtype),
            pltpu.VMEM((kk, TH, w_run), xp.dtype),
            pltpu.SemaphoreType.DMA((n_buf,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * kk * o_ch * h_run * w_run,
            bytes_accessed=(xp.size + g.size) * xp.dtype.itemsize,
            transcendentals=0),
        compiler_params=(None if _interpret() else pltpu.CompilerParams(
            # 24M, not the conservative 10M: wide-concat sites (i_ch=132) at
            # f32 need a ~16M Mosaic stack frame even at th=8 (v5e VMEM is
            # 128M/core; the bf16 production path stays well under 10M either
            # way). 10M OOM'd bench --metric train (f32/auto) at 256^2.
            vmem_limit_bytes=24 * 1024 * 1024,
            dimension_semantics=("arbitrary",))),
        interpret=_interpret(),
    )(xp, g)


def dw_valid_cf(xp: jnp.ndarray, g: jnp.ndarray, kdims) -> jnp.ndarray:
    """(kh, kw, I, O) weight gradient of the VALID conv, via _dw_call.
    Zero-pads the cotangent to tile/lane-aligned extents (zeros annihilate
    the padded input columns' garbage contributions) and the input so the
    slab DMA stays in bounds — mirrors conv_valid_cf's padding contract."""
    kh, kw = kdims
    i_ch = xp.shape[0]
    i_pad = _round8(i_ch)
    o_ch, h_out, w_out = g.shape
    w_run = -(-w_out // 128) * 128
    wp_target = -(-max(xp.shape[2], w_run + kw - 1) // 128) * 128
    # patches are bf16/f32 + an f32 promoted copy feeds the dot: count the
    # extra g block (extra_blocks=1) so the budget stays conservative
    th = _pick_th(i_ch, kh, kw, wp_target, w_run, o_ch,
                  xp.dtype.itemsize, extra_blocks=1)
    pad_r = (-h_out) % th
    h_run = h_out + pad_r
    need_rows = (h_run - th) + _round8(th + kh - 1)
    pad_rows = max(need_rows - xp.shape[1], 0)
    pad_cols = wp_target - xp.shape[2]
    if pad_rows or pad_cols:
        xp = jnp.pad(xp, ((0, 0), (0, pad_rows), (0, pad_cols)))
    if pad_r or w_run != w_out:
        g = jnp.pad(g, ((0, 0), (0, pad_r), (0, w_run - w_out)))
    out = _dw_call(xp, g, kh=kh, kw=kw, th=th)   # (kh*kw*i_pad, O) f32
    return out.reshape(kh, kw, i_pad, o_ch)[:, :, :i_ch, :]


def _bwd(kdims, res, g):
    xp, w = res
    kh, kw = kdims
    # dx: full correlation = valid conv of the zero-padded cotangent with the
    # flipped, in/out-transposed kernel — the same pallas kernel, via the
    # one-pad helper (the (kh-1) pad and the alignment pad fuse into one).
    w_flip = jnp.transpose(w[::-1, ::-1], (0, 1, 3, 2))   # (kh,kw,O,I)
    dx, _ = _conv_one_pad(g.astype(xp.dtype), w_flip.astype(xp.dtype),
                          kh, kw, kh - 1, "constant")
    if _os.environ.get("MFVI_DIP_FUSED_DW", "1") != "0":
        dw = dw_valid_cf(xp, g.astype(xp.dtype), kdims).astype(w.dtype)
        return dx, dw
    # fallback: one multi-dim dot per tap (contracting H, W) — plain XLA
    # dots, which carry none of the conv ops' layout preferences, but
    # re-read the input once per tap.
    h_out, w_out = g.shape[1], g.shape[2]
    taps = []
    for ky in range(kh):
        row = []
        for kx in range(kw):
            xs = jax.lax.slice(
                xp, (0, ky, kx),
                (xp.shape[0], ky + h_out, kx + w_out))
            row.append(jax.lax.dot_general(
                xs, g, dimension_numbers=(((1, 2), (1, 2)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST))   # (I, O)
        taps.append(row)
    dw = jnp.stack([jnp.stack(r) for r in taps]).astype(w.dtype)
    return dx, dw


conv_valid_cf.defvjp(_fwd, _bwd)


# ---------------------------------------------------------------------------
# One-pad padded conv: semantic (reflect/zero) + Mosaic alignment padding in
# a single jnp.pad. The legacy site chain materialized the image twice per
# conv site (nn/cf.py::reflection_pad, then conv_valid_cf's alignment pad) —
# together ~24% of the while-body's modeled cycles (round-5 HLO profile:
# cf.py:71 19.3% + cf_conv.py:226 5.1%).
# ---------------------------------------------------------------------------

def _align_for_valid(c: int, hp: int, wp_cols: int, kh: int, kw: int,
                     o_ch: int, itemsize: int):
    """Alignment amounts for the VALID kernel over a (c, hp, wp_cols) input
    (the exact conv_valid_cf formulas, factored so the one-pad path cannot
    drift from them)."""
    h_out = hp - kh + 1
    w_out = wp_cols - kw + 1
    w_run = -(-w_out // 128) * 128
    wp_target = -(-max(wp_cols, w_run + kw - 1) // 128) * 128
    th = _pick_th(c, kh, kw, wp_target, w_run, o_ch, itemsize)
    pad_r = (-h_out) % th
    h_run = h_out + pad_r
    need_rows = (h_run - th) + _round8(th + kh - 1)
    pad_rows = max(need_rows - hp, pad_r)
    pad_cols = wp_target - wp_cols
    return pad_rows, pad_cols, th, h_run, w_run, h_out, w_out


def _conv_one_pad(x, w, kh, kw, p, mode):
    """ONE combined pad + the valid kernel. Returns (out, xp); out is
    (O, H + 2p - kh + 1, W + 2p - kw + 1), xp the padded input (the dw
    residual). The alignment region's values never reach a kept output
    (those rows/cols only produce outputs that are sliced off), so padding
    it in ``mode`` is as correct as zero."""
    c, h, wid = x.shape
    i_pad = _round8(c)
    pad_rows, pad_cols, th, h_run, w_run, h_out, w_out = _align_for_valid(
        c, h + 2 * p, wid + 2 * p, kh, kw, w.shape[3], x.dtype.itemsize)
    if mode == "reflect" and (p + pad_rows > h - 1 or p + pad_cols > wid - 1):
        # reflect cannot span past the axis; split (tiny levels only)
        xp = jnp.pad(x, ((0, 0), (p, p), (p, p)), mode="reflect")
        xp = jnp.pad(xp, ((0, 0), (0, pad_rows), (0, pad_cols)))
    else:
        xp = jnp.pad(x, ((0, 0), (p, p + pad_rows), (p, p + pad_cols)),
                     mode=mode)
    out = _conv_call(xp, _wmat(w, i_pad), kh=kh, kw=kw,
                     h_out=h_run, w_out=w_run, th=th)
    if h_run != h_out or w_run != w_out:
        out = out[:, :h_out, :w_out]
    return out, xp


def _fold_axis(d, p: int, n: int, axis: int):
    """Transpose of a width-p reflect pad on ``axis`` (source length n):
    the mirrored border cotangents fold-add onto their source rows. Built
    as ONE concat of slices (adds only on the 2p border rows) — .at[].add
    lowers to scatter-flavored updates that measured ~8% slower end-to-end."""
    def sl(a, b):
        return tuple(slice(a, b) if i == axis else slice(None)
                     for i in range(d.ndim))
    rev = tuple(slice(None, None, -1) if i == axis else slice(None)
                for i in range(d.ndim))
    core = d[sl(p, p + n)]
    if p == 0:
        return core
    top = d[sl(0, p)][rev]                 # padded j=p-1..0 -> rows 1..p
    bot = d[sl(p + n, p + n + p)][rev]     # -> rows n-1-p..n-2
    return jnp.concatenate([
        core[sl(0, 1)],
        core[sl(1, p + 1)] + top,
        core[sl(p + 1, n - 1 - p)],
        core[sl(n - 1 - p, n - 1)] + bot,
        core[sl(n - 1, n)],
    ], axis=axis)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def conv_pad_cf(x: jnp.ndarray, w: jnp.ndarray, pdims) -> jnp.ndarray:
    """Padded conv: x (I, H, W) x w (kh, kw, I, O) -> (O, H', W') with the
    semantic padding applied inside. ``pdims`` = (kh, kw, p, mode) static;
    mode is 'reflect' (torch ReflectionPad2d semantics) or 'constant'."""
    kh, kw, p, mode = pdims
    out, _ = _conv_one_pad(x, w, kh, kw, p, mode)
    return out


def _pad_fwd(x, w, pdims):
    kh, kw, p, mode = pdims
    out, xp = _conv_one_pad(x, w, kh, kw, p, mode)
    return out, (xp, w, x.shape)


def _pad_bwd(pdims, res, g):
    kh, kw, p, mode = pdims
    xp, w, xshape = res
    _, h, wid = xshape
    dw = dw_valid_cf(xp, g.astype(xp.dtype), (kh, kw)).astype(w.dtype)
    # dx over the SEMANTICALLY padded extent via full correlation (the
    # alignment region's outputs were sliced off -> zero cotangent there);
    # one-pad again: the (kh-1) full-correlation pad + alignment fuse too.
    w_flip = jnp.transpose(w[::-1, ::-1], (0, 1, 3, 2))
    dxp, _ = _conv_one_pad(g.astype(xp.dtype), w_flip.astype(xp.dtype),
                           kh, kw, kh - 1, "constant")
    if mode == "reflect" and p:
        # fwd pads axis 1 then axis 2 (np.pad order); transpose composes
        # in reverse: fold cols first, then rows
        dxp = _fold_axis(dxp, p, wid, axis=2)
        dx = _fold_axis(dxp, p, h, axis=1)
    else:
        dx = dxp[:, p:p + h, p:p + wid]
    return dx, dw


conv_pad_cf.defvjp(_pad_fwd, _pad_bwd)


def _conv_s2_planes(xs: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Stride-2 conv as space-to-depth parity planes + ONE dense stride-1
    VALID conv at half resolution.

        out[o,y,x] = sum_{dy,dx} w[dy,dx] xs[2y+dy, 2x+dx]
                   = sum_{p,q} sum_{dy',dx'} w[2dy'+p, 2dx'+q]
                                             x_pq[y+dy', x+dx']

    with x_pq = xs[p::2, q::2] stacked as 4*C channels. For k=3 the plane
    kernel is 2x2 with one zero tap row/col per odd parity — 16/9 of the
    original FLOPs, but at 4x the input channels and 1/4 the pixels the MXU
    K-tiles fill 4x better AND the old path's stride-1-then-subsample 4x
    overcompute (plus its 4x-cost full-correlation backward) disappears:
    the d0 site (16->16, 256^2 in) measures 3.4x faster fwd+bwd."""
    kh, kw, c, o = w.shape
    k2 = (kh + 1) // 2
    h_out = (xs.shape[1] - kh) // 2 + 1
    w_out = (xs.shape[2] - kw) // 2 + 1
    # planes need m >= h_out + k2 - 1 rows each -> 2m rows of input
    m = h_out + k2 - 1
    n = w_out + k2 - 1
    need_h, need_w = 2 * m, 2 * n
    pad_h = max(0, need_h - xs.shape[1])
    pad_w = max(0, need_w - xs.shape[2])
    if pad_h or pad_w:
        xs = jnp.pad(xs, ((0, 0), (0, pad_h), (0, pad_w)))
    xs = xs[:, :need_h, :need_w]
    planes = (xs.reshape(c, m, 2, n, 2)
              .transpose(2, 4, 0, 1, 3)          # (p, q, C, m, n)
              .reshape(4 * c, m, n))
    # plane kernel (k2, k2, 4C, O): tap (dy', dx') of plane (p, q) is the
    # original tap (2dy'+p, 2dx'+q), zero where that exceeds k; the channel
    # blocks concatenate in the planes' (p*2+q) order
    zero = jnp.zeros((c, o), w.dtype)
    rows = []
    for dy in range(k2):
        cols = []
        for dx in range(k2):
            blocks = []
            for p in range(2):
                for q in range(2):
                    oy, ox = 2 * dy + p, 2 * dx + q
                    blocks.append(w[oy, ox] if (oy < kh and ox < kw)
                                  else zero)
            cols.append(jnp.concatenate(blocks, axis=0))   # (4C, O)
        rows.append(jnp.stack(cols))
    wm = jnp.stack(rows)                                   # (k2, k2, 4C, O)
    out = conv_valid_cf(planes, wm, (k2, k2))
    return out[:, :h_out, :w_out]


def conv2d_cf_pallas(x: jnp.ndarray, w: jnp.ndarray,
                     b: jnp.ndarray | None = None, stride: int = 1,
                     padding: int = 0, pad_mode: str = "zero") -> jnp.ndarray:
    """Drop-in NCHW conv (batch 1) on the pallas valid kernel.

    x: (1, I, H, W); w: (kh, kw, I, O) HWIO (shared pytree layout);
    returns (1, O, H_out, W_out) with torch cross-correlation semantics.
    Falls back to the XLA NCHW conv for unsupported shapes."""
    from ...nn import cf as cf_layers

    kh = w.shape[0]
    xs = x[0]
    mode = "reflect" if pad_mode == "reflection" else "constant"
    if (padding and stride == 1 and w.ndim == 4
            and w.shape[0] == w.shape[1] and kh in (1, 3, 5)
            and xs.shape[2] + 2 * padding - kh + 1 >= 64
            and _os.environ.get("MFVI_DIP_ONE_PAD", "0") != "0"):
        # merged one-pad FORWARD path — measured NEGATIVE on the v5e and
        # therefore default-OFF (MFVI_DIP_ONE_PAD=1 re-enables): same-session
        # CT MFVI A/B 313-320 it/s merged vs 340.9 split (the asymmetric
        # reflect covering the alignment region lowers worse than
        # reflect-then-constant, even with the concat-style fold transpose).
        # The rest of this change IS the win and stays on: conv_valid_cf's
        # bwd dx one-pad (constant) + the one-pass BN landed +5% vs the r4
        # bench at the same methodology (323.75 -> 340.9).
        out = conv_pad_cf(xs, w, (kh, kh, padding, mode))[None]
        if b is not None:
            out = out + b[None, :, None, None]
        return out
    if padding:
        xs = jnp.pad(xs, ((0, 0), (padding, padding), (padding, padding)),
                     mode=mode)
    if not supported(xs, w, stride):
        xin = xs[None]
        out = cf_layers.conv2d(xin, w, None, stride, 0)
    elif stride == 2:
        w_out = (xs.shape[2] - kh) // 2 + 1
        if kh == 1:
            # 1x1 stride-2: subsampling commutes with the conv
            out = conv_valid_cf(xs[:, ::2, ::2], w, (1, 1))[None]
        elif w_out >= 64:
            # half-res planes keep a lane-worthy width
            out = _conv_s2_planes(xs, w)[None]
        else:
            out = conv_valid_cf(xs, w, (kh, kh))[None][:, :, ::2, ::2]
    else:
        out = conv_valid_cf(xs, w, (kh, kh))[None]
    if b is not None:
        out = out + b[None, :, None, None]
    return out

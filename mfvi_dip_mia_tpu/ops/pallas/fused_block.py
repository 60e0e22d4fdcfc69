"""Fused conv + train-mode BatchNorm + LeakyReLU as VMEM-resident Pallas
kernels (channels-first layout).

Why: round-3 TPU profiling (scripts/time_components.py + A/B sweeps, all
with forced host materialization — see the relay caveat in that script) put
one XLA conv+BN+LReLU block at 256^2/C=16 at ~900 us fwd+bwd while its HBM
bandwidth floor is ~35 us: XLA lays small-channel activations out
channels-on-lanes (C=16 of 128), pads every vector 8x, and materializes
each op of the chain through HBM. At DIP sizes the whole activation fits
VMEM ((16, 256, 256) f32 = 4 MB of ~16 MB/core), so a fused kernel streams
x and out exactly once through HBM and runs the entire chain on-chip:

  forward (one pallas_call, in-place two-pass BN):
    pass 1  per 8-row tile: aligned 16-row window -> VMEM scratch; patches
            (K=k*k*Ci, 8, W) <- static tap slices of the window; conv tile =
            wmat (Co, K) @ patches (MXU, HIGHEST); per-channel running sums
            -> (Co, W) accumulators; conv written into the out buffer
    pass 2  mu/var finalized (biased, over H*W; exact two-pass variance);
            per tile: out <- lrelu((conv-mu)*rsqrt(var+eps)*gamma + beta)
    emits (out, stats) with stats = [mu, inv] per channel (bwd residual)

  backward (three pallas_calls; the inter-kernel pad is one cheap XLA pad):
    bwd_dc: (g, out, stats, gamma, beta) -> dconv (unpadded), dgamma, dbeta.
            xhat is recomputed from the block OUTPUT (lrelu inverted by
            sign — no conv residual is stored).
    bwd_dw: (dconv, x_padded) -> dw via per-tile (Co, TH*W) @ (TH*W, K) dots
    bwd_dx: (dconv zero-padded, flipped/transposed wmat) -> dx — the same
            conv kernel structure as the forward (a full correlation)

Mosaic alignment rules baked in (learned via cf_conv + this kernel's first
compile): dynamic sublane offsets must be provably 8-aligned, so every
dynamic slice starts at t*8 and unaligned tap offsets are STATIC slices of
an aligned 16-row window scratch; all stores are tile-aligned and
zero-offset (padding between kernels happens in XLA, one ~10 us pad).

Semantics pinned against the XLA path in tests/test_fused_block.py (fwd and
all four grads, reflection and zero padding, k in {1, 3}). Reference block:
models/common.py:100-135 (Conv2d -> BatchNorm2d train mode ->
LeakyReLU(0.2)); bias elision is valid pre-BN (see nn/var_conv.py::
apply_conv_leaf skip_bias).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TH = 8                      # rows per tile (f32 sublane tile)
WIN = 2 * TH                # aligned row window holding TH + k - 1 rows
VMEM_BUDGET = 15 * 1024 * 1024
DX_SEG_BUDGET = 11 * 1024 * 1024   # per-segment budget for the dx kernel


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _precision():
    """MXU precision for the kernel dots. The kernel is MXU-pass-bound at
    these channel counts (one matmul dim is always C/128 of the array), so
    HIGHEST (3x bf16 passes) costs ~3x. DEFAULT matches what XLA's own conv
    lowering does on TPU (measured 2.2e-3 rel error vs f64 — the status quo
    for every unfused conv in this repo), while this kernel at HIGHEST is
    2.4e-7. Env MFVI_DIP_FUSED_PRECISION={default,highest} overrides; tests
    pin exactness in interpret mode where jnp math is f32 regardless."""
    import os
    v = os.environ.get("MFVI_DIP_FUSED_PRECISION", "default")
    return (jax.lax.Precision.HIGHEST if v == "highest"
            else jax.lax.Precision.DEFAULT)


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


def supported(ci: int, co: int, h: int, w: int, k: int) -> bool:
    """Static gate: shapes the fused path handles. Callers fall back to the
    unfused XLA ops when False."""
    if k not in (1, 3):
        return False
    if w % 128 != 0 or h % TH != 0 or w < 128:
        return False
    wp = _round_up(w + (k - 1), 128)
    x_b = ci * (h + TH) * wp * 4
    o_b = co * h * w * 4
    patch_b = (k * k * ci + ci) * WIN * w * 4
    if x_b + o_b + patch_b + 4 * co * w * 4 > VMEM_BUDGET:
        return False
    return True


def _wmat(w: jnp.ndarray) -> jnp.ndarray:
    """(k, k, Ci, Co) HWIO -> (Co, k*k*Ci) with tap-major K ordering that
    matches the kernel's patch build."""
    k, _, ci, co = w.shape
    return jnp.transpose(w, (3, 0, 1, 2)).reshape(co, k * k * ci)


def _conv_tile_fn(k, ci, w, xp_ref, win_ref, patch_ref):
    """Shared tap-patch builder: aligned 16-row window copy + static slices.
    Returns a function tile(y0) that fills patch_ref for output rows
    y0..y0+TH (xp_ref must hold rows y0..y0+WIN)."""
    def build(y0):
        win_ref[:] = xp_ref[:, pl.ds(y0, WIN), :]
        if k == 1:
            patch_ref[:] = win_ref[:, 0:TH, 0:w]
        else:
            for ky in range(k):
                for kx in range(k):
                    tap = ky * k + kx
                    patch_ref[tap * ci:(tap + 1) * ci] = (
                        win_ref[:, ky:ky + TH, kx:kx + w])
    return build


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

@functools.partial(jax.jit,
                   static_argnames=("k", "h", "w", "slope", "eps"))
def _fwd_call(xp, wmat, gamma, beta, *, k, h, w, slope, eps):
    """xp: (Ci, h + TH, Wp) pre-padded input (rows h + k - 1 real, rest
    zero); returns (out (Co, h, w), stats (Co, 2): [mu, inv])."""
    ci = xp.shape[0]
    wp = xp.shape[2]
    co = wmat.shape[0]
    kk = k * k
    n_tiles = h // TH
    inv_hw = 1.0 / (h * w)

    def kernel(xp_ref, wm_ref, gam_ref, bet_ref, out_ref, stat_ref,
               win_ref, patch_ref, acc_ref):
        build = _conv_tile_fn(k, ci, w, xp_ref, win_ref, patch_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

        def conv_tile(t, _):
            y0 = t * TH
            build(y0)
            c = jax.lax.dot_general(
                wm_ref[:], patch_ref[:],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=_precision())                  # (Co, TH, w)
            out_ref[:, pl.ds(y0, TH), :] = c
            acc_ref[0:co] += jnp.sum(c, axis=1)          # (Co, w)
            return 0

        jax.lax.fori_loop(0, n_tiles, conv_tile, 0)
        mu = jnp.sum(acc_ref[0:co], axis=1, keepdims=True) * inv_hw  # (Co,1)

        # ---- pass 2: centered variance (exact two-pass BN semantics) ----
        acc_ref[co:2 * co] = jnp.zeros_like(acc_ref[co:2 * co])

        def var_tile(t, _):
            y0 = t * TH
            c = out_ref[:, pl.ds(y0, TH), :]
            d = c - mu[:, :, None]
            acc_ref[co:2 * co] += jnp.sum(d * d, axis=1)
            return 0

        jax.lax.fori_loop(0, n_tiles, var_tile, 0)
        var = jnp.sum(acc_ref[co:2 * co], axis=1, keepdims=True) * inv_hw
        inv = jax.lax.rsqrt(var + eps)                   # (Co, 1)

        stat_ref[0:co, 0:1] = mu
        stat_ref[0:co, 1:2] = inv

        ga = gam_ref[0:co, 0:1][:, :, None]
        be = bet_ref[0:co, 0:1][:, :, None]

        def norm_tile(t, _):
            y0 = t * TH
            c = out_ref[:, pl.ds(y0, TH), :]
            y = (c - mu[:, :, None]) * inv[:, :, None] * ga + be
            out_ref[:, pl.ds(y0, TH), :] = jnp.where(y > 0, y, slope * y)
            return 0

        jax.lax.fori_loop(0, n_tiles, norm_tile, 0)

    out, stats = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((co, h, w), jnp.float32),
                   jax.ShapeDtypeStruct((co, 2), jnp.float32)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        scratch_shapes=[
            pltpu.VMEM((ci, WIN, wp), jnp.float32),
            pltpu.VMEM((kk * ci, TH, w), jnp.float32),
            pltpu.VMEM((2 * co, w), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * co * kk * ci * h * w + 8 * co * h * w,
            bytes_accessed=(xp.size + 2 * co * h * w) * 4,
            transcendentals=0),
        interpret=_interpret(),
    )(xp, wmat, gamma.reshape(co, 1), beta.reshape(co, 1))
    return out, stats


# ---------------------------------------------------------------------------
# backward kernels
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("k", "h", "w", "slope", "eps"))
def _bwd_dc_call(g, out, stats, gamma, beta, *, k, h, w, slope, eps):
    """(g, out, stats) -> (dconv (Co, h, w) unpadded, dgamma (Co,),
    dbeta (Co,)). xhat recomputed from out."""
    co = g.shape[0]
    n_tiles = h // TH
    inv_hw = 1.0 / (h * w)

    def kernel(g_ref, out_ref, stat_ref, gam_ref, bet_ref,
               dc_ref, dgb_ref, acc_ref):
        ga = gam_ref[0:co, 0:1][:, :, None]
        be = bet_ref[0:co, 0:1][:, :, None]
        inv = stat_ref[0:co, 1:2][:, :, None]
        # gamma can be ~0 early in training; xhat = (y - beta) / gamma needs
        # a safe reciprocal (the ga * rg product is exact where it is used)
        rg = 1.0 / jnp.where(jnp.abs(ga) < 1e-20, 1e-20, ga)

        acc_ref[:] = jnp.zeros_like(acc_ref)

        def red_tile(t, _):
            y0 = t * TH
            o = out_ref[:, pl.ds(y0, TH), :]
            gt = g_ref[:, pl.ds(y0, TH), :]
            mask = o > 0
            y = jnp.where(mask, o, o * (1.0 / slope))
            xhat = (y - be) * rg
            gp = jnp.where(mask, gt, slope * gt)
            acc_ref[0:co] += jnp.sum(gp, axis=1)
            acc_ref[co:2 * co] += jnp.sum(gp * xhat, axis=1)
            return 0

        jax.lax.fori_loop(0, n_tiles, red_tile, 0)
        s1 = jnp.sum(acc_ref[0:co], axis=1, keepdims=True)        # (Co,1)
        s2 = jnp.sum(acc_ref[co:2 * co], axis=1, keepdims=True)
        dgb_ref[0:co, 0:1] = s2                                   # dgamma
        dgb_ref[0:co, 1:2] = s1                                   # dbeta
        m1 = s1[:, :, None] * inv_hw
        m2 = s2[:, :, None] * inv_hw

        def dc_tile(t, _):
            y0 = t * TH
            o = out_ref[:, pl.ds(y0, TH), :]
            gt = g_ref[:, pl.ds(y0, TH), :]
            mask = o > 0
            y = jnp.where(mask, o, o * (1.0 / slope))
            xhat = (y - be) * rg
            gp = jnp.where(mask, gt, slope * gt)
            dc_ref[:, pl.ds(y0, TH), :] = inv * ga * (gp - m1 - xhat * m2)
            return 0

        jax.lax.fori_loop(0, n_tiles, dc_tile, 0)

    dc, dgb = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((co, h, w), jnp.float32),
                   jax.ShapeDtypeStruct((co, 2), jnp.float32)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        scratch_shapes=[pltpu.VMEM((2 * co, w), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=14 * co * h * w,
            bytes_accessed=(3 * co * h * w) * 4, transcendentals=0),
        interpret=_interpret(),
    )(g, out, stats, gamma.reshape(co, 1), beta.reshape(co, 1))
    return dc, dgb[:, 0], dgb[:, 1]


@functools.partial(jax.jit, static_argnames=("k", "h", "w"))
def _bwd_dw_call(dc, xp, *, k, h, w):
    """dw (Co, K) = sum over tiles of dc_tile (Co, TH, w) . patches
    (K, TH, w) contracted over (rows, cols). dc unpadded; xp the forward's
    padded input."""
    co = dc.shape[0]
    ci = xp.shape[0]
    wp = xp.shape[2]
    kk = k * k
    n_tiles = h // TH

    def kernel(dc_ref, xp_ref, dw_ref, win_ref, patch_ref):
        build = _conv_tile_fn(k, ci, w, xp_ref, win_ref, patch_ref)
        dw_ref[:] = jnp.zeros_like(dw_ref)

        def tile(t, _):
            y0 = t * TH
            build(y0)
            d2 = dc_ref[:, pl.ds(y0, TH), :].reshape(co, TH * w)
            p2 = patch_ref[:].reshape(kk * ci, TH * w)
            dw_ref[:] += jax.lax.dot_general(
                d2, p2,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=_precision())                  # (Co, K)
            return 0

        jax.lax.fori_loop(0, n_tiles, tile, 0)

    dw = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((co, kk * ci), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((ci, WIN, wp), jnp.float32),
            pltpu.VMEM((kk * ci, TH, w), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * co * kk * ci * h * w,
            bytes_accessed=(dc.size + xp.size) * 4, transcendentals=0),
        interpret=_interpret(),
    )(dc, xp)
    return dw


@functools.partial(jax.jit, static_argnames=("k", "h_out", "w_out"))
def _bwd_dx_call(dcp, wmat_flip, *, k, h_out, w_out):
    """Full correlation: dcp (Co, h_out + TH, Wq) zero-padded cotangent
    (k - 1 rows/cols of zeros around the (h, w) interior), wmat_flip =
    _wmat of the flipped, in/out-transposed kernel. Returns
    (Ci, h_out, w_out) = grad wrt the forward's padded input (rows beyond
    h + k - 1 / cols beyond w + k - 1 are produced but sliced by the
    caller; their forward pixels were never read so any value is unused)."""
    co = dcp.shape[0]
    wq = dcp.shape[2]
    ci = wmat_flip.shape[0]
    kk = k * k
    n_tiles = h_out // TH

    def kernel(dcp_ref, wm_ref, dx_ref, win_ref, patch_ref):
        build = _conv_tile_fn(k, co, w_out, dcp_ref, win_ref, patch_ref)

        def tile(t, _):
            y0 = t * TH
            build(y0)
            d = jax.lax.dot_general(
                wm_ref[:], patch_ref[:],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=_precision())                  # (Ci, TH, w_out)
            dx_ref[:, pl.ds(y0, TH), :] = d
            return 0

        jax.lax.fori_loop(0, n_tiles, tile, 0)

    dx = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((ci, h_out, w_out), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((co, WIN, wq), jnp.float32),
            pltpu.VMEM((kk * co, TH, w_out), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * ci * kk * co * h_out * w_out,
            bytes_accessed=(dcp.size + ci * h_out * w_out) * 4,
            transcendentals=0),
        interpret=_interpret(),
    )(dcp, wmat_flip)
    return dx


# ---------------------------------------------------------------------------
# public op with custom VJP
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def conv_bn_lrelu_cf(xp, w, gamma, beta, k, slope, eps):
    """Fused VALID conv + train-BN + LeakyReLU on channels-first tensors.

    xp: (Ci, H + TH, Wp) pre-padded input (rows H + k - 1 real; Wp
    128-aligned with cols beyond W + k - 1 zero); w: (k, k, Ci, Co) HWIO.
    Returns (Co, H, W) where W is the largest 128-multiple that fits the
    valid conv (the caller's true width by construction — see apply_fused).
    """
    out, _ = _fwd_core(xp, w, gamma, beta, k, slope, eps)
    return out


def _fwd_core(xp, w, gamma, beta, k, slope, eps):
    h = xp.shape[1] - TH
    wlog = (xp.shape[2] - (k - 1)) // 128 * 128
    return _fwd_call(xp, _wmat(w), gamma, beta, k=k, h=h, w=wlog,
                     slope=slope, eps=eps)


def _vjp_fwd(xp, w, gamma, beta, k, slope, eps):
    out, stats = _fwd_core(xp, w, gamma, beta, k, slope, eps)
    return out, (xp, w, gamma, beta, out, stats)


def _vjp_bwd(k, slope, eps, res, g):
    xp, w, gamma, beta, out, stats = res
    ci = xp.shape[0]
    co, h, wlog = out.shape
    dc, dgamma, dbeta = _bwd_dc_call(g, out, stats, gamma, beta,
                                     k=k, h=h, w=wlog, slope=slope, eps=eps)
    dw_flat = _bwd_dw_call(dc, xp, k=k, h=h, w=wlog)
    dw = dw_flat.reshape(co, k, k, ci).transpose(1, 2, 3, 0)

    # dx: full correlation of the zero-padded dc with the flipped kernel.
    # Output rows/cols cover the padded input (h + k - 1, w + k - 1); pad
    # the run to tile/lane multiples and slice after (values unaffected).
    # Row-SEGMENTED when the VMEM working set would not fit in one call
    # (256^2: the tile-padded dcp alone is ~9 MB): each segment reads only
    # the dcp rows its windows touch — conv locality makes the split exact.
    h_out = _round_up(h + k - 1, TH)
    w_out = _round_up(wlog + k - 1, 128)
    pad_top = k - 1
    dcp = jnp.pad(dc, ((0, 0),
                       (pad_top, h_out + TH - h - pad_top),
                       (pad_top, w_out + k - 1 - wlog - pad_top)))
    w_flip = jnp.transpose(w[::-1, ::-1], (0, 1, 3, 2))   # (k,k,Co,Ci)
    wmf = _wmat(w_flip)
    wq_tiles = _round_up(dcp.shape[2], 128)
    per_row = (co * wq_tiles + ci * w_out + 0) * 4        # dcp + dx bytes/row
    fixed = (co * WIN * wq_tiles + k * k * co * TH * w_out) * 4
    n_seg = 1
    while (fixed + per_row * (h_out // n_seg + TH)) > DX_SEG_BUDGET \
            and n_seg < 8:
        n_seg *= 2
    seg_rows = _round_up(h_out // n_seg, TH)
    parts = []
    for si in range(n_seg):
        s0 = si * seg_rows
        h_seg = min(seg_rows, h_out - s0)
        if h_seg <= 0:
            break
        dcp_seg = jax.lax.slice(
            dcp, (0, s0, 0), (co, s0 + h_seg + TH, dcp.shape[2]))
        parts.append(_bwd_dx_call(dcp_seg, wmf, k=k, h_out=h_seg,
                                  w_out=w_out))
    dx_run = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=1)
    # embed into the padded-input shape (Ci, h + TH, Wp)
    dx = jnp.zeros(xp.shape, xp.dtype)
    hx = min(h + k - 1, h_out)
    wx = min(wlog + k - 1, w_out, xp.shape[2])
    dx = dx.at[:, :hx, :wx].set(dx_run[:, :hx, :wx])
    return dx, dw, dgamma, dbeta


conv_bn_lrelu_cf.defvjp(_vjp_fwd, _vjp_bwd)


def apply_fused(x_cf: jnp.ndarray, w: jnp.ndarray, gamma: jnp.ndarray,
                beta: jnp.ndarray, *, pad_mode: str = "reflection",
                slope: float = 0.2, eps: float = 1e-5):
    """(1, Ci, H, W) -> (1, Co, H, W): 'same' conv (k in {1,3}) + BN +
    LeakyReLU. Returns None if unsupported (caller falls back to XLA ops)."""
    n, ci, h, wd = x_cf.shape
    k = int(w.shape[0])
    co = int(w.shape[3])
    if (n != 1 or x_cf.dtype != jnp.float32 or w.ndim != 4
            or not supported(ci, co, h, wd, k)):
        return None
    p = (k - 1) // 2
    wp = _round_up(wd + (k - 1), 128)
    xs = x_cf[0]
    if p:
        mode = "reflect" if pad_mode == "reflection" else "constant"
        xs = jnp.pad(xs, ((0, 0), (p, p), (p, p)), mode=mode)
    xs = jnp.pad(xs, ((0, 0), (0, h + TH - xs.shape[1]),
                      (0, wp - xs.shape[2])))
    out = conv_bn_lrelu_cf(xs, w, gamma, beta, k, slope, eps)
    return out[None]

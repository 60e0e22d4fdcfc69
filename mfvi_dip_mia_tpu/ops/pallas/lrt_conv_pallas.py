"""Fused local-reparameterization double conv as a Pallas TPU kernel.

The LRT forward needs TWO convolutions over the SAME input patches
(ref BayTorch/modules/reparam_layers.py:58-72):

    act_mu  = conv(x,   W_mu)
    act_var = conv(x^2, softplus(W_rho)^2)

The XLA fallback (`lrt_conv._fused_double_conv`) expresses this as one conv
with inputs stacked on the feature axis and block-diagonal weights — a single
MXU pass, but HALF its FLOPs multiply structural zeros (the off-diagonal
weight blocks), so it pays 2x the useful MXU work. This kernel streams each
input row tile ONCE, squares each tap's slab in-register, and accumulates one
dense contraction per (dy, dx) tap with zero wasted FLOPs:

    act_mu  += x_pad[dy : dy+TH, dx : dx+W_out, :]   . W_mu[dy, dx]
    act_var += x_pad[dy : dy+TH, dx : dx+W_out, :]^2 . W_var[dy, dx]

(the single K=kh*kw*C im2col dot form is not Mosaic-compilable at small C —
see the layout note inside the kernel).

Grid is over output row tiles; the whole (padded) input is VMEM-resident
across the grid (constant-index BlockSpec — fetched once; ~4-17 MB at the
skip net's LRT sites, gated in ``supported``) because halo'd row-slab blocks
cannot be expressed as non-overlapping BlockSpecs and a manual halo DMA is
not Mosaic-compilable at small C (see the kernel's layout note). Weights are
VMEM-resident across the grid. f32 accumulation at HIGHEST precision —
matches the fallback to summation-order tolerance.

Scope: stride 1, square kernels (1x1 / 3x3 — every stride-1 conv site in the
skip net, nn/skip.py). Stride-2 downsampling sites keep the XLA path
(`lrt_conv` dispatches). The backward is plain XLA (conv_transpose for dx,
patch-correlation for dWmu/dWvar) via custom_vjp — XLA already fuses those
into the surrounding gradient program well; the win here is the forward's
sampled-activation path, which runs once per MC sample at eval too.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TH = 8  # output rows per grid step


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def supported(x, w_mu, stride: int, padding: int) -> bool:
    """Static shape gate; callers fall back to the XLA path when False."""
    if stride != 1 or w_mu.ndim != 4:
        return False
    if x.shape[0] != 1:
        # the kernel DMAs batch 0 only (x_hbm.at[0, ...]) and pins its output
        # batch block to 0 — other batches would be silently unwritten
        return False
    kh, kw, _, _ = w_mu.shape
    if kh != kw or kh not in (1, 3):
        return False
    n, h, w, cin = x.shape
    h_out = h + 2 * padding - kh + 1
    w_out = w + 2 * padding - kw + 1
    # whole-input VMEM residency (see module docstring): stay well under
    # the 100 MB vmem_limit with room for outputs/weights/pipelining
    if (h + 2 * padding) * (w + 2 * padding) * cin * 4 > 48 * 1024 * 1024:
        return False
    return h_out % TH == 0 and w_out >= 128 // 8 and w_out % 8 == 0


def _double_conv_fwd(xp, w_mu_mat, w_var_mat, *, kh: int, kw: int,
                     h_out: int, w_out: int):
    """xp: (N, Hp, Wp, C) pre-padded input; w_*_mat: (kh*kw*C, O).
    Returns (act_mu, act_var), each (N, h_out, w_out, O) f32."""
    n, hp, wp, c = xp.shape
    o = w_mu_mat.shape[1]
    n_tiles = h_out // TH

    def kernel(x_ref, wmu_ref, wvar_ref, omu_ref, ovar_ref):
        i = pl.program_id(0)
        # Per-tap accumulation over VMEM-resident input: one
        # (TH, w_out, c) x (c, O) dot per (dy, dx) tap, accumulated
        # in-register. Two designs Mosaic REFUSES on real v5e (both pass
        # interpret mode): (a) the single K=kh*kw*c im2col dot, because the
        # patch tensor needs jnp.concatenate of shifted slices whose
        # (sublane, lane) vpad offsets differ ("result/input offset
        # mismatch on non-concat dimension"), with the lane-offset VMEM
        # staging-scratch variant tripping the next constraint (c=16 stores
        # into a 128-tiled lane dim); (b) a manual halo row-slab DMA from a
        # pl.ANY input, because the memref_slice of the (.., c=16) minor
        # dim of a (1,128)-tiled memref is rejected. Whole-input VMEM
        # residency + vector loads with dynamic row offsets compile clean;
        # each tap's slab is read once and feeds BOTH contractions, which
        # is the kernel's point (the XLA fallback streams x and x^2
        # separately and multiplies structural zeros in the block-diagonal
        # weights).
        acc_mu = jnp.zeros((TH, w_out, o), jnp.float32)
        acc_var = jnp.zeros((TH, w_out, o), jnp.float32)
        dn = (((2,), (0,)), ((), ()))
        for dy in range(kh):
            for dx in range(kw):
                idx = dy * kw + dx
                slab = x_ref[0, pl.ds(i * TH + dy, TH), dx:dx + w_out, :]
                acc_mu = acc_mu + jax.lax.dot_general(
                    slab, wmu_ref[idx * c:(idx + 1) * c, :],
                    dimension_numbers=dn,
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
                acc_var = acc_var + jax.lax.dot_general(
                    slab * slab, wvar_ref[idx * c:(idx + 1) * c, :],
                    dimension_numbers=dn,
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
        omu_ref[0] = acc_mu
        ovar_ref[0] = acc_var

    out_spec = pl.BlockSpec((1, TH, w_out, o), lambda i: (0, i, 0, 0))
    compiler_params = (None if _interpret() else
                       pltpu.CompilerParams(
                           vmem_limit_bytes=100 * 1024 * 1024))
    act_mu, act_var = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, hp, wp, c), lambda i: (0, 0, 0, 0)),
            pl.BlockSpec((kh * kw * c, o), lambda i: (0, 0)),
            pl.BlockSpec((kh * kw * c, o), lambda i: (0, 0)),
        ],
        out_specs=[out_spec, out_spec],
        out_shape=[jax.ShapeDtypeStruct((n, h_out, w_out, o), jnp.float32)] * 2,
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * h_out * w_out * kh * kw * c * o,
            bytes_accessed=xp.size * xp.dtype.itemsize
            + 2 * kh * kw * c * o * 4 + 2 * n * h_out * w_out * o * 4,
            transcendentals=0),
        compiler_params=compiler_params,
        interpret=_interpret(),
    )(xp, w_mu_mat, w_var_mat)
    return act_mu, act_var


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def lrt_double_conv_pallas(x, w_mu, w_var, stride: int, padding: int):
    """[conv(x, w_mu), conv(x^2, w_var)] — fused single-stream Pallas forward.

    x: (N, H, W, C) NHWC; w_mu / w_var: (kh, kw, C, O) HWIO; stride must be 1
    (see ``supported``). Gradient support via custom_vjp (XLA backward).
    """
    return _fwd_impl(x, w_mu, w_var, padding)


def _fwd_impl(x, w_mu, w_var, padding):
    kh, kw, c, o = w_mu.shape
    n, h, w, _ = x.shape
    h_out = h + 2 * padding - kh + 1
    w_out = w + 2 * padding - kw + 1
    xp = jnp.pad(x, ((0, 0), (padding, padding), (padding, padding), (0, 0)))
    wm = w_mu.reshape(kh * kw * c, o).astype(jnp.float32)
    wv = w_var.reshape(kh * kw * c, o).astype(jnp.float32)
    act_mu, act_var = _double_conv_fwd(
        xp.astype(jnp.float32), wm, wv, kh=kh, kw=kw, h_out=h_out,
        w_out=w_out)
    return act_mu.astype(x.dtype), act_var.astype(x.dtype)


def _vjp_fwd(x, w_mu, w_var, stride, padding):
    return _fwd_impl(x, w_mu, w_var, padding), (x, w_mu, w_var)


def _vjp_bwd(stride, padding, res, cots):
    """XLA backward: dx = convT(g_mu, w_mu) + 2x * convT(g_var, w_var);
    dW = correlation(input, cotangent) — the standard conv transpose pair."""
    x, w_mu, w_var = res
    g_mu, g_var = cots
    dimn = jax.lax.conv_dimension_numbers(
        x.shape, w_mu.shape, ("NHWC", "HWIO", "NHWC"))
    kh, kw, _, _ = w_mu.shape
    pads = [(kh - 1 - padding, kh - 1 - padding),
            (kw - 1 - padding, kw - 1 - padding)]

    def conv_t(g, w):
        # stride-1 transpose = correlation with the spatially-flipped kernel
        w_flip = jnp.flip(w, axis=(0, 1)).swapaxes(2, 3)  # (kh,kw,O,C)
        return jax.lax.conv_general_dilated(
            g, w_flip, (1, 1), pads, dimension_numbers=dimn,
            precision=jax.lax.Precision.HIGHEST)

    def conv_w(inp, g):
        # dW[dy,dx,c,o] = sum_{n,y,x} inp[n,y+dy-p,x+dx-p,c] * g[n,y,x,o]:
        # a conv with batch<->feature swapped — lhs (C,H,W,N) "batch"=C,
        # rhs (H_out,W_out,N,O) kernel contracting the true batch axis.
        lhs = inp.transpose(3, 1, 2, 0)      # (C, H, W, N)
        rhs = g.transpose(1, 2, 0, 3)        # (H_out, W_out, N, O)
        dn = jax.lax.conv_dimension_numbers(
            lhs.shape, rhs.shape, ("NHWC", "HWIO", "NHWC"))
        out = jax.lax.conv_general_dilated(
            lhs, rhs, (1, 1), [(padding, padding), (padding, padding)],
            dimension_numbers=dn, precision=jax.lax.Precision.HIGHEST)
        return out.transpose(1, 2, 0, 3)     # (kh, kw, C, O)

    x2 = x * x
    dx = conv_t(g_mu, w_mu) + 2.0 * x * conv_t(g_var, w_var)
    dw_mu = conv_w(x, g_mu)
    dw_var = conv_w(x2, g_var)
    return dx, dw_mu, dw_var


lrt_double_conv_pallas.defvjp(_vjp_fwd, _vjp_bwd)

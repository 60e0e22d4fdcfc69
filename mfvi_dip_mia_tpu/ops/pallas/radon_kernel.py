"""Pallas TPU kernel for the matmul-form Radon operator.

The dense projection matrix A (T*W, H*W) makes the Radon forward an
HBM-bandwidth-bound matvec (ops/radon.py). This kernel cuts the bytes in half
by storing A in bfloat16 while accumulating in float32 on the MXU, and ships a
custom VJP whose backward kernel streams the SAME row-major A (no 3 GB
transpose is ever materialized):

    forward:  sino[p]  = sum_q A[p, q] * img[q]        (accumulate over q tiles)
    backward: grad[q]  = sum_p A[p, q] * g[p]          (accumulate over p tiles)

Both are expressed as tiled matmuls over the identical (P_TILE, Q_TILE) block
stream; the Pallas pipeline double-buffers the A tiles from HBM automatically.
bf16 storage changes the operator by <1e-3 relative — the CT problem builds
its sinogram target through the same operator, so the inverse problem stays
self-consistent; use the f32 XLA path (ops/radon.py) for strict parity runs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

P_TILE = 256   # sinogram-row tile
Q_TILE = 2048  # image-pixel tile


def _interpret() -> bool:
    """Interpreter mode off-TPU so CPU CI exercises the same kernel code."""
    return jax.default_backend() != "tpu"


def _pad_to(x, m, axis):
    pad = (-x.shape[axis]) % m
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _fwd_kernel(a_ref, v_ref, out_ref):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    a = a_ref[:].astype(jnp.float32)
    v = v_ref[:]
    out_ref[:] += jax.lax.dot_general(
        a, v, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _bwd_kernel(a_ref, g_ref, out_ref):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    a = a_ref[:].astype(jnp.float32)
    g = g_ref[:]
    # grad_q = A[p, q]^T @ g[p]; contract over the p (first) axis
    out_ref[:] += jax.lax.dot_general(
        a, g, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _fwd_call(a_bf16, v):
    p_pad, q_pad = a_bf16.shape
    cols = v.shape[1]
    grid = (p_pad // P_TILE, q_pad // Q_TILE)
    return pl.pallas_call(
        _fwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((P_TILE, Q_TILE), lambda i, k: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Q_TILE, cols), lambda i, k: (k, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((P_TILE, cols), lambda i, k: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((p_pad, cols), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * p_pad * q_pad * cols,
            bytes_accessed=p_pad * q_pad * 2 + q_pad * cols * 4
            + p_pad * cols * 4,
            transcendentals=0),
        compiler_params=None if _interpret() else pltpu.CompilerParams(
            vmem_limit_bytes=6 * 1024 * 1024),
        interpret=_interpret(),
    )(a_bf16, v)


def _bwd_call(a_bf16, g):
    p_pad, q_pad = a_bf16.shape
    cols = g.shape[1]
    grid = (q_pad // Q_TILE, p_pad // P_TILE)
    return pl.pallas_call(
        _bwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((P_TILE, Q_TILE), lambda j, k: (k, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((P_TILE, cols), lambda j, k: (k, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Q_TILE, cols), lambda j, k: (j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((q_pad, cols), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * p_pad * q_pad * cols,
            bytes_accessed=p_pad * q_pad * 2 + p_pad * cols * 4
            + q_pad * cols * 4,
            transcendentals=0),
        compiler_params=None if _interpret() else pltpu.CompilerParams(
            vmem_limit_bytes=6 * 1024 * 1024),
        interpret=_interpret(),
    )(a_bf16, g)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def radon_matmul_pallas(a_bf16, img_flat, n_rows: int, n_pix: int):
    """sino_flat (B*C folded into columns) = A @ img_flat.

    a_bf16: (P_pad, Q_pad) zero-padded bf16 projection matrix
    img_flat: (Q_pad, cols) f32
    returns (n_rows, cols) f32.
    """
    return _fwd_call(a_bf16, img_flat)[:n_rows]


def _vjp_fwd(a_bf16, img_flat, n_rows, n_pix):
    return radon_matmul_pallas(a_bf16, img_flat, n_rows, n_pix), a_bf16


def _vjp_bwd(n_rows, n_pix, a_bf16, g):
    # pad cotangent rows up to A's padded row count
    pad = a_bf16.shape[0] - g.shape[0]
    g_pad = jnp.pad(g, ((0, pad), (0, 0))) if pad else g
    grad_img = _bwd_call(a_bf16, g_pad)[:n_pix]
    return None, grad_img


radon_matmul_pallas.defvjp(_vjp_fwd, _vjp_bwd)


def prepare_matrix_bf16(a_f32):
    """Pad to tile multiples and cast to bf16 (done once, cached upstream)."""
    a = _pad_to(_pad_to(jnp.asarray(a_f32), P_TILE, 0), Q_TILE, 1)
    return a.astype(jnp.bfloat16)


def radon_apply_pallas(image_nhwc, a_bf16, n_angles: int):
    """NHWC image -> (B, T, W, C) sinogram via the Pallas kernel."""
    b, h, w, c = image_nhwc.shape
    n_pix, n_rows = h * w, n_angles * w
    flat = image_nhwc.transpose(1, 2, 0, 3).reshape(h * w, b * c)
    flat = _pad_to(flat.astype(jnp.float32), Q_TILE, 0)
    sino = radon_matmul_pallas(a_bf16, flat, n_rows, n_pix)
    return sino.reshape(n_angles, w, b, c).transpose(2, 0, 1, 3)

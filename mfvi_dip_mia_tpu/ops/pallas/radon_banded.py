"""Block-banded Pallas Radon operator: stream only the nonzero band.

The dense projection matrix A (T*W, H*W) is ~98% zeros: a sinogram bin
(t, j) only weights pixels whose projection coordinate p = alpha_t*x +
beta_t*y + gamma_t lands within the bilinear footprint |j - p| < 1.5
(ops/radon.py:_build_projection_matrix). For a 32x32 image patch, p spans at
most 31*(|cos|+|sin|) + 3 < 47 sinogram bins — so per (angle, patch) the
nonzero rows fit one static 64-row window. Reordering image pixels
patch-major therefore turns A into T*G dense (JWIN=64, PP=1024) blocks plus a
per-block row offset, cutting the bytes streamed per forward from
T*W*H*W (3.0 GB f32 at 256^2 / 45 angles) to T*G*JWIN*PP (755 MB f32 /
378 MB bf16). The operator is HBM-bandwidth-bound, so throughput follows
exactly that ratio — PROVIDED the grid stays coarse enough to be DMA-bound:
each grid step processes one patch x TCHUNK=12 angles as a single
(768, 1024) x (1024, cols) MXU pass (~3 MB of band per step), the full
sinogram (46 KB) stays VMEM-resident across the whole grid, and only the
per-angle 64-row window accumulation is a dynamic-sublane store. A
finer-grained first cut (one 64x1024 dot per block, 1440 steps/pass) measured
~4 us/step of non-DMA overhead and lost to the dense bf16 streamer.

  forward:  sino[t, jlo(t,g) : jlo+64] += B[t,g] @ patch[g]      (accumulate)
  backward: grad[patch g]  += B[t,g]^T @ gsino[t, jlo : jlo+64]  (accumulate)

Both stream the SAME (G, T_pad/TCHUNK, TCHUNK*JWIN, PP) block tensor in the
same grid order (no transpose is ever materialized). f32 blocks hold exactly
the dense matrix's nonzeros, so 'banded' matches 'matmul' to summation-order
tolerance; bf16 storage halves the bytes again at <1e-3 operator error.

Reference semantics: radon/radon.py:4-55 (rotate + sum via affine_grid /
grid_sample, align_corners=False, zero padding).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os

# Default patch side 16: its jwin-32 band carries 1.87x fewer bytes than
# the 32/56 geometry (188 MB vs 352 MB at 256^2/45 angles) and the op is
# HBM-bound on the band — measured end-to-end CT/MFVI 268.3 vs 245.5 it/s
# (+9%) on v5e, identical convergence. pp=256 still fills two 128-lane
# tiles; patch 8 (pp=64) would waste half the MXU lane width.
PATCH = int(os.environ.get("MFVI_DIP_RADON_PATCH", "16"))  # image patch side
JWIN = 64             # legacy default window; see auto_jwin
TCHUNK = 12           # legacy default angle fusion; see auto_tchunk
PP = PATCH * PATCH    # pixels per patch (default geometry)


def auto_jwin(patch: int) -> int:
    """Tightest 8-aligned sinogram window covering a patch's projection.

    A patch diagonal spans (patch-1)*(|cos|+|sin|) <= (patch-1)*sqrt(2)
    sinogram bins, the bilinear footprint adds <3, and the 8-aligned window
    start (dynamic sublane stores want 8-aligned offsets) adds up to 7 of
    slack. The band tensor's bytes — the operator's HBM floor — scale
    linearly with this: patch 32 -> 56 (was a hardcoded 64), patch 16 -> 32
    (half the bytes of the 32/64 geometry)."""
    need = int(np.ceil((patch - 1) * np.sqrt(2.0))) + 3 + 7
    return -(-need // 8) * 8


def auto_tchunk(n_angles: int, jwin: int, pp: int, itemsize: int) -> int:
    """Angles fused per grid step: minimize angle padding (t_pad - T wastes
    band bytes AND matmul rows) while keeping each step's block DMA in the
    ~0.5-4 MB range where the kernel stays DMA-bound (a 128 KB/step variant
    measured ~4 us/step of non-DMA overhead — module docstring)."""
    best = None
    for tc in range(1, n_angles + 1):
        t_pad = -(-n_angles // tc) * tc
        blk = tc * jwin * pp * itemsize
        if blk < 512 * 1024 or blk > 4 * 1024 * 1024:
            continue
        score = (t_pad, blk < 1024 * 1024, -tc)
        if best is None or score < best[0]:
            best = (score, tc)
    return best[1] if best else min(TCHUNK, n_angles)


def _interpret() -> bool:
    """Interpreter mode off-TPU so CPU CI exercises the same kernel code."""
    return jax.default_backend() != "tpu"


class BandedRadonState:
    """Device-resident operator state (threaded through jit as an argument,
    like the dense matrix — see Problem.op_state).

    ``blocks``: (G, T_pad/tchunk, tchunk*jwin, patch*patch);
    ``jlo``: (T_pad * G,) int32 row offsets, indexed [t * G + g].
    ``patch``/``tchunk`` pin the geometry the blocks were built with (jwin
    follows from the shapes). Registered as a pytree so it rides the
    trainer's data dict untouched.
    """

    def __init__(self, blocks, jlo, n_angles, w, patch=32, tchunk=12):
        self.blocks = blocks
        self.jlo = jlo
        self.n_angles = int(n_angles)
        self.w = int(w)
        self.patch = int(patch)
        self.tchunk = int(tchunk)

    @property
    def jwin(self) -> int:
        return self.blocks.shape[2] // self.tchunk


jax.tree_util.register_pytree_node(
    BandedRadonState,
    lambda s: ((s.blocks, s.jlo), (s.n_angles, s.w, s.patch, s.tchunk)),
    lambda aux, kids: BandedRadonState(kids[0], kids[1], *aux))


def _resolve_geometry(n_angles: int, w: int, dtype, patch, jwin, tchunk):
    patch = patch or PATCH
    jwin = jwin or auto_jwin(patch)
    itemsize = jnp.dtype(dtype).itemsize
    tchunk = tchunk or auto_tchunk(n_angles, jwin, patch * patch, itemsize)
    assert w >= jwin, f"banded mode needs W >= {jwin}, got {w}"
    return patch, jwin, tchunk


def prepare_banded(a_f32: np.ndarray, n_angles: int, h: int, w: int,
                   dtype=jnp.float32, *, patch=None, jwin=None,
                   tchunk=None) -> BandedRadonState:
    """Slice the dense (T*W, H*W) matrix into its per-(angle, patch) band
    blocks. Host-side numpy, done once per (theta, size) and cached
    upstream (FastRadonTransform.matrix)."""
    patch, jwin, tchunk = _resolve_geometry(n_angles, w, dtype, patch, jwin,
                                            tchunk)
    pp = patch * patch
    assert h == w and h % patch == 0, (h, w)
    gside = w // patch
    g_count = gside * gside

    # patch-major column permutation: raster (y*w + x) -> (gy, gx, yl, xl)
    perm = (np.arange(h * w).reshape(gside, patch, gside, patch)
            .transpose(0, 2, 1, 3).reshape(g_count, pp))

    t_pad = -(-n_angles // tchunk) * tchunk
    blocks = np.zeros((t_pad, g_count, jwin, pp), np.float32)
    jlo = np.zeros((t_pad, g_count), np.int32)

    for t in range(n_angles):
        at = a_f32[t * w:(t + 1) * w]               # (W, H*W)
        for g in range(g_count):
            blk = at[:, perm[g]]                    # (W, PP)
            rows = np.flatnonzero(np.abs(blk).sum(axis=1))
            if len(rows) == 0:
                continue
            jmin, jmax = int(rows[0]), int(rows[-1])
            lo = min(max(0, (jmin // 8) * 8), w - jwin)
            assert jmax < lo + jwin, (
                f"band wider than jwin: t={t} g={g} [{jmin},{jmax}] lo={lo}")
            jlo[t, g] = lo
            blocks[t, g] = blk[lo:lo + jwin]

    # grid layout: (patch, angle-chunk) with the tchunk angle blocks of one
    # step stacked on the sublane axis for a single MXU pass
    blocks = (blocks.transpose(1, 0, 2, 3)          # (G, T_pad, JWIN, PP)
              .reshape(g_count, t_pad // tchunk, tchunk * jwin, pp))
    return BandedRadonState(jnp.asarray(blocks).astype(dtype),
                            jnp.asarray(jlo.reshape(-1)), n_angles, w,
                            patch, tchunk)


def prepare_banded_direct(theta_deg, h: int, w: int,
                          dtype=jnp.float32, *, patch=None, jwin=None,
                          tchunk=None) -> BandedRadonState:
    """Build the banded blocks straight from the angles — the dense
    (T*W, H*W) matrix is never materialized.

    This is what makes large fields of view feasible at all: at 512^2 / 45
    angles the dense matrix is 24 GB (host AND device), while the band is
    3.0 GB f32 / 1.5 GB bf16 on device and only ~35 MB of host scratch per
    angle here. Same corner/weight math as ops/radon.py's dense builder
    (torch affine_grid / grid_sample align_corners=False convention,
    radon/radon.py:36-55), golden-tested against it.
    """
    theta_rad = np.deg2rad(np.asarray(theta_deg, np.float64))
    n_angles = len(theta_rad)
    patch, jwin, tchunk = _resolve_geometry(n_angles, w, dtype, patch, jwin,
                                            tchunk)
    pp = patch * patch
    assert h == w and h % patch == 0, (h, w)
    gside = w // patch
    g_count = gside * gside
    t_pad = -(-n_angles // tchunk) * tchunk

    jj = (2.0 * np.arange(w) + 1.0) / w - 1.0
    ii = (2.0 * np.arange(h) + 1.0) / h - 1.0
    x = np.broadcast_to(jj[None, :], (h, w))
    y = np.broadcast_to(ii[:, None], (h, w))
    out_j = np.broadcast_to(np.arange(w)[None, :], (h, w)).ravel()

    blocks = np.zeros((t_pad, g_count, jwin, pp), np.float32)
    jlo = np.zeros((t_pad, g_count), np.int32)

    for t, th in enumerate(theta_rad):
        c, s = np.cos(th), np.sin(th)
        ix = (((c * x - s * y) + 1.0) * w - 1.0) / 2.0
        iy = (((s * x + c * y) + 1.0) * h - 1.0) / 2.0
        x0 = np.floor(ix)
        y0 = np.floor(iy)
        fx = (ix - x0).ravel()
        fy = (iy - y0).ravel()
        x0 = x0.ravel().astype(np.int64)
        y0 = y0.ravel().astype(np.int64)

        gs, js, locs, ws = [], [], [], []
        for dy, dx, wgt in ((0, 0, (1 - fx) * (1 - fy)),
                            (0, 1, fx * (1 - fy)),
                            (1, 0, (1 - fx) * fy),
                            (1, 1, fx * fy)):
            xc, yc = x0 + dx, y0 + dy
            valid = ((xc >= 0) & (xc <= w - 1) & (yc >= 0) & (yc <= h - 1)
                     & (wgt > 0))
            xc, yc, wv = xc[valid], yc[valid], wgt[valid]
            gs.append((yc // patch) * gside + xc // patch)
            js.append(out_j[valid])
            locs.append((yc % patch) * patch + xc % patch)
            ws.append(wv.astype(np.float32))
        g = np.concatenate(gs)
        j = np.concatenate(js)
        loc = np.concatenate(locs)
        wv = np.concatenate(ws)

        jmin = np.full(g_count, w, np.int64)
        jmax = np.full(g_count, -1, np.int64)
        np.minimum.at(jmin, g, j)
        np.maximum.at(jmax, g, j)
        lo = np.clip((jmin // 8) * 8, 0, w - jwin)
        assert (jmax < lo + jwin).all(), (
            f"band wider than jwin at angle {t}")
        jlo[t] = np.where(jmax >= 0, lo, 0)
        np.add.at(blocks[t].reshape(-1),
                  (g * jwin + (j - lo[g])) * pp + loc, wv)

    blocks = (blocks.transpose(1, 0, 2, 3)
              .reshape(g_count, t_pad // tchunk, tchunk * jwin, pp))
    return BandedRadonState(jnp.asarray(blocks).astype(dtype),
                            jnp.asarray(jlo.reshape(-1)), n_angles, w,
                            patch, tchunk)


def patchify(image_nhwc: jnp.ndarray, patch: int = None) -> jnp.ndarray:
    """(B, H, W, C) -> (B*C, G*PP) cols-LEADING patch-major pixel matrix.

    Cols-leading is load-bearing: a pallas_call constrains its operands to
    default row-major layouts, and with the pixel axis LAST the constraint is
    (pixels, 1) — lane dimension 1 — which forces T(1,128)-tiled layout-
    conversion copies of every image-sized tensor the operand touches
    upstream (U-Net output, EMA, the 25-slot MC ring): ~8 ms/iter measured
    on v5e. With pixels on the lane axis the constraint is layout-neutral
    and those copies vanish."""
    patch = patch or PATCH
    b, h, w, c = image_nhwc.shape
    gside = w // patch
    x = image_nhwc.reshape(b, gside, patch, gside, patch, c)
    x = x.transpose(0, 5, 1, 3, 2, 4)               # (b, c, gy, gx, yl, xl)
    return x.reshape(b * c, gside * gside * patch * patch)


def unpatchify(grad_flat: jnp.ndarray, b: int, h: int, w: int, c: int,
               patch: int = None):
    """(B*C, G*PP) -> (B, H, W, C); inverse of patchify."""
    patch = patch or PATCH
    gside = w // patch
    x = grad_flat.reshape(b, c, gside, gside, patch, patch)
    x = x.transpose(0, 2, 4, 3, 5, 1)               # (b, gy, yl, gx, xl, c)
    return x.reshape(b, h, w, c)


def _compiler_params():
    if _interpret():
        return None
    return pltpu.CompilerParams(vmem_limit_bytes=13 * 1024 * 1024)


def _fwd_call(blocks, jlo, v, *, g_count: int, w: int, tchunk: int):
    """(T_pad*W, cols) sinogram = banded-A @ (cols, G*PP) pixel matrix.
    The whole sinogram lives in VMEM across the grid; each step adds one
    patch x tchunk angles. The sinogram keeps cols LAST (its dynamic row
    windows must sit on the 8-aligned sublane axis) — it is tiny (~50 KB),
    so its layout constraint is harmless, unlike the image-sized v
    (see patchify)."""
    n_tc = blocks.shape[1]
    jwin = blocks.shape[2] // tchunk
    pp = blocks.shape[3]
    t_pad = n_tc * tchunk
    cols = v.shape[0]

    def kernel(jlo_ref, a_ref, v_ref, o_ref):
        g = pl.program_id(0)
        tc = pl.program_id(1)

        @pl.when(jnp.logical_and(g == 0, tc == 0))
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)

        # bf16-stored band, cols == 1 (the DIP workload): the "dot" is a
        # matvec that Mosaic lowers to VPU broadcast-multiply-reduce anyway
        # (a bf16 x bf16 -> f32 dot_general trips a vector.broadcast
        # verifier error), so write the mul-reduce explicitly — the bf16
        # band promotes to f32 INSIDE the multiply, replacing the separate
        # astype(f32) VPU pass over the 94M-element band that the old path
        # paid per call on an otherwise DMA-bound op.
        if blocks.dtype == jnp.bfloat16 and cols == 1:
            a = a_ref[0, 0]                          # (tchunk*jwin, pp) bf16
            prod = a.astype(jnp.float32) * v_ref[0, :][None, :]
            contrib = jnp.sum(prod, axis=1)[:, None]
        else:
            a = a_ref[0, 0].astype(jnp.float32)      # (tchunk*jwin, pp)
            contrib = jax.lax.dot_general(
                a, v_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)  # (tchunk*jwin, cols)
        for i in range(tchunk):
            t = tc * tchunk + i
            lo = pl.multiple_of(jlo_ref[t * g_count + g], 8)
            o_ref[pl.ds(t * w + lo, jwin), :] += (
                contrib[i * jwin:(i + 1) * jwin, :])

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(g_count, n_tc),
        in_specs=[
            pl.BlockSpec((1, 1, tchunk * jwin, pp),
                         lambda g, tc, jlo: (g, tc, 0, 0)),
            pl.BlockSpec((cols, pp), lambda g, tc, jlo: (0, g)),
        ],
        out_specs=pl.BlockSpec((t_pad * w, cols), lambda g, tc, jlo: (0, 0)),
    )
    bpe = blocks.dtype.itemsize
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((t_pad * w, cols), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * t_pad * g_count * jwin * pp * cols,
            bytes_accessed=blocks.size * bpe + v.size * 4
            + t_pad * w * cols * 4,
            transcendentals=0),
        compiler_params=_compiler_params(),
        interpret=_interpret(),
    )(jlo, blocks, v)


def _bwd_call(blocks, jlo, gsino, *, g_count: int, w: int, tchunk: int):
    """grad_v (cols, G*PP) = banded-A^T @ (T_pad*W, cols) cotangent; the tiny
    cotangent sinogram stays VMEM-resident, windows are gathered into scratch
    per step, and the same block stream contracts on its row axis. The
    image-sized OUTPUT is cols-leading for the same layout-neutrality reason
    as patchify's input (its reshape feeds the conv backward graph)."""
    n_tc = blocks.shape[1]
    jwin = blocks.shape[2] // tchunk
    pp = blocks.shape[3]
    t_pad = n_tc * tchunk
    cols = gsino.shape[-1]

    def kernel(jlo_ref, a_ref, s_ref, o_ref, win_ref):
        g = pl.program_id(0)
        tc = pl.program_id(1)

        @pl.when(tc == 0)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)

        for i in range(tchunk):
            t = tc * tchunk + i
            lo = pl.multiple_of(jlo_ref[t * g_count + g], 8)
            win_ref[i * jwin:(i + 1) * jwin, :] = (
                s_ref[pl.ds(t * w + lo, jwin), :])
        # mirror of the forward's cols == 1 special case: explicit
        # broadcast-multiply-reduce with the bf16->f32 promotion fused into
        # the multiply (see _fwd_call)
        if blocks.dtype == jnp.bfloat16 and cols == 1:
            a = a_ref[0, 0]                          # (tchunk*jwin, pp) bf16
            prod = a.astype(jnp.float32) * win_ref[:, 0][:, None]
            o_ref[:] += jnp.sum(prod, axis=0)[None, :]
        else:
            a = a_ref[0, 0].astype(jnp.float32)      # (tchunk*jwin, pp)
            o_ref[:] += jax.lax.dot_general(
                win_ref[:], a, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)  # (cols, pp)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(g_count, n_tc),
        in_specs=[
            pl.BlockSpec((1, 1, tchunk * jwin, pp),
                         lambda g, tc, jlo: (g, tc, 0, 0)),
            pl.BlockSpec((t_pad * w, cols), lambda g, tc, jlo: (0, 0)),
        ],
        out_specs=pl.BlockSpec((cols, pp), lambda g, tc, jlo: (0, g)),
        scratch_shapes=[pltpu.VMEM((tchunk * jwin, cols), jnp.float32)],
    )
    bpe = blocks.dtype.itemsize
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((cols, g_count * pp), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * t_pad * g_count * jwin * pp * cols,
            bytes_accessed=blocks.size * bpe + t_pad * w * cols * 4
            + g_count * pp * cols * 4,
            transcendentals=0),
        compiler_params=_compiler_params(),
        interpret=_interpret(),
    )(jlo, blocks, gsino)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _banded_matvec(blocks, jlo, v, g_count: int, w: int, tchunk: int):
    """(T_pad*W, cols) sinogram = banded-A @ (cols, G*PP) pixel matrix."""
    return _fwd_call(blocks, jlo, v, g_count=g_count, w=w, tchunk=tchunk)


def _banded_vjp_fwd(blocks, jlo, v, g_count, w, tchunk):
    return _banded_matvec(blocks, jlo, v, g_count, w, tchunk), (blocks, jlo)


def _banded_vjp_bwd(g_count, w, tchunk, res, g):
    blocks, jlo = res
    grad_v = _bwd_call(blocks, jlo, g, g_count=g_count, w=w, tchunk=tchunk)
    return None, None, grad_v


_banded_matvec.defvjp(_banded_vjp_fwd, _banded_vjp_bwd)


def radon_apply_banded(image_nhwc: jnp.ndarray,
                       state: BandedRadonState) -> jnp.ndarray:
    """NHWC image -> (B, T, W, C) sinogram via the block-banded kernel.

    NOTE (round-3 finding, measured via HLO estimated_cycles): the mere
    PRESENCE of a tpu_custom_call in a module flips XLA's layout-assignment
    heuristics into a mode that lays small-channel NHWC conv activations out
    channels-on-lanes ({3,0,2,1:T(1,128)}-family, 8x lane padding) instead of
    the spatial-on-lanes {1,3,2,0:T(8,128)} the same program gets without the
    call — inflating the U-Net's elementwise/reduce ops ~3-4x. This is NOT
    fixable at the kernel interface (padding operands to 8 sublanes and
    inserting identity-copy 'layout anchor' kernels were both tried and
    change nothing; a trivial identity pallas call injected into the clean
    denoising program reproduces the flip). The durable fix is the
    channels-first compute path (nn/cf.py) whose hot tensors are (C, H, W)
    row-major — dense in either heuristic mode."""
    b, h, w, c = image_nhwc.shape
    assert w == state.w, (w, state.w)
    gside = w // state.patch
    v = patchify(image_nhwc.astype(jnp.float32), state.patch)
    sino = _banded_matvec(state.blocks, state.jlo, v, gside * gside, w,
                          state.tchunk)
    sino = sino.reshape(-1, w, b * c)[:state.n_angles]  # drop angle padding
    return sino.reshape(state.n_angles, w, b, c).transpose(2, 0, 1, 3)

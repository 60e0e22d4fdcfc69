"""Differentiable Radon transform (the CT forward operator), TPU-native.

Semantics-parity with the reference (radon/radon.py:4-55): rotate the image by
each projection angle with bilinear interpolation on the affine_grid /
grid_sample (align_corners=False, zero padding) coordinate convention, then
sum over image rows, producing a sinogram of shape (B, T, W, C) in NHWC
(the reference's (B, C, T, W) in NCHW).

TPU-first implementation notes:
  * Sample coordinates are generated *inside* jit from broadcasted iotas and
    the (static) angle vector — no precomputed (T, H, W, 2) grid buffer to
    stream from HBM.
  * Bilinear sampling is expressed as one flattened 4-corner gather; the
    adjoint (filtered-backprojection-style backprojection) falls out of
    autodiff as the corresponding scatter-add.
  * A fused Pallas kernel (ops/pallas/radon_kernel.py) implements the same
    contraction as per-angle MXU matmuls; this jnp version is the reference
    implementation and the CPU/CI fallback.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _rotation_coords(theta_rad: jnp.ndarray, h: int, w: int):
    """Pixel-space sample coordinates for rotating an (h, w) image by each
    angle, using torch's affine_grid/grid_sample align_corners=False mapping.

    Output pixel (i, j) has normalized coords x = (2j+1)/W - 1,
    y = (2i+1)/H - 1; the rotation matrix [[c, -s], [s, c]] maps them to
    source normalized coords; pixel coords are ((g+1)*S - 1) / 2.

    Returns (ix, iy) arrays of shape (T, h, w), float32.
    """
    jj = (2.0 * jnp.arange(w, dtype=jnp.float32) + 1.0) / w - 1.0   # (w,)
    ii = (2.0 * jnp.arange(h, dtype=jnp.float32) + 1.0) / h - 1.0   # (h,)
    x = jnp.broadcast_to(jj[None, :], (h, w))
    y = jnp.broadcast_to(ii[:, None], (h, w))

    c = jnp.cos(theta_rad)[:, None, None]
    s = jnp.sin(theta_rad)[:, None, None]
    gx = c * x[None] - s * y[None]
    gy = s * x[None] + c * y[None]

    ix = ((gx + 1.0) * w - 1.0) / 2.0
    iy = ((gy + 1.0) * h - 1.0) / 2.0
    return ix, iy


def _bilinear_gather(img: jnp.ndarray, ix: jnp.ndarray, iy: jnp.ndarray
                     ) -> jnp.ndarray:
    """Sample (h, w, c) image at float coords (T, h, w) with bilinear
    interpolation and zero padding. Returns (T, h, w, c)."""
    h, w, c = img.shape
    x0 = jnp.floor(ix)
    y0 = jnp.floor(iy)
    fx = ix - x0
    fy = iy - y0

    flat = img.reshape(h * w, c)

    def corner(yc, xc, wgt):
        valid = ((xc >= 0) & (xc <= w - 1) & (yc >= 0) & (yc <= h - 1))
        xi = jnp.clip(xc, 0, w - 1).astype(jnp.int32)
        yi = jnp.clip(yc, 0, h - 1).astype(jnp.int32)
        vals = jnp.take(flat, yi * w + xi, axis=0)           # (T,h,w,c)
        return vals * (wgt * valid.astype(img.dtype))[..., None]

    out = (corner(y0, x0, (1 - fx) * (1 - fy))
           + corner(y0, x0 + 1, fx * (1 - fy))
           + corner(y0 + 1, x0, (1 - fx) * fy)
           + corner(y0 + 1, x0 + 1, fx * fy))
    return out


_MATRIX_CACHE: dict = {}


def _build_projection_matrix(theta_deg, h: int, w: int) -> np.ndarray:
    """Dense exact projection matrix A with A[t*W + j, y*W + x] = the total
    bilinear rotate-and-sum weight of input pixel (y, x) on sinogram bin
    (t, j). Same corner/weight math as the gather path, so the two modes
    agree to float tolerance.

    Rationale (TPU): the bilinear rotation is inherently a gather — 12M
    random reads per forward, ~85 ms on a v5e. As a (T*W, H*W) matmul the
    same contraction rides the MXU and is HBM-bandwidth-bound instead
    (~3 GB @ f32 for 45 angles at 256^2 -> single-digit ms). The adjoint
    reuses the same matrix transposed.
    """
    theta_rad = np.deg2rad(np.asarray(theta_deg, np.float64))
    t_count = len(theta_rad)

    jj = (2.0 * np.arange(w) + 1.0) / w - 1.0
    ii = (2.0 * np.arange(h) + 1.0) / h - 1.0
    x = np.broadcast_to(jj[None, :], (h, w))
    y = np.broadcast_to(ii[:, None], (h, w))

    a = np.zeros((t_count * w, h * w), np.float32)
    rows = np.broadcast_to(np.arange(w)[None, :], (h, w)).ravel()

    for t, th in enumerate(theta_rad):
        c, s = np.cos(th), np.sin(th)
        gx = c * x - s * y
        gy = s * x + c * y
        ix = ((gx + 1.0) * w - 1.0) / 2.0
        iy = ((gy + 1.0) * h - 1.0) / 2.0
        x0 = np.floor(ix)
        y0 = np.floor(iy)
        fx = (ix - x0).ravel()
        fy = (iy - y0).ravel()
        x0 = x0.ravel().astype(np.int64)
        y0 = y0.ravel().astype(np.int64)
        block = a[t * w:(t + 1) * w]
        for dy, dx, wgt in ((0, 0, (1 - fx) * (1 - fy)),
                            (0, 1, fx * (1 - fy)),
                            (1, 0, (1 - fx) * fy),
                            (1, 1, fx * fy)):
            xc, yc = x0 + dx, y0 + dy
            valid = (xc >= 0) & (xc <= w - 1) & (yc >= 0) & (yc <= h - 1)
            np.add.at(block,
                      (rows[valid], yc[valid] * w + xc[valid]),
                      wgt[valid].astype(np.float32))
    return a


class FastRadonTransform:
    """Static-config Radon operator: ``op(image_nhwc) -> sinogram``.

    image: (B, H, W, C) with H == W; sinogram: (B, T, W, C).
    ``theta`` in degrees (defaults to arange(180) like the reference).

    ``mode``:
      * 'banded' — block-banded Pallas kernel streaming only the matrix's
        nonzero band (~25% of the dense bytes) in exact f32; numerically the
        matmul contraction with a different summation order (TPU default)
      * 'banded-bf16' — same kernel, bf16-stored band: half the bytes again
        at <1e-3 relative operator error
      * 'matmul' — dense exact f32 projection matrix on the MXU
      * 'pallas' — dense bf16-stored matrix kernel (superseded by 'banded',
        kept for A/B benchmarking)
      * 'gather' — coordinate-generating bilinear gather (memory-light
        fallback, the natural CPU path)
      * 'auto'   — banded on TPU (when the image size allows); else matmul
        when the dense matrix fits the budget, else gather.
    """

    MATMUL_BUDGET_BYTES = 4 * 1024 ** 3

    def __init__(self, image_size, theta=None, mode: str = "auto"):
        # image_size: (B, H, W, C)
        h, w = int(image_size[1]), int(image_size[2])
        assert h == w, "Radon operator expects square images"
        if theta is None:
            theta = np.arange(180.0)
        self.theta_deg = np.asarray(theta, np.float32)
        self.theta_rad = jnp.asarray(np.deg2rad(self.theta_deg))
        self.h, self.w = h, w
        self.n_angles = len(self.theta_deg)
        if mode == "auto":
            import os
            mode = os.environ.get("MFVI_DIP_RADON", "auto")
        if mode == "auto":
            # measured end-to-end on v5e (scripts/ab_radon.sh, CT fit,
            # metrics_every=10): banded 98.8 it/s vs matmul 71.0 (dip),
            # 88.2 vs ~70 (mfvi; banded-bf16 101.6). The banded kernel only
            # wins once the trainer carries its MC rings FLAT — 4-D ring
            # carries + a Pallas custom call push XLA layout assignment into
            # T(1,128) conversion copies (see tasks/trainer.py). 'banded' is
            # the TPU default (exact f32); 'banded-bf16' is the opt-in speed
            # mode at <1e-3 relative operator error.
            from .pallas import radon_banded as _rb
            if (jax.default_backend() == "tpu"
                    and w >= _rb.auto_jwin(_rb.PATCH)
                    and h == w and h % _rb.PATCH == 0):
                # bf16-stored band: the op is HBM-bound on the band (188 MB
                # at 256^2/45 angles with the patch-16 geometry; was 805 MB
                # f32/patch-32/jwin-64), so halving the bytes halves
                # fwd+adjoint time. Relative operator error
                # < 1e-3; end-to-end CT convergence within 0.05 dB at 5k
                # iters (scripts/ab_radon_dtype.py). MFVI_DIP_RADON=banded
                # forces the exact-f32 band.
                mode = "banded-bf16"
            else:
                nbytes = self.n_angles * w * h * w * 4
                mode = ("matmul" if nbytes <= self.MATMUL_BUDGET_BYTES
                        else "gather")
        self.mode = mode

    @property
    def matrix_bytes(self) -> int:
        return self.n_angles * self.w * self.h * self.w * 4

    def matrix(self) -> jnp.ndarray:
        """The (T*W, H*W) projection matrix on the default device (cached).
        In 'pallas' mode: tile-padded bf16. IMPORTANT: inside jit, pass this
        as an *argument* (see ``apply``) — a multi-GB matrix captured as a
        closure constant gets embedded in the lowered program (and breaks
        remote compilation outright)."""
        key = (tuple(self.theta_deg.tolist()), self.h, self.w, self.mode,
               str(jax.devices()[0]))
        if key not in _MATRIX_CACHE:
            if self.mode in ("banded", "banded-bf16"):
                # band blocks are built straight from the angles — at large
                # fields of view the dense matrix would not even fit host
                # RAM (24 GB at 512^2/45 angles vs a 3.0 GB f32 band)
                from .pallas.radon_banded import prepare_banded_direct
                dt = (jnp.bfloat16 if self.mode == "banded-bf16"
                      else jnp.float32)
                state = prepare_banded_direct(self.theta_deg, self.h,
                                              self.w, dtype=dt)
                _MATRIX_CACHE[key] = jax.device_put(state)
            elif self.mode == "pallas":
                from .pallas.radon_kernel import prepare_matrix_bf16
                a = _build_projection_matrix(self.theta_deg, self.h, self.w)
                _MATRIX_CACHE[key] = jax.device_put(prepare_matrix_bf16(a))
            else:
                a = _build_projection_matrix(self.theta_deg, self.h, self.w)
                _MATRIX_CACHE[key] = jax.device_put(a)
        return _MATRIX_CACHE[key]

    def apply(self, image: jnp.ndarray, matrix: jnp.ndarray) -> jnp.ndarray:
        """Matmul/pallas/banded forward with an explicitly threaded matrix
        (jit-safe)."""
        if self.mode in ("banded", "banded-bf16"):
            from .pallas.radon_banded import radon_apply_banded
            return radon_apply_banded(image, matrix)
        if self.mode == "pallas":
            from .pallas.radon_kernel import radon_apply_pallas
            return radon_apply_pallas(image, matrix, self.n_angles)
        b, h, w, c = image.shape
        flat = image.reshape(b, h * w, c)
        # HIGHEST: f32-true projection (TPU f32 dots default to one bf16
        # pass); the op is HBM-bound so the extra MXU passes are ~free
        sino = jnp.einsum("pq,bqc->bpc", matrix, flat,
                          precision=jax.lax.Precision.HIGHEST,
                          preferred_element_type=jnp.float32)
        return sino.reshape(b, self.n_angles, self.w, c)

    def _gather_call(self, image: jnp.ndarray) -> jnp.ndarray:
        ix, iy = _rotation_coords(self.theta_rad, self.h, self.w)

        def per_image(img):
            rot = _bilinear_gather(img, ix, iy)      # (T, h, w, c)
            return jnp.sum(rot, axis=1)              # (T, w, c)

        return jax.vmap(per_image)(image)

    def __call__(self, image: jnp.ndarray) -> jnp.ndarray:
        if self.mode in ("matmul", "pallas", "banded", "banded-bf16"):
            if (isinstance(image, jax.core.Tracer)
                    and self.matrix_bytes > 256 * 1024 ** 2):
                raise RuntimeError(
                    "FastRadonTransform(mode='matmul') called under jit with "
                    "a large projection matrix: thread it as an argument via "
                    "op.apply(image, op.matrix()) / Problem.op_state instead "
                    "of capturing it as a constant")
            return self.apply(image, self.matrix())
        return self._gather_call(image)

    def adjoint(self, sinogram: jnp.ndarray) -> jnp.ndarray:
        """Exact adjoint A^T (unfiltered backprojection), via autodiff of the
        forward — the gradient path the reference gets from grid_sample."""
        zero = jnp.zeros((sinogram.shape[0], self.h, self.w,
                          sinogram.shape[-1]), sinogram.dtype)
        _, vjp = jax.vjp(self.__call__, zero)
        return vjp(sinogram)[0]


@functools.partial(jax.jit, static_argnums=(1, 2))
def _fbp_ramp_filter(sino_tw: jnp.ndarray, t: int, w: int) -> jnp.ndarray:
    """Shepp-Logan-filtered sinogram rows (for the classical FBP baseline in
    eval tooling; compare_ct.ipynb uses skimage.iradon with this filter)."""
    n = int(2 ** np.ceil(np.log2(2 * w)))
    freqs = jnp.fft.rfftfreq(n)
    ramp = 2.0 * jnp.abs(freqs)
    sl = ramp * jnp.sinc(freqs)  # shepp-logan window: ramp * sinc
    f = jnp.fft.rfft(sino_tw, n=n, axis=-1) * sl
    return jnp.fft.irfft(f, n=n, axis=-1)[..., :w]


def fbp(sinogram: jnp.ndarray, theta_deg, output_size: int) -> jnp.ndarray:
    """Filtered backprojection baseline (classical, non-DL): Shepp-Logan
    filter + linear-interp backprojection on the skimage.iradon coordinate
    convention. Used by the eval tooling to reproduce compare_ct.ipynb."""
    b, t, w, c = sinogram.shape
    theta_rad = jnp.asarray(np.deg2rad(np.asarray(theta_deg, np.float32)))

    filtered = _fbp_ramp_filter(
        sinogram.transpose(0, 3, 1, 2).reshape(b * c * t, w), t, w
    ).reshape(b, c, t, w)

    s = output_size
    grid = jnp.arange(s, dtype=jnp.float32) - (s - 1) / 2.0
    ygrid, xgrid = jnp.meshgrid(grid, grid, indexing="ij")

    def backproject(f_tw):  # (t, w)
        def one_angle(carry, inputs):
            th, row = inputs
            tcoord = xgrid * jnp.cos(th + jnp.pi / 2) + ygrid * jnp.sin(th + jnp.pi / 2)
            pos = tcoord + (w - 1) / 2.0
            i0 = jnp.clip(jnp.floor(pos), 0, w - 2)
            frac = pos - i0
            i0 = i0.astype(jnp.int32)
            vals = row[i0] * (1 - frac) + row[i0 + 1] * frac
            inside = (pos >= 0) & (pos <= w - 1)
            return carry + jnp.where(inside, vals, 0.0), None

        acc, _ = jax.lax.scan(one_angle, jnp.zeros((s, s), jnp.float32),
                              (theta_rad, f_tw))
        return acc * jnp.pi / (2.0 * t)

    out = jax.vmap(jax.vmap(backproject))(filtered)  # (b, c, s, s)
    return out.transpose(0, 2, 3, 1)

"""Radon operator: golden vs torch grid_sample rotation-and-sum, adjoint
dot-product identity, FBP round-trip sanity."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F
import jax
import jax.numpy as jnp

from mfvi_dip_mia_tpu.ops.radon import FastRadonTransform, fbp


def torch_radon(image_nchw: torch.Tensor, theta_deg: np.ndarray) -> np.ndarray:
    """Oracle: the affine_grid/grid_sample rotate-and-sum formulation
    (semantics of ref radon/radon.py:23-55), built from torch primitives."""
    theta = torch.deg2rad(torch.from_numpy(theta_deg.astype(np.float32)))
    ts, tc = torch.sin(theta), torch.cos(theta)
    z = torch.zeros_like(tc)
    trans = torch.stack([tc, -ts, z, ts, tc, z]).permute(1, 0).reshape(-1, 2, 3)
    n, c, h, w = image_nchw.shape
    grid = F.affine_grid(trans, (len(theta), c, h, w), align_corners=False)
    img_r = F.grid_sample(image_nchw.expand(len(theta), -1, -1, -1), grid,
                          mode="bilinear", padding_mode="zeros",
                          align_corners=False)
    return img_r.sum(2, keepdims=True).permute(2, 1, 0, 3).numpy()


@pytest.mark.parametrize("size,step", [(32, 4.0), (64, 45.0)])
def test_radon_matches_torch_grid_sample(rng, size, step):
    img = rng.random((1, 1, size, size)).astype(np.float32)
    theta = np.arange(0.0, 180.0, step)
    expected = torch_radon(torch.from_numpy(img), theta)  # (1, C, T, W)

    op = FastRadonTransform((1, size, size, 1), theta)
    got = op(jnp.asarray(img.transpose(0, 2, 3, 1)))       # (1, T, W, C)
    got_nctw = np.asarray(got).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got_nctw, expected, rtol=1e-3, atol=1e-3)


def test_radon_multichannel(rng):
    img = rng.random((1, 2, 32, 32)).astype(np.float32)
    theta = np.arange(0.0, 180.0, 20.0)
    expected = torch_radon(torch.from_numpy(img), theta)
    op = FastRadonTransform((1, 32, 32, 2), theta)
    got = np.asarray(op(jnp.asarray(img.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), expected,
                               rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize("size,step", [(32, 12.0), (64, 45.0)])
def test_matmul_mode_matches_gather(rng, size, step):
    """The dense MXU projection matrix computes exactly the same contraction
    as the bilinear gather (same corner/weight math)."""
    theta = np.arange(0.0, 180.0, step)
    img = jnp.asarray(rng.random((1, size, size, 1)).astype(np.float32))
    op_g = FastRadonTransform((1, size, size, 1), theta, mode="gather")
    op_m = FastRadonTransform((1, size, size, 1), theta, mode="matmul")
    np.testing.assert_allclose(np.asarray(op_m(img)), np.asarray(op_g(img)),
                               rtol=1e-4, atol=1e-4)


def test_matmul_mode_jit_safe_via_apply(rng):
    theta = np.arange(0.0, 180.0, 30.0)
    op = FastRadonTransform((1, 32, 32, 1), theta, mode="matmul")
    img = jnp.asarray(rng.random((1, 32, 32, 1)).astype(np.float32))
    mat = op.matrix()

    @jax.jit
    def f(img, mat):
        return jnp.sum(op.apply(img, mat))

    assert np.isfinite(float(f(img, mat)))


def test_adjoint_dot_product_identity(rng):
    """<A x, y> == <x, A^T y> to float tolerance."""
    size = 32
    theta = np.arange(0.0, 180.0, 12.0)
    op = FastRadonTransform((1, size, size, 1), theta)
    x = jnp.asarray(rng.random((1, size, size, 1)).astype(np.float32))
    y = jnp.asarray(rng.random((1, len(theta), size, 1)).astype(np.float32))
    ax_y = float(jnp.sum(op(x) * y))
    x_aty = float(jnp.sum(x * op.adjoint(y)))
    assert ax_y == pytest.approx(x_aty, rel=1e-4)


def test_gradients_flow_through_radon(rng):
    size = 32
    theta = np.arange(0.0, 180.0, 12.0)
    op = FastRadonTransform((1, size, size, 1), theta)
    target = jnp.asarray(rng.random((1, len(theta), size, 1)).astype(np.float32))

    def loss(x):
        return jnp.mean((op(x) - target) ** 2)

    g = jax.grad(loss)(jnp.zeros((1, size, size, 1)))
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.sum(jnp.abs(g))) > 0


def _phantom(size):
    """Simple disc phantom."""
    yy, xx = np.mgrid[0:size, 0:size]
    r = np.hypot(yy - size / 2, xx - size / 2)
    img = (r < size * 0.3).astype(np.float32) * 0.8
    img += (np.hypot(yy - size * 0.4, xx - size * 0.55) < size * 0.1) * 0.2
    return img


def test_fbp_reconstructs_phantom():
    size = 64
    theta = np.arange(0.0, 180.0, 2.0)
    img = _phantom(size)[None, :, :, None]
    op = FastRadonTransform((1, size, size, 1), theta)
    sino = op(jnp.asarray(img))
    recon = np.asarray(fbp(sino, theta, size))[0, :, :, 0]
    # interior should correlate strongly with the phantom
    m = 8
    a, b = recon[m:-m, m:-m], img[0, m:-m, m:-m, 0]
    corr = np.corrcoef(a.ravel(), b.ravel())[0, 1]
    assert corr > 0.9

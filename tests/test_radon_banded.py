"""Block-banded Pallas Radon: golden vs the dense matmul mode (which is
itself golden-tested against torch grid_sample in test_radon.py), adjoint
consistency, and gradient agreement. Runs the real kernel code in interpreter
mode on CPU (ops/pallas/radon_banded.py)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mfvi_dip_mia_tpu.ops.radon import FastRadonTransform

THETA = np.arange(0.0, 180.0, 12.0)  # 15 angles: keeps interpret mode quick
S = 128


@pytest.fixture(scope="module")
def ops():
    rm = FastRadonTransform((1, S, S, 1), THETA, mode="matmul")
    rb = FastRadonTransform((1, S, S, 1), THETA, mode="banded")
    return rm, rb


@pytest.fixture(scope="module")
def img():
    rng = np.random.default_rng(0)
    return jnp.asarray(rng.uniform(size=(1, S, S, 1)).astype(np.float32))


def test_banded_forward_matches_matmul(ops, img):
    rm, rb = ops
    s_m = rm.apply(img, rm.matrix())
    s_b = rb.apply(img, rb.matrix())
    assert s_b.shape == s_m.shape == (1, len(THETA), S, 1)
    scale = float(jnp.max(jnp.abs(s_m)))
    assert float(jnp.max(jnp.abs(s_m - s_b))) < 1e-5 * scale


def test_banded_grad_matches_matmul(ops, img):
    rm, rb = ops

    def loss(r, x):
        return jnp.sum(r.apply(x, r.matrix()) ** 2)

    gm = jax.grad(lambda x: loss(rm, x))(img)
    gb = jax.grad(lambda x: loss(rb, x))(img)
    scale = float(jnp.max(jnp.abs(gm)))
    assert float(jnp.max(jnp.abs(gm - gb))) < 1e-5 * scale


def test_banded_adjoint_dot_product(ops):
    """<A x, y> == <x, A^T y> through the custom VJP."""
    _, rb = ops
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, S, S, 1)).astype(np.float32))
    y = jnp.asarray(
        rng.standard_normal((1, len(THETA), S, 1)).astype(np.float32))
    ax = rb.apply(x, rb.matrix())
    aty = rb.adjoint(y)
    lhs = float(jnp.vdot(ax, y))
    rhs = float(jnp.vdot(x, aty))
    assert abs(lhs - rhs) < 1e-3 * max(abs(lhs), 1.0)


def test_banded_band_window_invariant():
    """Every (angle, patch) band fits the state's jwin window — the
    assertion prepare_banded enforces; exercised here across an odd angle
    set and the auto-resolved (patch, jwin, tchunk) geometry."""
    from mfvi_dip_mia_tpu.ops.pallas.radon_banded import prepare_banded
    from mfvi_dip_mia_tpu.ops.radon import _build_projection_matrix
    theta = np.arange(0.0, 180.0, 36.0) + 7.0   # 5 awkward angles
    a = _build_projection_matrix(theta, 64, 64)
    st = prepare_banded(a, len(theta), 64, 64)
    t_pad = -(-len(theta) // st.tchunk) * st.tchunk
    g_count = st.blocks.shape[0]
    assert st.blocks.shape[1] == t_pad // st.tchunk
    assert st.jlo.shape == (t_pad * g_count,)
    assert int(jnp.max(st.jlo)) <= 64 - st.jwin


def test_prepare_direct_matches_dense_derived():
    """prepare_banded_direct (no dense materialization — the 512^2 enabler)
    must produce the same blocks/jlo as slicing the dense matrix."""
    from mfvi_dip_mia_tpu.ops.pallas.radon_banded import (
        prepare_banded, prepare_banded_direct)
    from mfvi_dip_mia_tpu.ops.radon import _build_projection_matrix
    theta = np.arange(0.0, 180.0, 36.0) + 7.0
    a = _build_projection_matrix(theta, 64, 64)
    st_dense = prepare_banded(a, len(theta), 64, 64)
    st_direct = prepare_banded_direct(theta, 64, 64)
    np.testing.assert_array_equal(np.asarray(st_dense.jlo),
                                  np.asarray(st_direct.jlo))
    np.testing.assert_allclose(np.asarray(st_dense.blocks),
                               np.asarray(st_direct.blocks),
                               rtol=0, atol=2e-6)
    assert st_direct.n_angles == len(theta) and st_direct.w == 64


@pytest.mark.parametrize("patch", [16, 32])
def test_banded_geometry_sweep_matches_matmul(patch):
    """Forward + grad parity vs the dense matmul mode across band
    geometries: patch 16 (jwin 32 — half the band bytes of the 32/56
    default) and patch 32. auto_jwin/auto_tchunk must resolve windows that
    hold every footprint, and the kernel must be geometry-agnostic."""
    from mfvi_dip_mia_tpu.ops.pallas import radon_banded as rbm
    from mfvi_dip_mia_tpu.ops.radon import _build_projection_matrix

    theta = np.arange(0.0, 180.0, 12.0)  # 15 angles
    s = 64
    a = _build_projection_matrix(theta, s, s)
    st = rbm.prepare_banded(a, len(theta), s, s, patch=patch)
    assert st.patch == patch and st.jwin == rbm.auto_jwin(patch)

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.uniform(size=(1, s, s, 1)).astype(np.float32))
    amat = jnp.asarray(a)

    def dense(img):
        flat = img.reshape(1, s * s, 1)
        return jnp.einsum("rp,bpc->brc", amat, flat).reshape(
            1, len(theta), s, 1)

    s_d = dense(x)
    s_b = rbm.radon_apply_banded(x, st)
    scale = float(jnp.max(jnp.abs(s_d)))
    assert float(jnp.max(jnp.abs(s_d - s_b))) < 1e-5 * scale

    gd = jax.grad(lambda v: jnp.sum(dense(v) ** 2))(x)
    gb = jax.grad(lambda v: jnp.sum(rbm.radon_apply_banded(v, st) ** 2))(x)
    gscale = float(jnp.max(jnp.abs(gd)))
    assert float(jnp.max(jnp.abs(gd - gb))) < 1e-5 * gscale


def test_patchify_roundtrip():
    """unpatchify is the documented inverse of patchify (the cols-leading
    pixel-matrix layout the banded kernel consumes)."""
    from mfvi_dip_mia_tpu.ops.pallas.radon_banded import patchify, unpatchify
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 64, 64, 3)).astype(np.float32))
    v = patchify(x)
    assert v.shape == (6, 64 * 64)
    np.testing.assert_array_equal(np.asarray(unpatchify(v, 2, 64, 64, 3)),
                                  np.asarray(x))

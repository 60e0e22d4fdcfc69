"""Exact GP: posterior formulas vs an independent NumPy implementation,
hyperparameter fitting behavior, acquisition functions."""

import numpy as np
import pytest
from scipy.stats import norm as scipy_norm

from mfvi_dip_mia_tpu.bo.gp import ExactGP, GPParams, train_gp
from mfvi_dip_mia_tpu.bo import gp as gp_mod
from mfvi_dip_mia_tpu.bo.acquisition import (expected_improvement,
                                             peak_local_max, find_candidates,
                                             upper_confidence_bound)
from mfvi_dip_mia_tpu.bo.normalize import normalize_X, unnormalize_X


def _numpy_gp_posterior(x, y, xq, ls, os_, nz, mean):
    def k(a, b):
        d2 = ((a[:, None, :] - b[None, :, :]) ** 2).sum(-1)
        return os_ * np.exp(-0.5 * d2 / ls ** 2)
    K = k(x, x) + (nz + gp_mod.JITTER) * np.eye(len(x))
    Ks = k(xq, x)
    Kinv = np.linalg.inv(K)
    mu = mean + Ks @ Kinv @ (y - mean)
    var = os_ - np.einsum("ij,jk,ik->i", Ks, Kinv, Ks)
    return mu, var


def test_posterior_matches_numpy(rng):
    x = rng.random((12, 2))
    y = np.sin(3 * x[:, 0]) + x[:, 1]
    gp = train_gp(x, y, iter_max=200)
    xq = rng.random((7, 2))
    mu, var = (np.asarray(a) for a in gp.predict(xq))
    h = gp.hyperparams
    mu_np, var_np = _numpy_gp_posterior(
        x, y, xq, h["lengthscale"], h["outputscale"], h["noise"], h["mean"])
    np.testing.assert_allclose(mu, mu_np, rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(var, np.maximum(var_np, 0), rtol=1e-5,
                               atol=1e-8)


def test_gp_fits_smooth_function(rng):
    x = rng.random((30, 2))
    y = 20 + 5 * np.sin(4 * x[:, 0]) * np.cos(3 * x[:, 1])
    gp = train_gp(x, y, iter_max=800)
    mu, var = (np.asarray(a) for a in gp.predict(x))
    # near-interpolation at train points once noise is learned small
    assert np.abs(mu - y).max() < 1.0
    assert gp.hyperparams["noise"] < 0.5
    # sensible uncertainty growth away from data
    far = np.array([[5.0, 5.0]])
    _, var_far = gp.predict(far)
    assert float(np.asarray(var_far)[0]) > var.mean()


def test_gp_stays_float64(rng):
    """Every GP artifact must be f64; predict must return f64 (VERDICT r1 #8)."""
    import jax.numpy as jnp
    x = rng.random((6, 2))
    y = x.sum(1)
    gp = train_gp(x, y, iter_max=50)
    for leaf in gp.params:
        assert leaf.dtype == jnp.float64, leaf
    assert gp.chol.dtype == jnp.float64 and gp.alpha.dtype == jnp.float64
    mu, var = gp.predict(rng.random((3, 2)).astype(np.float32))
    assert mu.dtype == jnp.float64 and var.dtype == jnp.float64
    h = gp.hyperparams  # must not emit the f64-truncation warning (errors)
    assert all(np.isfinite(v) for v in h.values())


def test_expected_improvement_formula(rng):
    x = rng.random((10, 2))
    y = x[:, 0] * 10
    gp = train_gp(x, y, iter_max=300)
    xq = rng.random((50, 2))
    ei = np.asarray(expected_improvement(gp, xq, x))
    mu, var = (np.asarray(a) for a in gp.predict(xq))
    mu_tr, _ = (np.asarray(a) for a in gp.predict(x))
    sigma = np.sqrt(np.maximum(var, 1e-9))
    u = (mu - mu_tr.max()) / sigma
    ref = sigma * (scipy_norm.pdf(u) + u * scipy_norm.cdf(u))
    np.testing.assert_allclose(ei, np.maximum(ref, 0), rtol=1e-4, atol=1e-9)
    assert (ei >= 0).all()


def test_ucb(rng):
    x = rng.random((8, 2))
    y = x.sum(1)
    gp = train_gp(x, y, iter_max=200)
    xq = rng.random((5, 2))
    ucb = np.asarray(upper_confidence_bound(gp, xq, 2.0))
    mu, var = (np.asarray(a) for a in gp.predict(xq))
    np.testing.assert_allclose(ucb, mu + 2 * np.sqrt(var), rtol=1e-6)


def test_peak_local_max():
    img = np.zeros((100, 100))
    img[20, 30] = 1.0
    img[70, 80] = 0.8
    img[50, 50] = 0.05  # below threshold_rel=0.1
    peaks = peak_local_max(img, min_distance=5, threshold_rel=0.1, num_peaks=4)
    assert (peaks == [20, 30]).all(axis=1).any()
    assert (peaks == [70, 80]).all(axis=1).any()
    assert not (peaks == [50, 50]).all(axis=1).any()
    # sorted by intensity
    assert (peaks[0] == [20, 30]).all()


def test_find_candidates_refines_toward_optimum(rng):
    # objective peaked at (0.3, 0.7) in normalized space
    x = rng.random((25, 2))
    y = 30 - 40 * ((x[:, 0] - 0.3) ** 2 + (x[:, 1] - 0.7) ** 2)
    gp = train_gp(x, y, iter_max=600)
    g = np.stack(np.meshgrid(np.linspace(0, 1, 100), np.linspace(0, 1, 100),
                             indexing="ij"), -1).reshape(-1, 2)
    cands, eis, acq = find_candidates(gp, g, x)
    assert cands.shape[1] == 2
    assert ((cands >= 0) & (cands <= 1)).all()
    assert acq.shape == (10000,)
    # refined EI at least matches the best grid EI (LBFGS shouldn't regress)
    assert max(eis) >= acq.max() - 1e-6


def test_normalize_roundtrip(rng):
    x = 10 ** (rng.random((6, 2)) * -8)
    b1, b2 = [-10.0, 0.0], [-8.0, -1.0]
    n = normalize_X(x, b1, b2)
    back = unnormalize_X(n, b1, b2)
    np.testing.assert_allclose(back, x, rtol=1e-10)
    # known point: x = 10^-5 with bounds [-10, 0] -> 0.5
    n2 = normalize_X(np.array([[1e-5, 1e-4]]), [-10.0, 0.0], [-8.0, 0.0])
    assert n2[0, 0] == pytest.approx(0.5)
    assert n2[0, 1] == pytest.approx(0.5)

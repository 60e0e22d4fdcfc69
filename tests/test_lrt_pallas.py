"""Fused LRT Pallas double-conv: golden vs the XLA block-diagonal fusion
(`_fused_double_conv`, itself exercised against torch semantics through the
LRT layer tests in test_vi.py). Runs the real kernel in interpreter mode on
CPU (ops/pallas/lrt_conv_pallas.py)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mfvi_dip_mia_tpu.ops.pallas import lrt_conv, lrt_conv_pallas


CASES = [
    # (H, W, C, O, k, pad) — the skip net's stride-1 conv shapes
    (32, 32, 16, 16, 3, 1),
    (16, 64, 32, 64, 3, 1),
    (16, 32, 128, 128, 3, 1),
    (32, 32, 64, 4, 1, 0),
]


def _mats(h, w, c, o, k, seed):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((1, h, w, c)).astype(np.float32))
    w_mu = jnp.asarray(
        rng.standard_normal((k, k, c, o)).astype(np.float32) * 0.1)
    w_var = jnp.asarray(
        rng.uniform(0.001, 0.01, (k, k, c, o)).astype(np.float32))
    return x, w_mu, w_var


@pytest.mark.parametrize("h,w,c,o,k,pad", CASES)
def test_forward_matches_xla(h, w, c, o, k, pad):
    x, w_mu, w_var = _mats(h, w, c, o, k, 0)
    assert lrt_conv_pallas.supported(x, w_mu, 1, pad)
    mu_p, var_p = lrt_conv_pallas.lrt_double_conv_pallas(x, w_mu, w_var,
                                                         1, pad)
    mu_x, var_x = lrt_conv._fused_double_conv(x, w_mu, w_var, 1, pad)
    assert mu_p.shape == mu_x.shape
    for a, b in ((mu_p, mu_x), (var_p, var_x)):
        scale = float(jnp.max(jnp.abs(b))) + 1e-12
        assert float(jnp.max(jnp.abs(a - b))) < 1e-4 * scale


def test_gradients_match_xla():
    h, w, c, o, k, pad = 16, 32, 16, 8, 3, 1
    x, w_mu, w_var = _mats(h, w, c, o, k, 1)
    rng = np.random.default_rng(2)
    g_mu = jnp.asarray(rng.standard_normal((1, h, w, o)).astype(np.float32))
    g_var = jnp.asarray(rng.standard_normal((1, h, w, o)).astype(np.float32))

    def scalar(fn):
        def s(x_, wm_, wv_):
            mu, var = fn(x_, wm_, wv_, 1, pad)
            return jnp.sum(mu * g_mu) + jnp.sum(var * g_var)
        return s

    gp = jax.grad(scalar(lrt_conv_pallas.lrt_double_conv_pallas),
                  argnums=(0, 1, 2))(x, w_mu, w_var)
    gx = jax.grad(scalar(lrt_conv._fused_double_conv),
                  argnums=(0, 1, 2))(x, w_mu, w_var)
    for a, b in zip(gp, gx):
        scale = float(jnp.max(jnp.abs(b))) + 1e-12
        assert float(jnp.max(jnp.abs(a - b))) < 1e-4 * scale, (
            a.shape, float(jnp.max(jnp.abs(a - b))), scale)


def test_unsupported_shapes_fall_back():
    x = jnp.zeros((1, 17, 32, 16))           # H_out not a TH multiple
    w = jnp.zeros((3, 3, 16, 8))
    assert not lrt_conv_pallas.supported(x, w, 1, 1)
    assert not lrt_conv_pallas.supported(jnp.zeros((1, 32, 32, 16)), w, 2, 1)


def test_env_flag_end_to_end(monkeypatch):
    """MFVI_DIP_PALLAS_LRT=1 must not crash and must agree with the default
    path through the public lrt_conv dispatch (the round-1 landmine)."""
    x, w_mu, w_var = _mats(16, 32, 16, 8, 3, 0)
    w_rho = jnp.log(jnp.expm1(jnp.sqrt(w_var)))     # softplus^-1
    b_mu = jnp.zeros((8,))
    b_rho = jnp.full((8,), -6.0)
    key = jax.random.PRNGKey(0)

    monkeypatch.delenv("MFVI_DIP_PALLAS_LRT", raising=False)
    out_xla = lrt_conv.lrt_conv(x, w_mu, w_rho, b_mu, b_rho, 1, 1, key)
    monkeypatch.setenv("MFVI_DIP_PALLAS_LRT", "1")
    out_pl = lrt_conv.lrt_conv(x, w_mu, w_rho, b_mu, b_rho, 1, 1, key)
    scale = float(jnp.max(jnp.abs(out_xla))) + 1e-12
    assert float(jnp.max(jnp.abs(out_pl - out_xla))) < 1e-4 * scale
    # stride-2 site under the flag: silently uses the XLA path
    out_s2 = lrt_conv.lrt_conv(x, w_mu, w_rho, b_mu, b_rho, 2, 1, key)
    assert out_s2.shape == (1, 8, 16, 8)

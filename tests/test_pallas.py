"""Pallas kernels, run in interpreter mode on CPU (same kernel code paths the
TPU executes compiled)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mfvi_dip_mia_tpu.ops.pallas import radon_kernel as RK
from mfvi_dip_mia_tpu.ops.pallas.lrt_conv import _fused_double_conv, lrt_conv
from mfvi_dip_mia_tpu.nn import layers


def test_radon_pallas_fwd_matches_matmul(rng):
    a32 = jnp.asarray(rng.random((256, 2048), np.float32) - 0.5)
    a16 = RK.prepare_matrix_bf16(a32)
    v = jnp.asarray(rng.random((2048, 1)).astype(np.float32))
    got = RK.radon_matmul_pallas(a16, v, 256, 2048)
    ref = a32 @ v
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-2,
                               atol=2e-2)


def test_radon_pallas_vjp_matches_matmul(rng):
    a32 = jnp.asarray(rng.random((256, 2048), np.float32) - 0.5)
    a16 = RK.prepare_matrix_bf16(a32)
    v = jnp.asarray(rng.random((2048, 1)).astype(np.float32))
    t = jnp.asarray(rng.random((256, 1)).astype(np.float32))

    gp = jax.jit(jax.grad(
        lambda v, a: jnp.mean((RK.radon_matmul_pallas(a, v, 256, 2048) - t) ** 2)
    ))(v, a16)
    gr = jax.grad(lambda v: jnp.mean((a32 @ v - t) ** 2))(v)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gr), rtol=5e-2,
                               atol=5e-3)


def test_radon_pallas_end_to_end_against_operator(rng):
    from mfvi_dip_mia_tpu.ops.radon import FastRadonTransform
    theta = np.arange(0.0, 180.0, 30.0)
    op_pl = FastRadonTransform((1, 32, 32, 1), theta, mode="pallas")
    op_mm = FastRadonTransform((1, 32, 32, 1), theta, mode="matmul")
    img = jnp.asarray(rng.random((1, 32, 32, 1)).astype(np.float32))
    s_pl = op_pl.apply(img, op_pl.matrix())
    s_mm = op_mm.apply(img, op_mm.matrix())
    np.testing.assert_allclose(np.asarray(s_pl), np.asarray(s_mm), rtol=2e-2,
                               atol=5e-2)


def test_fused_double_conv_matches_two_convs(rng):
    x = jnp.asarray(rng.random((1, 8, 8, 3)).astype(np.float32))
    w_mu = jnp.asarray(rng.random((3, 3, 3, 4)).astype(np.float32) - 0.5)
    w_var = jnp.asarray(rng.random((3, 3, 3, 4)).astype(np.float32))
    mu, var = _fused_double_conv(x, w_mu, w_var, 1, 1)
    np.testing.assert_allclose(np.asarray(mu),
                               np.asarray(layers.conv2d(x, w_mu, None, 1, 1)),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(var), np.asarray(layers.conv2d(x * x, w_var, None, 1, 1)),
        rtol=1e-5, atol=1e-6)


def test_lrt_conv_moments(rng):
    x = jnp.asarray(rng.random((1, 6, 6, 2)).astype(np.float32))
    w_mu = 0.1 * jnp.ones((3, 3, 2, 3))
    w_rho = -2.0 * jnp.ones((3, 3, 2, 3))
    outs = jax.vmap(lambda k: lrt_conv(x, w_mu, w_rho, None, None, 1, 0, k))(
        jax.random.split(jax.random.PRNGKey(0), 1024))
    act_mu = layers.conv2d(x, w_mu, None, 1, 0)
    np.testing.assert_allclose(np.asarray(jnp.mean(outs, 0)),
                               np.asarray(act_mu), atol=0.05)


@pytest.mark.parametrize("i_ch,o_ch,k,h,w", [
    (16, 16, 3, 40, 130),   # i_pad == i_ch, unaligned width
    (3, 8, 3, 24, 64),      # i_pad > i_ch (channel padding rows)
    (8, 4, 5, 32, 150),     # k=5, odd extents
    (8, 8, 1, 16, 128),     # 1x1
])
def test_dw_valid_cf_matches_tap_dots(rng, i_ch, o_ch, k, h, w):
    """The fused all-tap weight-gradient kernel must reproduce the per-tap
    dot formulation (the _bwd fallback) exactly up to accumulation order."""
    from mfvi_dip_mia_tpu.ops.pallas.cf_conv import dw_valid_cf

    xp = jnp.asarray(rng.standard_normal((i_ch, h, w)), jnp.float32)
    h_out, w_out = h - k + 1, w - k + 1
    g = jnp.asarray(rng.standard_normal((o_ch, h_out, w_out)), jnp.float32)

    dw = np.asarray(dw_valid_cf(xp, g, (k, k)))

    ref = np.zeros((k, k, i_ch, o_ch), np.float32)
    for ky in range(k):
        for kx in range(k):
            xs = np.asarray(xp)[:, ky:ky + h_out, kx:kx + w_out]
            ref[ky, kx] = np.einsum("ihw,ohw->io", xs, np.asarray(g))
    np.testing.assert_allclose(dw, ref, rtol=2e-4, atol=2e-3)


def test_conv_valid_cf_grads_match_xla_conv(rng):
    """Full vjp (pallas dx + fused dw) against jax.grad through the XLA
    NCHW conv on identical inputs."""
    from mfvi_dip_mia_tpu.nn import cf
    from mfvi_dip_mia_tpu.ops.pallas.cf_conv import conv_valid_cf

    i_ch, o_ch, k = 8, 6, 3
    x = jnp.asarray(rng.standard_normal((i_ch, 40, 140)), jnp.float32)
    wt = jnp.asarray(rng.standard_normal((k, k, i_ch, o_ch)) * 0.1,
                     jnp.float32)

    def loss_pallas(x_, w_):
        return jnp.sum(jnp.sin(conv_valid_cf(x_, w_, (k, k))))

    def loss_xla(x_, w_):
        return jnp.sum(jnp.sin(cf.conv2d(x_[None], w_, None, 1, 0)[0]))

    gx_p, gw_p = jax.grad(loss_pallas, argnums=(0, 1))(x, wt)
    gx_r, gw_r = jax.grad(loss_xla, argnums=(0, 1))(x, wt)
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_r),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(gw_p), np.asarray(gw_r),
                               rtol=2e-4, atol=2e-3)

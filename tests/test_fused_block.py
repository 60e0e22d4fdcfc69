"""Fused conv+BN+LReLU Pallas block (ops/pallas/fused_block.py): forward and
all four gradients must match the unfused XLA CF ops."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mfvi_dip_mia_tpu.nn import cf
from mfvi_dip_mia_tpu.ops.pallas import fused_block as fb


def _ref_block(x_cf, w, gamma, beta, pad_mode="reflection", slope=0.2):
    k = w.shape[0]
    p = (k - 1) // 2
    h = cf.reflection_pad(x_cf, p) if pad_mode == "reflection" else jnp.pad(
        x_cf, ((0, 0), (0, 0), (p, p), (p, p)))
    h = cf.conv2d(h, w, None, 1, 0)
    h = cf.batch_norm_train(h, gamma, beta)
    return jax.nn.leaky_relu(h, slope)


@pytest.mark.parametrize("shape", [(16, 128, 128, 3), (16, 128, 128, 1),
                                   (20, 64, 256, 3), (4, 128, 128, 3)])
def test_fused_forward_matches_xla(rng, shape):
    ci, h, w, k = shape
    co = 16
    x = jnp.asarray(rng.standard_normal((1, ci, h, w)).astype(np.float32))
    wk = jnp.asarray((rng.standard_normal((k, k, ci, co)) * 0.1)
                     .astype(np.float32))
    gamma = jnp.asarray((rng.random(co) + 0.5).astype(np.float32))
    beta = jnp.asarray(rng.standard_normal(co).astype(np.float32))

    got = fb.apply_fused(x, wk, gamma, beta)
    assert got is not None
    want = _ref_block(x, wk, gamma, beta)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_fused_grads_match_xla(rng):
    ci, co, h, w, k = 8, 12, 64, 128, 3
    x = jnp.asarray(rng.standard_normal((1, ci, h, w)).astype(np.float32))
    wk = jnp.asarray((rng.standard_normal((k, k, ci, co)) * 0.1)
                     .astype(np.float32))
    gamma = jnp.asarray((rng.random(co) + 0.5).astype(np.float32))
    beta = jnp.asarray(rng.standard_normal(co).astype(np.float32))
    tgt = jnp.asarray(rng.standard_normal((1, co, h, w)).astype(np.float32))

    def loss_fused(x_, w_, g_, b_):
        out = fb.apply_fused(x_, w_, g_, b_)
        return jnp.sum((out - tgt) ** 2) + jnp.sum(jnp.sin(out))

    def loss_ref(x_, w_, g_, b_):
        out = _ref_block(x_, w_, g_, b_)
        return jnp.sum((out - tgt) ** 2) + jnp.sum(jnp.sin(out))

    gf = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(x, wk, gamma, beta)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(x, wk, gamma, beta)
    for a, b, name in zip(gf, gr, ("dx", "dw", "dgamma", "dbeta")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-3, err_msg=name)


def test_fused_grads_zero_pad_mode(rng):
    ci, co, h, w, k = 6, 10, 32, 128, 3
    x = jnp.asarray(rng.standard_normal((1, ci, h, w)).astype(np.float32))
    wk = jnp.asarray((rng.standard_normal((k, k, ci, co)) * 0.1)
                     .astype(np.float32))
    gamma = jnp.asarray((rng.random(co) + 0.5).astype(np.float32))
    beta = jnp.asarray(rng.standard_normal(co).astype(np.float32))

    def f(fn):
        def loss(x_):
            return jnp.sum(fn(x_) ** 2)
        return jax.grad(loss)(x)

    gf = f(lambda x_: fb.apply_fused(x_, wk, gamma, beta, pad_mode="zero"))
    gr = f(lambda x_: _ref_block(x_, wk, gamma, beta, pad_mode="zero"))
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                               rtol=2e-3, atol=2e-3)


def test_fused_k1(rng):
    ci, co, h, w = 20, 16, 64, 128
    x = jnp.asarray(rng.standard_normal((1, ci, h, w)).astype(np.float32))
    wk = jnp.asarray((rng.standard_normal((1, 1, ci, co)) * 0.2)
                     .astype(np.float32))
    gamma = jnp.asarray((rng.random(co) + 0.5).astype(np.float32))
    beta = jnp.asarray(rng.standard_normal(co).astype(np.float32))

    got = fb.apply_fused(x, wk, gamma, beta)
    want = _ref_block(x, wk, gamma, beta)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)

    def loss(fn, *args):
        return jnp.sum(jnp.cos(fn(*args)))

    gf = jax.grad(lambda w_: loss(fb.apply_fused, x, w_, gamma, beta))(wk)
    gr = jax.grad(lambda w_: loss(_ref_block, x, w_, gamma, beta))(wk)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                               rtol=2e-3, atol=2e-3)


def test_supported_gate():
    assert fb.supported(16, 16, 256, 256, 3)
    assert fb.supported(36, 32, 128, 128, 3)
    assert not fb.supported(16, 16, 256, 250, 3)   # width not 128-multiple
    assert not fb.supported(16, 16, 100, 128, 3)   # height not tile-multiple
    assert not fb.supported(16, 16, 256, 256, 5)   # k=5 unsupported
    assert not fb.supported(128, 128, 512, 512, 3)  # VMEM budget

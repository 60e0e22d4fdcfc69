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


@pytest.mark.parametrize("variational", [False, True])
def test_skipnet_fused_matches_unfused(rng, monkeypatch, variational):
    """SkipNet layout='auto' with the fused block on vs off: identical
    samples (sample_rt_kernel pins the PRNG stream), matching outputs and
    parameter gradients."""
    import jax.random as jr
    from mfvi_dip_mia_tpu.nn.skip import SkipNet
    from mfvi_dip_mia_tpu.bayes.vi import to_mfvi
    from mfvi_dip_mia_tpu.nn import skip as skip_mod

    net = SkipNet(num_input_channels=2, num_output_channels=1,
                  num_channels_down=(16, 32), num_channels_up=(16, 32),
                  num_channels_skip=(4, 4), pad="reflection",
                  need_sigmoid=False)
    params = net.init(jr.PRNGKey(0))
    if variational:
        params = to_mfvi(params, jr.PRNGKey(1))
    x = jnp.asarray(rng.standard_normal((1, 128, 128, 2)).astype(np.float32))
    key = jr.PRNGKey(7)

    def run(enabled):
        monkeypatch.setenv("MFVI_DIP_FUSED_BLOCK", "1" if enabled else "0")

        def loss(p):
            out = net.apply(p, x, key=key, training=True, layout="auto")
            return jnp.sum(out ** 2)

        out = net.apply(params, x, key=key, training=True, layout="auto")
        grads = jax.grad(loss)(params)
        return out, grads

    out_f, g_f = run(True)
    out_u, g_u = run(False)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_u),
                               rtol=2e-4, atol=2e-4)
    flat_f = jax.tree_util.tree_leaves(g_f)
    flat_u = jax.tree_util.tree_leaves(g_u)
    assert len(flat_f) == len(flat_u)
    for a, b in zip(flat_f, flat_u):
        # near-zero leaves (BN offsets under big cancellation sums) carry
        # O(1e-4) float-summation noise in EITHER path; floor the atol there
        scale = float(jnp.max(jnp.abs(b)))
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=max(2e-4, 5e-3 * scale))


def test_supported_gate():
    assert fb.supported(16, 16, 256, 256, 3)
    assert fb.supported(36, 32, 128, 128, 3)
    assert not fb.supported(16, 16, 256, 250, 3)   # width not 128-multiple
    assert not fb.supported(16, 16, 100, 128, 3)   # height not tile-multiple
    assert not fb.supported(16, 16, 256, 256, 5)   # k=5 unsupported
    assert not fb.supported(128, 128, 512, 512, 3)  # VMEM budget

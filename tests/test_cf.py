"""Channels-first compute path (nn/cf.py): numerical equality with the NHWC
path (same params, same PRNG keys) across methods and topologies."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mfvi_dip_mia_tpu.bayes import to_mfvi
from mfvi_dip_mia_tpu.nn import build_skip_net, cf, skip


@pytest.fixture(autouse=True)
def _small_cf_threshold(monkeypatch):
    # exercise the CF split point on CI-sized nets: levels >= 32px run CF
    monkeypatch.setattr(skip, "CF_MIN_SIZE", 32)


def _net(**kw):
    base = dict(input_depth=4, n_channels=2, pad="reflection",
                skip_n33d=[8, 16, 16], skip_n33u=[8, 16, 16], skip_n11=4,
                num_scales=3, upsample_mode="bilinear")
    base.update(kw)
    return build_skip_net(**base)


def _compare(net, params, **apply_kw):
    x = jax.random.uniform(jax.random.PRNGKey(7), (1, 64, 64, 4)) * 0.1
    out_ref = net.apply(params, x, layout="nhwc", **apply_kw)
    out_cf = net.apply(params, x, layout="auto", **apply_kw)
    np.testing.assert_allclose(np.asarray(out_cf), np.asarray(out_ref),
                               rtol=2e-4, atol=2e-5)


def test_cf_matches_nhwc_deterministic():
    net = _net()
    params = net.init(jax.random.PRNGKey(0))
    _compare(net, params, training=False)


def test_cf_matches_nhwc_mfvi_rt():
    """RT sampling draws eps in kernel (HWIO) shape — identical samples in
    both layouts, so outputs agree to float tolerance."""
    net = _net()
    params = to_mfvi(net.init(jax.random.PRNGKey(0)), jax.random.PRNGKey(1))
    _compare(net, params, training=True, key=jax.random.PRNGKey(3),
             reparam="rt")


def test_cf_matches_nhwc_dropout2d():
    """mcd nets: dropout2d masks are drawn in NHWC index order in both
    paths."""
    net = _net(dropout_mode_down="2d", dropout_p_down=0.3,
               dropout_mode_up="2d", dropout_p_up=0.3)
    params = net.init(jax.random.PRNGKey(0))
    _compare(net, params, training=True, key=jax.random.PRNGKey(5))


def test_cf_matches_nhwc_inpainting_topology():
    """6-scale no-skip k5 net (inp dip/mfvi/sgld config)."""
    from mfvi_dip_mia_tpu.nn import SkipNet
    net = SkipNet(num_input_channels=4, num_output_channels=4,
                  num_channels_down=[8, 16, 16], num_channels_up=[8, 16, 16],
                  num_channels_skip=[0, 0, 0], filter_size_down=5,
                  filter_size_up=3, need1x1_up=False, upsample_mode="nearest",
                  pad="reflection", need_sigmoid=False)
    params = net.init(jax.random.PRNGKey(0))
    _compare(net, params, training=False)


def test_cf_grads_match_nhwc():
    """The whole point is the training loop: gradients must agree too."""
    net = _net()
    params = to_mfvi(net.init(jax.random.PRNGKey(0)), jax.random.PRNGKey(1))
    x = jax.random.uniform(jax.random.PRNGKey(7), (1, 64, 64, 4)) * 0.1
    tgt = jax.random.uniform(jax.random.PRNGKey(8), (1, 64, 64, 2))
    k = jax.random.PRNGKey(3)

    def loss(p, layout):
        out = net.apply(p, x, key=k, training=True, reparam="rt",
                        layout=layout)
        return jnp.mean((out - tgt) ** 2)

    g_ref = jax.grad(lambda p: loss(p, "nhwc"))(params)
    g_cf = jax.grad(lambda p: loss(p, "auto"))(params)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_cf)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-3, atol=1e-5)


def test_cf_roundtrip_helpers():
    x = jnp.arange(2 * 3 * 4 * 5, dtype=jnp.float32).reshape(2, 3, 4, 5)
    np.testing.assert_array_equal(np.asarray(cf.from_cf(cf.to_cf(x))),
                                  np.asarray(x))


def test_cf_layers_match_torch_semantics(rng):
    """Spot-check the CF primitives against the (torch-golden-tested) NHWC
    ones."""
    from mfvi_dip_mia_tpu.nn import layers
    x = jnp.asarray(rng.random((1, 16, 16, 6)).astype(np.float32))
    xc = cf.to_cf(x)
    w = jnp.asarray((rng.random((3, 3, 6, 4)) - 0.5).astype(np.float32))
    b = jnp.asarray(rng.random(4).astype(np.float32))
    pairs = [
        (layers.conv2d(x, w, b, 1, 1), cf.conv2d(xc, w, b, 1, 1)),
        (layers.conv2d(x, w, None, 2, 1), cf.conv2d(xc, w, None, 2, 1)),
        (layers.batch_norm_train(x, jnp.ones(6), jnp.zeros(6)),
         cf.batch_norm_train(xc, jnp.ones(6), jnp.zeros(6))),
        (layers.reflection_pad(x, 2), cf.reflection_pad(xc, 2)),
        (layers.avg_pool(x, 2), cf.avg_pool(xc, 2)),
        (layers.max_pool(x, 2), cf.max_pool(xc, 2)),
        (layers.resize_bilinear(x, 2.0), cf.resize_bilinear(xc, 2.0)),
        (layers.resize_nearest(x, 2.0), cf.resize_nearest(xc, 2.0)),
        (layers.resize_bilinear(x, 0.5), cf.resize_bilinear(xc, 0.5)),
        (layers.concat_center_crop([x, x[:, 2:-2, 2:-2]]),
         cf.concat_center_crop([xc, xc[:, :, 2:-2, 2:-2]])),
    ]
    for ref, got in pairs:
        np.testing.assert_allclose(np.asarray(cf.from_cf(got)),
                                   np.asarray(ref), rtol=1e-5, atol=1e-6)
    # dropout masks identical by construction
    k = jax.random.PRNGKey(11)
    np.testing.assert_allclose(
        np.asarray(cf.from_cf(cf.dropout(xc, 0.4, k))),
        np.asarray(layers.dropout(x, 0.4, k)), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(cf.from_cf(cf.dropout2d(xc, 0.4, k))),
        np.asarray(layers.dropout2d(x, 0.4, k)), rtol=1e-6)

"""Golden tests for NN building blocks vs torch CPU semantics."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F
import jax
import jax.numpy as jnp

from mfvi_dip_mia_tpu.nn import layers


def to_nhwc(t):
    return jnp.asarray(t.numpy().transpose(0, 2, 3, 1))


def from_nhwc(x):
    return np.asarray(x).transpose(0, 3, 1, 2)


@pytest.mark.parametrize("stride,padding,k", [(1, 1, 3), (2, 1, 3), (1, 0, 1),
                                              (2, 2, 5)])
def test_conv2d_matches_torch(rng, stride, padding, k):
    x = torch.from_numpy(rng.random((1, 4, 16, 16)).astype(np.float32))
    w = torch.from_numpy(rng.random((8, 4, k, k)).astype(np.float32) - 0.5)
    b = torch.from_numpy(rng.random(8).astype(np.float32))
    expected = F.conv2d(x, w, b, stride=stride, padding=padding).numpy()
    # OIHW -> HWIO
    w_j = jnp.asarray(w.numpy().transpose(2, 3, 1, 0))
    got = layers.conv2d(to_nhwc(x), w_j, jnp.asarray(b.numpy()),
                        stride=stride, padding=padding)
    np.testing.assert_allclose(from_nhwc(got), expected, rtol=1e-4, atol=1e-5)


def test_batch_norm_train_matches_torch(rng):
    x = torch.from_numpy(rng.random((1, 6, 12, 12)).astype(np.float32) * 3)
    bn = torch.nn.BatchNorm2d(6)
    with torch.no_grad():
        bn.weight.copy_(torch.from_numpy(rng.random(6).astype(np.float32) + 0.5))
        bn.bias.copy_(torch.from_numpy(rng.random(6).astype(np.float32)))
    bn.train()
    expected = bn(x).detach().numpy()
    got = layers.batch_norm_train(
        to_nhwc(x), jnp.asarray(bn.weight.detach().numpy()),
        jnp.asarray(bn.bias.detach().numpy()))
    np.testing.assert_allclose(from_nhwc(got), expected, rtol=1e-4, atol=1e-5)


def test_reflection_pad_matches_torch(rng):
    x = torch.from_numpy(rng.random((1, 2, 8, 8)).astype(np.float32))
    expected = F.pad(x, (2, 2, 2, 2), mode="reflect").numpy()
    got = layers.reflection_pad(to_nhwc(x), 2)
    np.testing.assert_allclose(from_nhwc(got), expected, rtol=1e-6)


def test_leaky_relu_matches_torch(rng):
    x = torch.from_numpy(rng.standard_normal((1, 3, 8, 8)).astype(np.float32))
    expected = F.leaky_relu(x, 0.2).numpy()
    got = layers.leaky_relu(to_nhwc(x))
    np.testing.assert_allclose(from_nhwc(got), expected, rtol=1e-6)


def test_elu_swish_match_torch(rng):
    x = torch.from_numpy(rng.standard_normal((1, 3, 8, 8)).astype(np.float32))
    np.testing.assert_allclose(
        from_nhwc(layers.elu(to_nhwc(x))), F.elu(x).numpy(),
        rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(
        from_nhwc(layers.swish(to_nhwc(x))),
        (x * torch.sigmoid(x)).numpy(), rtol=1e-4, atol=1e-6)


@pytest.mark.parametrize("mode", ["nearest", "bilinear"])
def test_upsample2x_matches_torch(rng, mode):
    x = torch.from_numpy(rng.random((1, 3, 7, 9)).astype(np.float32))
    kwargs = {} if mode == "nearest" else {"align_corners": False}
    expected = F.interpolate(x, scale_factor=2, mode=mode, **kwargs).numpy()
    got = layers.upsample2x(to_nhwc(x), mode)
    np.testing.assert_allclose(from_nhwc(got), expected, rtol=1e-4, atol=1e-6)


@pytest.mark.parametrize("factor", [2, 4])
@pytest.mark.parametrize("mode", ["nearest", "bilinear"])
def test_downsample_matches_torch_interpolate(rng, factor, mode):
    """The SR operator: F.interpolate(scale_factor=1/f,
    recompute_scale_factor=False) (ref bayesian_optimization.py:1910-1914)."""
    x = torch.from_numpy(rng.random((1, 2, 64, 64)).astype(np.float32))
    kwargs = {} if mode == "nearest" else {"align_corners": False}
    expected = F.interpolate(x, scale_factor=1 / factor, mode=mode,
                             recompute_scale_factor=False, **kwargs).numpy()
    fn = layers.resize_nearest if mode == "nearest" else layers.resize_bilinear
    got = fn(to_nhwc(x), 1.0 / factor)
    np.testing.assert_allclose(from_nhwc(got), expected, rtol=1e-4, atol=1e-6)


def test_avg_max_pool_match_torch(rng):
    x = torch.from_numpy(rng.random((1, 3, 8, 8)).astype(np.float32))
    np.testing.assert_allclose(
        from_nhwc(layers.avg_pool(to_nhwc(x), 2)),
        F.avg_pool2d(x, 2).numpy(), rtol=1e-5)
    np.testing.assert_allclose(
        from_nhwc(layers.max_pool(to_nhwc(x), 2)),
        F.max_pool2d(x, 2).numpy(), rtol=1e-5)


def test_dropout2d_channel_structure():
    key = jax.random.PRNGKey(0)
    x = jnp.ones((1, 16, 16, 64))
    y = layers.dropout2d(x, 0.5, key)
    per_channel = np.asarray(y).reshape(-1, 64)
    # every channel is all-zero or all-scaled
    for c in range(64):
        col = per_channel[:, c]
        assert np.all(col == 0) or np.allclose(col, 2.0)
    # roughly half survive
    kept = (per_channel[0] != 0).mean()
    assert 0.2 < kept < 0.8


def test_dropout_unbiased_mean():
    key = jax.random.PRNGKey(1)
    x = jnp.ones((1, 64, 64, 8))
    y = layers.dropout(x, 0.3, key)
    assert float(jnp.mean(y)) == pytest.approx(1.0, abs=0.05)


def test_concat_center_crop():
    a = jnp.ones((1, 10, 10, 2))
    b = jnp.ones((1, 8, 8, 3))
    out = layers.concat_center_crop([a, b])
    assert out.shape == (1, 8, 8, 5)


def test_conv3d_matches_torch(rng):
    import torch.nn.functional as F3
    x = torch.from_numpy(rng.random((1, 2, 6, 8, 8)).astype(np.float32))
    w = torch.from_numpy(rng.random((4, 2, 3, 3, 3)).astype(np.float32) - 0.5)
    b = torch.from_numpy(rng.random(4).astype(np.float32))
    expected = F3.conv3d(x, w, b, stride=1, padding=1).numpy()
    # NCDHW -> NDHWC, OIDHW -> DHWIO
    xj = jnp.asarray(x.numpy().transpose(0, 2, 3, 4, 1))
    wj = jnp.asarray(w.numpy().transpose(2, 3, 4, 1, 0))
    got = layers.conv3d(xj, wj, jnp.asarray(b.numpy()), 1, 1)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 4, 1, 2, 3),
                               expected, rtol=1e-4, atol=1e-5)

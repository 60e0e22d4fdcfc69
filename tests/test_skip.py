"""Skip U-Net: shapes, jit, grads, MFVI transform, and (when the reference
checkout is present) parameter-count parity with the torch builder."""

import os
import sys

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mfvi_dip_mia_tpu.nn import SkipNet, build_skip_net
from mfvi_dip_mia_tpu.bayes import vi

REFERENCE = "/root/reference"


def _import_reference_models():
    """Import the reference torch builder as an oracle. Its utils module pulls
    in torchvision (absent here); stub it — the builder never calls it."""
    import types
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv.utils = types.SimpleNamespace(make_grid=None)
        sys.modules["torchvision"] = tv
    sys.path.insert(0, REFERENCE)
    try:
        import models as ref_models
        return ref_models
    finally:
        sys.path.remove(REFERENCE)


def count_params(tree):
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(tree)
               if hasattr(x, "shape"))


def default_net(n_out=2, input_depth=16):
    """The runners' standard config (ref bayesian_optimization.py:1320-1333)."""
    return build_skip_net(
        input_depth, n_channels=n_out, pad="reflection",
        skip_n33d=[16, 32, 64, 128, 128], skip_n33u=[16, 32, 64, 128, 128],
        skip_n11=4, num_scales=5, upsample_mode="bilinear")


def test_forward_shape_default():
    net = default_net()
    params = net.init(jax.random.PRNGKey(0))
    x = jnp.zeros((1, 64, 64, 16))
    out = net.apply(params, x, training=False)
    assert out.shape == (1, 64, 64, 2)


def test_forward_shape_inpainting_config():
    """6-scale, no-skip, k=5/3, nearest, no 1x1-up, 4 channels
    (ref bayesian_optimization.py:2970-2998)."""
    net = SkipNet(
        num_input_channels=16, num_output_channels=4,
        num_channels_down=[16, 32, 64, 128, 128, 128],
        num_channels_up=[16, 32, 64, 128, 128, 128],
        num_channels_skip=[0] * 6,
        filter_size_down=5, filter_size_up=3, filter_skip_size=1,
        need1x1_up=False, upsample_mode="nearest", pad="reflection",
        need_sigmoid=False)
    params = net.init(jax.random.PRNGKey(0))
    x = jnp.zeros((1, 64, 64, 16))
    out = net.apply(params, x, training=False)
    assert out.shape == (1, 64, 64, 4)


def test_jit_and_grad_flow():
    net = default_net()
    params = net.init(jax.random.PRNGKey(0))
    # Noise input, like every DIP fit (constant input degenerates BatchNorm).
    x = jax.random.uniform(jax.random.PRNGKey(9), (1, 32, 32, 16)) * 0.1
    target = jnp.zeros((1, 32, 32, 2))

    @jax.jit
    def loss_fn(p):
        out = net.apply(p, x, training=False)
        return jnp.mean((out - target) ** 2)

    g = jax.grad(loss_fn)(params)
    norms = [float(jnp.sum(jnp.abs(leaf))) for leaf in jax.tree.leaves(g)]
    assert all(np.isfinite(n) for n in norms)
    # pre-BN conv biases have EXACTLY zero grad (the skip_bias identity —
    # torch computes the same values as ~1e-10 roundoff); every weight/BN
    # leaf must still receive signal. Count non-bias leaves.
    flat = jax.tree.flatten_with_path(g)[0]
    non_bias = [float(jnp.sum(jnp.abs(leaf))) for path, leaf in flat
                if not (str(path[-1]) == "['b']" and "'out'" not in str(path))]
    assert sum(n > 0 for n in non_bias) > len(non_bias) * 0.9


def test_mfvi_forward_stochastic():
    net = default_net()
    params = vi.to_mfvi(net.init(jax.random.PRNGKey(0)), jax.random.PRNGKey(1))
    x = jnp.ones((1, 32, 32, 16)) * 0.1
    o1 = net.apply(params, x, key=jax.random.PRNGKey(2), training=True)
    o2 = net.apply(params, x, key=jax.random.PRNGKey(3), training=True)
    o3 = net.apply(params, x, key=jax.random.PRNGKey(2), training=True)
    assert not np.allclose(np.asarray(o1), np.asarray(o2))
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o3))
    # eval is deterministic
    e1 = net.apply(params, x, training=False)
    e2 = net.apply(params, x, training=False)
    np.testing.assert_allclose(np.asarray(e1), np.asarray(e2))


def test_dropout_config_stochastic():
    net = build_skip_net(
        16, n_channels=2, pad="reflection", skip_n33d=[16, 32],
        skip_n33u=[16, 32], skip_n11=4, num_scales=2,
        upsample_mode="bilinear",
        dropout_mode_down="2d", dropout_p_down=0.3,
        dropout_mode_up="2d", dropout_p_up=0.3)
    params = net.init(jax.random.PRNGKey(0))
    x = jnp.ones((1, 32, 32, 16)) * 0.1
    o1 = net.apply(params, x, key=jax.random.PRNGKey(1), training=True)
    o2 = net.apply(params, x, key=jax.random.PRNGKey(2), training=True)
    assert not np.allclose(np.asarray(o1), np.asarray(o2))


@pytest.mark.skipif(not os.path.isdir(REFERENCE),
                    reason="reference checkout not available")
def test_param_count_matches_reference_builder():
    """Build the torch reference net (imported from the read-only checkout as
    an oracle, never copied) and compare total parameter counts."""
    ref_models = _import_reference_models()
    tnet = ref_models.get_net(16, "skip", "reflection",
                   skip_n33d=[16, 32, 64, 128, 128],
                   skip_n33u=[16, 32, 64, 128, 128],
                   skip_n11=4, num_scales=5, n_channels=2,
                   upsample_mode="bilinear")
    t_count = sum(p.numel() for p in tnet.parameters())

    net = default_net()
    params = net.init(jax.random.PRNGKey(0))
    # torch BatchNorm2d counts only affine params (running stats are buffers)
    assert count_params(params) == t_count


@pytest.mark.skipif(not os.path.isdir(REFERENCE),
                    reason="reference checkout not available")
def test_param_count_matches_reference_inpainting():
    ref_skip = _import_reference_models().skip
    tnet = ref_skip(
        16, num_output_channels=4, pad="reflection",
        num_channels_down=[16, 32, 64, 128, 128, 128],
        num_channels_up=[16, 32, 64, 128, 128, 128],
        num_channels_skip=[0] * 6, filter_size_down=5, filter_size_up=3,
        filter_skip_size=1, need1x1_up=False, upsample_mode="nearest",
        dropout_mode_down="None", dropout_mode_up="None",
        dropout_mode_skip="None", dropout_mode_output="None",
        need_sigmoid=False)
    t_count = sum(p.numel() for p in tnet.parameters())
    net = SkipNet(
        num_input_channels=16, num_output_channels=4,
        num_channels_down=[16, 32, 64, 128, 128, 128],
        num_channels_up=[16, 32, 64, 128, 128, 128],
        num_channels_skip=[0] * 6, filter_size_down=5, filter_size_up=3,
        filter_skip_size=1, need1x1_up=False, upsample_mode="nearest",
        pad="reflection", need_sigmoid=False)
    params = net.init(jax.random.PRNGKey(0))
    assert count_params(params) == t_count


def test_lanczos_downsample_mode():
    """downsample_mode='lanczos2' routes through the fixed anti-aliased
    downsampler (ref models/common.py:109-111)."""
    net = build_skip_net(
        8, n_channels=2, pad="reflection", skip_n33d=[8, 16],
        skip_n33u=[8, 16], skip_n11=4, num_scales=2,
        upsample_mode="bilinear", downsample_mode="lanczos2")
    params = net.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 32, 32, 8)) * 0.1
    out = net.apply(params, x, training=False)
    assert out.shape == (1, 32, 32, 2)
    assert np.isfinite(np.asarray(out)).all()

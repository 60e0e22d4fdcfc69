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
    # noise input: a CONSTANT input degenerates train-mode BN to exactly
    # `offset` (zeros at init) under the round-5 one-pass moments, which
    # zeroes every activation and hides the dropout masks — the old
    # two-pass BN only passed here by leaking f32 reduction noise
    x = jax.random.uniform(jax.random.PRNGKey(9), (1, 32, 32, 16)) * 0.1
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


@pytest.mark.skipif(not os.path.isdir(REFERENCE), reason="no reference")
def test_forward_golden_vs_torch_inp_6scale():
    """VALUE-level forward parity of the 6-scale no-skip k5/k3 inpainting
    net (ref bayesian_optimization.py:2771-2799, models/skip.py:5-134):
    transplant the torch net's weights into our pytree by call order and
    compare train-mode forwards on the same input. Statistical trajectory
    parity cannot see a forward-semantics bug; this pins it exactly."""
    import torch
    ref_models = _import_reference_models()

    in_ch, size = 32, 256         # 6 stride-2 k5 levels: deepest 4x4 (torch reflect pad needs >2)
    torch.manual_seed(0)
    net_t = ref_models.skip(
        in_ch, num_output_channels=4, pad="reflection",
        num_channels_down=[16, 32, 64, 128, 128, 128],
        num_channels_up=[16, 32, 64, 128, 128, 128],
        num_channels_skip=[0] * 6, filter_size_down=5, filter_size_up=3,
        filter_skip_size=1, need1x1_up=False, upsample_mode="nearest",
        dropout_mode_down="None", dropout_mode_up="None",
        dropout_mode_skip="None", dropout_mode_output="None",
        need_sigmoid=False)
    net_t.train()

    # capture conv/bn modules in CALL order via forward hooks
    seq, hooks = [], []
    for m in net_t.modules():
        if isinstance(m, torch.nn.Conv2d):
            hooks.append(m.register_forward_hook(
                lambda m, i, o, k="conv": seq.append((k, m))))
        elif isinstance(m, torch.nn.BatchNorm2d):
            hooks.append(m.register_forward_hook(
                lambda m, i, o, k="bn": seq.append((k, m))))
    rng = np.random.default_rng(7)
    x_np = rng.uniform(0, 0.1, (1, in_ch, size, size)).astype(np.float32)
    with torch.no_grad():
        out_t = net_t(torch.from_numpy(x_np)).numpy()
    for h in hooks:
        h.remove()

    net_j = SkipNet(
        num_input_channels=in_ch, num_output_channels=4,
        num_channels_down=[16, 32, 64, 128, 128, 128],
        num_channels_up=[16, 32, 64, 128, 128, 128],
        num_channels_skip=[0] * 6, filter_size_down=5, filter_size_up=3,
        filter_skip_size=1, need1x1_up=False, upsample_mode="nearest",
        pad="reflection", need_sigmoid=False)
    params = net_j.init(jax.random.PRNGKey(0))

    it = iter(seq)

    def take(kind):
        k, m = next(it)
        assert k == kind, (k, kind)
        return m

    def conv_leaf():
        m = take("conv")
        return {"w": jnp.asarray(m.weight.detach().numpy()
                                 .transpose(2, 3, 1, 0)),
                "b": jnp.asarray(m.bias.detach().numpy())}

    def bn_leaf():
        m = take("bn")
        return {"scale": jnp.asarray(m.weight.detach().numpy()),
                "offset": jnp.asarray(m.bias.detach().numpy())}

    L = params["levels"]
    for i in range(6):            # down chain fires first, in depth order
        L[i]["down1"] = {"conv": conv_leaf(), "bn": bn_leaf()}
        L[i]["down2"] = {"conv": conv_leaf(), "bn": bn_leaf()}
    for i in reversed(range(6)):  # up chain fires deepest-first
        L[i]["bn_cat"] = bn_leaf()
        L[i]["up"] = {"conv": conv_leaf(), "bn": bn_leaf()}
    params["out"] = {"conv": conv_leaf()}
    assert next(it, None) is None, "torch has modules we did not consume"

    out_j = np.asarray(net_j.apply(
        params, jnp.asarray(x_np.transpose(0, 2, 3, 1)), training=True))
    out_j_cf = np.asarray(net_j.apply(
        params, jnp.asarray(x_np.transpose(0, 2, 3, 1)), training=True,
        layout="auto"))
    ref = out_t.transpose(0, 2, 3, 1)
    np.testing.assert_allclose(out_j, ref, atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(out_j_cf, ref, atol=2e-4, rtol=1e-3)

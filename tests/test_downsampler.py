"""Downsampler kernels and strided depthwise application vs torch."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F
import jax.numpy as jnp

from mfvi_dip_mia_tpu.ops.downsampler import Downsampler, get_kernel


def test_lanczos2_kernel_properties():
    k = get_kernel(2, "lanczos", 0.0, 9, support=2)
    assert k.shape == (9, 9)
    assert k.sum() == pytest.approx(1.0, abs=1e-6)
    assert k[4, 4] == k.max()  # centered


def test_box_kernel():
    k = get_kernel(2, "box", 0.5, 2)
    np.testing.assert_allclose(k, 0.25)


@pytest.mark.parametrize("kernel_type", ["lanczos2", "lanczos3"])
def test_downsampler_matches_torch_conv(rng, kernel_type):
    """Our depthwise strided conv vs torch's grouped conv with the same
    kernel (construction formula: ref models/downsampler.py:74-136)."""
    factor = 2
    ds = Downsampler(n_planes=3, factor=factor, kernel_type=kernel_type,
                     phase=0.5, preserve_size=True)
    x = rng.random((1, 3, 32, 32)).astype(np.float32)

    k = torch.from_numpy(ds.kernel)
    weight = torch.zeros(3, 3, *ds.kernel.shape)
    for i in range(3):
        weight[i, i] = k
    tx = torch.from_numpy(x)
    pad = ds.pad
    tx_p = F.pad(tx, (pad, pad, pad, pad), mode="replicate")
    expected = F.conv2d(tx_p, weight, stride=factor).numpy()

    got = ds(jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2),
                               expected, rtol=1e-4, atol=1e-5)
    assert got.shape == (1, 16, 16, 3)


def test_preserve_size_output_shape():
    for kt in ["lanczos2", "gauss12", "box"]:
        phase = 0.5 if kt == "box" else (0.5 if kt.startswith("lanczos") else 0.0)
        kw = 2 if kt == "box" else None
        ds = Downsampler(1, 2, kt, phase=phase, kernel_width=kw,
                         preserve_size=True)
        out = ds(jnp.ones((1, 16, 16, 1)))
        assert out.shape == (1, 8, 8, 1), kt

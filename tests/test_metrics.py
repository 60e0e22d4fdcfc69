"""Golden tests: PSNR/SSIM/UCE vs the reference formulas executed in torch.

The oracle is re-derived inline from the documented formulas
(ref utils/common_utils.py:297-353, utils/uce.py:9-40) using torch CPU —
no reference code is imported or copied.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F
import jax.numpy as jnp

from mfvi_dip_mia_tpu.ops.metrics import psnr, ssim, uce


def torch_ssim(a, b, window_size=11, sigma=1.5):
    gauss = torch.tensor(
        [np.exp(-(x - window_size // 2) ** 2 / float(2 * sigma ** 2))
         for x in range(window_size)], dtype=torch.float32)
    gauss /= gauss.sum()
    _1d = gauss.unsqueeze(1)
    _2d = _1d.mm(_1d.t()).unsqueeze(0).unsqueeze(0)
    c = a.size(1)
    window = _2d.expand(c, 1, window_size, window_size).contiguous()
    pad = window_size // 2
    mu1 = F.conv2d(a, window, padding=pad, groups=c)
    mu2 = F.conv2d(b, window, padding=pad, groups=c)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 ** 2, mu2 ** 2, mu1 * mu2
    s1 = F.conv2d(a * a, window, padding=pad, groups=c) - mu1_sq
    s2 = F.conv2d(b * b, window, padding=pad, groups=c) - mu2_sq
    s12 = F.conv2d(a * b, window, padding=pad, groups=c) - mu1_mu2
    c1, c2 = 0.01 ** 2, 0.03 ** 2
    m = ((2 * mu1_mu2 + c1) * (2 * s12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (s1 + s2 + c2))
    return m.mean().item()


@pytest.mark.parametrize("channels", [1, 3])
def test_psnr_matches_reference_formula(rng, channels):
    a = rng.random((1, channels, 64, 64)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.1, a.shape), 0, 1).astype(np.float32)
    ta, tb = torch.from_numpy(a), torch.from_numpy(b)
    expected = (10 * torch.log10(1 / F.mse_loss(ta, tb))).item()
    got = float(psnr(jnp.asarray(a.transpose(0, 2, 3, 1)),
                     jnp.asarray(b.transpose(0, 2, 3, 1))))
    assert got == pytest.approx(expected, rel=1e-5)


@pytest.mark.parametrize("channels", [1, 3])
def test_ssim_matches_reference_formula(rng, channels):
    a = rng.random((1, channels, 64, 64)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.1, a.shape), 0, 1).astype(np.float32)
    expected = torch_ssim(torch.from_numpy(a), torch.from_numpy(b))
    got = float(ssim(jnp.asarray(a.transpose(0, 2, 3, 1)),
                     jnp.asarray(b.transpose(0, 2, 3, 1))))
    assert got == pytest.approx(expected, abs=2e-5)


def torch_uce(errors, uncert, n_bins=15, outlier=0.0):
    bounds = torch.linspace(uncert.min().item(), uncert.max().item(), n_bins + 1)
    total = torch.zeros(1)
    for lo, hi in zip(bounds[:-1], bounds[1:]):
        in_bin = uncert.gt(lo.item()) * uncert.le(hi.item())
        prop = in_bin.float().mean()
        if prop.item() > outlier:
            err_b = errors[in_bin].float().mean()
            unc_b = uncert[in_bin].mean()
            total += torch.abs(unc_b - err_b) * prop
    return total.item()


def test_uce_matches_reference_formula(rng):
    err = rng.random((1, 1, 32, 32)).astype(np.float32)
    unc = rng.random((1, 1, 32, 32)).astype(np.float32)
    expected = torch_uce(torch.from_numpy(err), torch.from_numpy(unc))
    got, err_b, unc_b, prop = uce(jnp.asarray(err), jnp.asarray(unc))
    assert float(got) == pytest.approx(expected, rel=1e-4)
    assert float(jnp.nansum(prop * 0 + 1)) > 0  # bins exist


def test_uce_with_range(rng):
    err = rng.random(512).astype(np.float32)
    unc = rng.random(512).astype(np.float32)
    got, *_ = uce(jnp.asarray(err), jnp.asarray(unc), value_range=(0.0, 1.0))
    bounds = torch.linspace(0, 1, 16)
    e, u = torch.from_numpy(err), torch.from_numpy(unc)
    total = torch.zeros(1)
    for lo, hi in zip(bounds[:-1], bounds[1:]):
        in_bin = u.gt(lo.item()) * u.le(hi.item())
        prop = in_bin.float().mean()
        if prop.item() > 0:
            total += torch.abs(u[in_bin].mean() - e[in_bin].mean()) * prop
    assert float(got) == pytest.approx(total.item(), rel=1e-4)


def test_tv_loss_matches_reference_formula(rng):
    """ref utils/sr_utils.py::tv_loss (NCHW) vs ours (NHWC)."""
    from mfvi_dip_mia_tpu.ops.losses import tv_loss
    x = torch.from_numpy(rng.random((1, 2, 8, 8)).astype(np.float32))
    dh = torch.pow(x[:, :, :, 1:] - x[:, :, :, :-1], 2)
    dw = torch.pow(x[:, :, 1:, :] - x[:, :, :-1, :], 2)
    expected = torch.sum(torch.pow(dh[:, :, :-1] + dw[:, :, :, :-1], 0.5)).item()
    got = float(tv_loss(jnp.asarray(x.numpy().transpose(0, 2, 3, 1))))
    assert got == pytest.approx(expected, rel=1e-4)

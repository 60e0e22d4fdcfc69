"""Runner API parity: artifacts, npz schema, return value, device strings."""

import glob
import os

import numpy as np
import pytest

import mfvi_dip_mia_tpu.tasks.data as D
import mfvi_dip_mia_tpu.tasks.problems as P
from mfvi_dip_mia_tpu.nn import build_skip_net
from mfvi_dip_mia_tpu.tasks import runners


@pytest.fixture(autouse=True)
def small_everything(monkeypatch):
    monkeypatch.setattr(D, "get_image_denoising",
                        lambda img: (D.synthetic_xray(img, 64), (64, 64)))
    monkeypatch.setattr(
        P, "_standard_net",
        lambda n, m, p, d=8: build_skip_net(
            d, n_channels=n, pad="reflection", skip_n33d=[8, 16],
            skip_n33u=[8, 16], skip_n11=4, num_scales=2,
            upsample_mode="bilinear"))


def test_all_16_runners_exist():
    for t in ("ct", "den", "sr", "inp"):
        for m in ("dip", "mfvi", "mcd", "sgld"):
            assert f"run_{t}_{m}" in runners.ALL_RUNNERS


def test_run_den_mfvi_artifacts(tmp_path):
    psnr = runners.run_den_mfvi(
        img=1, num_iter=20, lr=3e-3, temp=1e-6, sigma=1e-3, input_depth=8,
        seed=1, show_every=10, plot=True, save=True, save_path=str(tmp_path),
        device="cuda:0")
    assert np.isfinite(psnr)
    run_dir = glob.glob(str(tmp_path / "*"))[0]
    names = {os.path.basename(f) for f in glob.glob(run_dir + "/*")}
    assert {"locals.txt", "input.png", "out_avg.png", "out_var.png",
            "out_ale.png", "save.npz", "loss_mfvi.png"} <= names
    z = np.load(run_dir + "/save.npz", allow_pickle=True)
    assert {"img_gt", "img_noisy", "mse_noisy", "mse_gt", "recons",
            "uncerts", "uncerts_ale", "psnrs", "ssims",
            "mc_mean_recon", "mc_mean_psnr", "mc_mean_ssim",
            "mc_ale", "mc_epi"} <= set(z.files)
    psnrs = z["psnrs"].item()["mfvi"]
    assert psnrs.shape == (21, 3)
    assert psnrs[-1, 2] == pytest.approx(psnr, abs=1e-5)
    # the 25-sample posterior-mean summary (eval_denoising cell 22 parity)
    assert np.isfinite(float(z["mc_mean_psnr"]))
    assert z["mc_mean_recon"].shape == (1, 64, 64)
    assert float(z["mc_epi"].max()) > 0


def test_run_den_dip_no_save(tmp_path):
    psnr = runners.run_den_dip(
        img=0, num_iter=10, lr=1e-3, input_depth=8, seed=1, show_every=10,
        plot=False, save=False, save_path=str(tmp_path))
    assert np.isfinite(psnr)
    assert not list(tmp_path.iterdir())  # nothing written


def test_unused_kwargs_accepted(tmp_path):
    """Parity: runners swallow extra config keys (ref *args/**kwargs)."""
    psnr = runners.run_den_dip(
        img=0, num_iter=5, lr=1e-3, input_depth=8, seed=1, show_every=10,
        plot=False, save=False, save_path=str(tmp_path),
        temp=1.0, sigma=2.0, bo_results_path="x")
    assert np.isfinite(psnr)

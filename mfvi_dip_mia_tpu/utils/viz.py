"""Host-side plotting (matplotlib Agg): loss/PSNR/SSIM curves and image dumps.

Artifact parity with the reference's plot_loss/plot_results
(bayesian_optimization.py:172-258) and the per-show_every PNG dumps
(:1418-1422), plus the BayTorch visualize module's weight/SNR histograms
(BayTorch/visualize/visualization.py:13-96).
"""

from __future__ import annotations

import numpy as np

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

from . import images as I  # noqa: E402


def plot_loss(mse_corrupted, mse_gt, psnrs, iteration, path,
              title="MSE", y_label="psnr_gt_sm"):
    fig, ax0 = plt.subplots()
    ax0.plot(range(len(mse_corrupted[:iteration])), mse_corrupted[:iteration])
    ax0.plot(range(len(mse_gt[:iteration])), mse_gt[:iteration])
    ax0.set_title(title)
    ax0.set_xlabel("iteration")
    ax0.set_ylabel("mse")
    ax0.set_ylim(0, 0.03)
    ax0.grid(True)
    ax1 = ax0.twinx()
    ax1.plot(range(len(psnrs[:iteration])), psnrs[:iteration, 2], "g")
    ax1.set_ylabel(y_label)
    fig.tight_layout()
    fig.savefig(path)
    plt.close("all")


def plot_results(mse_corrupted, mse_gt, psnrs, ssims, out_dir, file=None):
    """Summary curves across methods ({name: array} dicts)."""
    fig, ax = plt.subplots(1, 1)
    for key, loss in mse_corrupted.items():
        ax.plot(range(len(loss)), loss, label=key)
    ax.set(title="MSE noisy", xlabel="iteration", ylabel="mse loss",
           ylim=(0, 0.03))
    ax.grid(True)
    ax.legend()
    plt.tight_layout()
    plt.savefig(f"{out_dir}/mse_noisy.png")

    fig, ax = plt.subplots(1, 1)
    for key, loss in mse_gt.items():
        ax.plot(range(len(loss)), loss, label=key)
    ax.set(title="MSE GT", xlabel="iteration", ylabel="mse loss",
           ylim=(0, 0.01))
    ax.grid(True)
    ax.legend()
    plt.tight_layout()
    plt.savefig(f"{out_dir}/mse_gt.png")

    for name, data, labels in (
            ("psnrs", psnrs, ["psnr_noisy", "psnr_gt", "psnr_gt_sm"]),
            ("ssims", ssims, ["ssim_noisy", "ssim_gt", "ssim_gt_sm"])):
        fig, axs = plt.subplots(1, 3, constrained_layout=True)
        for key, arr in data.items():
            arr = np.asarray(arr)
            if file is not None:
                print(f"{key} {name[:-1].upper()}_max: {np.max(arr)}",
                      file=file)
            for i in range(arr.shape[1]):
                axs[i].plot(range(arr.shape[0]), arr[:, i], label=key)
                axs[i].set(title=labels[i], xlabel="iteration")
                axs[i].legend()
        plt.savefig(f"{out_dir}/{name}.png")
    plt.close("all")


def save_image_png(img_chw: np.ndarray, path: str):
    I.np_to_pil(np.asarray(img_chw)).save(path, "PNG")


def save_normalized_png(img_chw: np.ndarray, path: str):
    m = img_chw.max()
    save_image_png(img_chw / m if m > 0 else img_chw, path)


def plot_image_grid_png(images_chw, path, pad_value=0.0):
    """Simple horizontal image grid dump (stand-in for torchvision
    make_grid; ref utils/common_utils.py:56-87)."""
    imgs = []
    c = max(im.shape[0] for im in images_chw)
    for im in images_chw:
        if im.shape[0] != c:
            im = np.concatenate([im] * c, axis=0)
        imgs.append(im)
    h = max(im.shape[1] for im in imgs)
    w = max(im.shape[2] for im in imgs)
    padded = []
    for im in imgs:
        ph, pw = h - im.shape[1], w - im.shape[2]
        padded.append(np.pad(im, ((0, 0), (0, ph), (0, pw)),
                             constant_values=pad_value))
    grid = np.concatenate(padded, axis=2)
    save_image_png(grid, path)


# -- weight histograms (BayTorch/visualize parity) ---------------------------

def weight_hist(mus, sigmas, path, bins=100):
    """Histogram of posterior means and stds across all variational leaves."""
    fig, axs = plt.subplots(1, 2, figsize=(10, 4))
    axs[0].hist(np.concatenate([np.ravel(m) for m in mus]), bins=bins)
    axs[0].set_title("W_mu")
    axs[1].hist(np.concatenate([np.ravel(s) for s in sigmas]), bins=bins)
    axs[1].set_title("W_sigma")
    fig.tight_layout()
    fig.savefig(path)
    plt.close(fig)


def snr_hist(mus, sigmas, path, bins=100):
    snrs = [np.abs(np.ravel(m)) / np.ravel(s) for m, s in zip(mus, sigmas)]
    fig, ax = plt.subplots()
    ax.hist(np.log10(np.concatenate(snrs) + 1e-12), bins=bins)
    ax.set_xlabel("log10 SNR")
    fig.tight_layout()
    fig.savefig(path)
    plt.close(fig)


def plot_conf(accs_per_bin, conf_per_bin, path):
    """Classification confidence-calibration diagram
    (ref BayTorch/visualize/visualization.py plot_conf)."""
    fig, ax = plt.subplots()
    ax.plot([0, 1], [0, 1], "--", color="gray")
    ax.plot(np.asarray(conf_per_bin), np.asarray(accs_per_bin), "o-")
    ax.set_xlabel("confidence")
    ax.set_ylabel("accuracy")
    ax.set_xlim(0, 1)
    ax.set_ylim(0, 1)
    fig.tight_layout()
    fig.savefig(path)
    plt.close(fig)


def plot_uncert(errors_per_bin, uncert_per_bin, path):
    """Calibration diagram (ref utils/calibration_plots.py:11-40)."""
    fig, ax = plt.subplots()
    ax.plot([0, max(float(np.nanmax(uncert_per_bin)), 1e-9)] * 1, "--",
            color="gray")
    ax.plot(np.asarray(uncert_per_bin), np.asarray(errors_per_bin), "o-")
    ax.set_xlabel("uncertainty")
    ax.set_ylabel("error")
    fig.tight_layout()
    fig.savefig(path)
    plt.close(fig)

"""Scripted evaluation: the reference's eval_{task}.ipynb notebooks as code.

Given one or more ``save.npz`` run artifacts (the runners' output), produce:
  * PSNR/SSIM summary tables — "converged" = mean over the final 100
    iterations of the smoothed-recon metric (column 2), "early-stop" = max
    over all iterations (eval_denoising.ipynb cells 4-9)
  * UCE calibration from the combined ale+epi uncertainty vs squared error
    (eval notebooks cell 18; utils/uce.py semantics)
  * error / uncertainty map PNG dumps
  * classical baselines (wavelet/TV/bilateral denoise, bicubic upscale, FBP)

CLI:  python -m mfvi_dip_mia_tpu.tasks.evaluation run1/save.npz [run2/...]
      [--task den] [--out report_dir]
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def summarize_run(npz_path: str, tail: int = 100) -> dict:
    """Per-method converged/early-stop PSNR + SSIM from a save.npz."""
    z = np.load(npz_path, allow_pickle=True)
    psnrs = z["psnrs"].item()
    ssims = z["ssims"].item()
    out = {}
    for name in psnrs:
        p = np.asarray(psnrs[name])
        s = np.asarray(ssims[name])
        valid = np.isfinite(p[:, 2])
        p_v, s_v = p[valid], s[valid]
        out[name] = {
            "psnr_converged": float(np.mean(p_v[-tail:, 2])),
            "psnr_early_stop": float(np.max(p_v[:, 2])),
            "psnr_early_stop_iter": int(np.nanargmax(
                np.where(np.isfinite(p[:, 2]), p[:, 2], -np.inf))),
            "ssim_converged": float(np.mean(s_v[-tail:, 2])),
            "ssim_early_stop": float(np.max(s_v[:, 2])),
        }
    return out


def calibration_from_run(npz_path: str, n_bins: int = 15) -> dict:
    """UCE of the final snapshot: errors = (recon - gt)^2, uncertainty =
    aleatoric + epistemic (eval notebooks' convention)."""
    from ..ops.metrics import uce
    import jax.numpy as jnp

    z = np.load(npz_path, allow_pickle=True)
    gt_key = [k for k in ("img_gt", "img_hr", "img_inpainting") if k in z][0]
    gt = np.asarray(z[gt_key], np.float32)
    if gt.ndim == 4:  # ct saves (1, C, H, W)
        gt = gt[0]
    out = {}
    recons = z["recons"].item()
    uncerts = z["uncerts"].item()
    uncerts_ale = z["uncerts_ale"].item()
    for name in recons:
        recon = np.asarray(recons[name])[-1]
        epi = np.asarray(uncerts[name])[-1] if name in uncerts else 0.0
        ale = (np.asarray(uncerts_ale[name])[-1]
               if name in uncerts_ale else 0.0)
        total_unc = np.asarray(epi + ale, np.float32)
        if not np.any(total_unc > 0):
            continue
        err = (recon - gt) ** 2
        val, err_b, unc_b, prop = uce(jnp.asarray(err), jnp.asarray(total_unc),
                                      n_bins=n_bins)
        out[name] = {
            "uce": float(val),
            "err_in_bin": np.asarray(err_b).tolist(),
            "uncert_in_bin": np.asarray(unc_b).tolist(),
            "prop_in_bin": np.asarray(prop).tolist(),
        }
    return out


def classical_baselines(task: str, gt: np.ndarray, corrupted) -> dict:
    """PSNR/SSIM of the classical methods on the same data
    (compare_*.ipynb parity)."""
    import jax.numpy as jnp
    from ..ops.metrics import psnr, ssim
    from ..ops import classical as C
    from ..utils.images import chw_to_nhwc

    def score(rec):
        a = jnp.asarray(chw_to_nhwc(np.clip(rec, 0, 1)))
        b = jnp.asarray(chw_to_nhwc(gt))
        return {"psnr": float(psnr(b, a)), "ssim": float(ssim(b, a))}

    out = {}
    if task == "den":
        out["wavelet"] = score(C.wavelet_denoise(corrupted))
        out["tv_chambolle"] = score(C.tv_denoise_chambolle(corrupted))
        out["bilateral"] = score(C.bilateral_denoise(corrupted))
    elif task == "sr":
        factor = gt.shape[-1] // corrupted.shape[-1]
        out["bicubic"] = score(C.bicubic_upscale(corrupted, factor))
    elif task == "ct":
        from ..ops.radon import fbp
        sino, theta = corrupted  # (1, T, W, C) + degrees
        rec = np.asarray(fbp(jnp.asarray(sino), theta, gt.shape[-1])
                         )[0].transpose(2, 0, 1)
        out["fbp_shepp_logan"] = score(rec)
    return out


def _infer_task(z) -> str | None:
    if "img_noisy" in z:
        return "den"
    if "img_lr" in z:
        return "sr"
    if "img_radon" in z:
        return "ct"
    if "img_mask" in z:
        return "inp"
    return None


def baselines_from_run(npz_path: str, task: str | None = None) -> dict:
    """Classical-method rows for the run's own data, straight from the
    save.npz schema (eval_denoising.ipynb cell 21, compare_ct.ipynb cells
    2-5 parity). Inpainting has no classical baseline in the reference."""
    z = np.load(npz_path, allow_pickle=True)
    task = task or _infer_task(z)
    if task == "den":
        gt = np.asarray(z["img_gt"], np.float32)
        return classical_baselines("den", gt,
                                   np.asarray(z["img_noisy"], np.float32))
    if task == "sr":
        gt = np.asarray(z["img_hr"], np.float32)
        lr = np.asarray(z["img_lr"], np.float32)
        if lr.ndim == 2:
            lr = lr[None]
        return classical_baselines("sr", gt, lr)
    if task == "ct":
        gt = np.asarray(z["img_gt"], np.float32)
        if gt.ndim == 4:
            gt = gt[0]
        sino = np.asarray(z["img_radon"], np.float32)  # (1, C, T, W)
        sino = sino.transpose(0, 2, 3, 1)              # -> (1, T, W, C)
        t = sino.shape[1]
        theta = np.arange(t, dtype=np.float32) * (180.0 / t)  # ref :545 grid
        return classical_baselines("ct", gt, (sino, theta))
    return {}


def write_report(npz_paths, out_dir: str, task: str | None = None,
                 with_maps: bool = True) -> dict:
    from ..utils import viz

    os.makedirs(out_dir, exist_ok=True)
    report = {"runs": {}}
    for path in npz_paths:
        entry = {"summary": summarize_run(path),
                 "calibration": calibration_from_run(path),
                 "classical": baselines_from_run(path, task)}
        z_mc = np.load(path, allow_pickle=True)
        if "mc_mean_psnr" in z_mc:  # 25-sample posterior-mean metric
            entry["mc_mean"] = {"psnr": float(z_mc["mc_mean_psnr"]),
                                "ssim": float(z_mc["mc_mean_ssim"])}
        report["runs"][path] = entry

        if with_maps:
            z = np.load(path, allow_pickle=True)
            gt_key = [k for k in ("img_gt", "img_hr", "img_inpainting")
                      if k in z][0]
            gt = np.asarray(z[gt_key], np.float32)
            if gt.ndim == 4:
                gt = gt[0]
            tag = os.path.basename(os.path.dirname(path)) or "run"
            for name, recs in z["recons"].item().items():
                recon = np.asarray(recs)[-1]
                viz.save_image_png(np.clip(recon, 0, 1),
                                   f"{out_dir}/{tag}_{name}_recon.png")
                viz.save_normalized_png(np.abs(recon - gt),
                                        f"{out_dir}/{tag}_{name}_error.png")
                unc = np.asarray(z["uncerts"].item().get(name, [0]))[-1]
                if np.any(unc > 0):
                    viz.save_normalized_png(
                        unc, f"{out_dir}/{tag}_{name}_uncert.png")
                cal = entry["calibration"].get(name)
                if cal:
                    viz.plot_uncert(cal["err_in_bin"], cal["uncert_in_bin"],
                                    f"{out_dir}/{tag}_{name}_calibration.png")

    with open(os.path.join(out_dir, "report.json"), "w") as f:
        json.dump(report, f, indent=2)
    return report


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("npz", nargs="+", help="save.npz artifact paths")
    parser.add_argument("--out", default="./eval_report")
    parser.add_argument("--task", default=None)
    args = parser.parse_args(argv)
    report = write_report(args.npz, args.out, task=args.task)
    for path, entry in report["runs"].items():
        print(f"== {path}")
        for name, row in entry["summary"].items():
            print(f"  {name}: PSNR {row['psnr_converged']:.2f} "
                  f"(early-stop {row['psnr_early_stop']:.2f} "
                  f"@{row['psnr_early_stop_iter']}), "
                  f"SSIM {row['ssim_converged']:.4f}")
        for name, cal in entry["calibration"].items():
            print(f"  {name}: UCE {cal['uce']:.5f}")
        if entry.get("mc_mean"):
            print(f"  mc-mean(25): PSNR {entry['mc_mean']['psnr']:.2f} "
                  f"SSIM {entry['mc_mean']['ssim']:.4f}")
        for name, row in entry.get("classical", {}).items():
            print(f"  [classical] {name}: PSNR {row['psnr']:.2f} "
                  f"SSIM {row['ssim']:.4f}")


if __name__ == "__main__":
    main()

"""UCE calibration-gap diagnosis (VERDICT r4 weak #3): side-by-side
statistics of the epistemic/aleatoric uncertainty maps on MATCHED snapshots
(same iterate count, same synthetic image, 128^2, CPU both sides) for
den/mfvi and den/mcd.

Our UCE reads 10-15% above the oracle's in 4 of 5 parity comparisons; the
binning in uce() is scale-sensitive, so this script separates "our epi map
is hotter" from "same maps, different binning": it reports map-level moments
(mean/std/quantiles of epi, ale, |err|), the per-bin UCE decomposition for
both, and UCE cross-checks (our error with ref uncertainty and vice versa).

Usage: python scripts/uce_diag.py [--method mfvi|mcd] [--iters 1000]
Writes logs/uce_diag_{method}.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

SIZE = 128


def stats(a):
    import numpy as np
    a = np.asarray(a, np.float64).ravel()
    q = np.quantile(a, [0.05, 0.5, 0.95, 0.99])
    return {"mean": float(a.mean()), "std": float(a.std()),
            "q05": float(q[0]), "q50": float(q[1]), "q95": float(q[2]),
            "q99": float(q[3]), "max": float(a.max())}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--method", default="mfvi", choices=["mfvi", "mcd"])
    ap.add_argument("--iters", type=int, default=1000)
    args = ap.parse_args(argv)

    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np
    import ref_oracle

    from mfvi_dip_mia_tpu.tasks.data import synthetic_xray
    img = synthetic_xray(0, SIZE)

    ref = ref_oracle.import_reference()
    ref.get_image_denoising = lambda i: (img, (SIZE, SIZE))
    import torch
    torch.set_num_threads(os.cpu_count() or 8)
    import pathlib
    with tempfile.TemporaryDirectory() as td:
        if args.method == "mfvi":
            ref.run_den_mfvi(img=0, num_iter=args.iters, lr=3e-4, temp=4e-6,
                             sigma=0.01, p_sigma=0.1, plot=False, save=True,
                             save_path=td, show_every=250, seed=42)
        else:
            ref.run_den_mcd(img=0, num_iter=args.iters, lr=3e-4,
                            dropout_p=0.2, weight_decay=1e-4, plot=False,
                            save=True, save_path=td, show_every=250, seed=42)
        sub = [p for p in pathlib.Path(td).iterdir() if p.is_dir()]
        z = np.load(sub[0] / "save.npz", allow_pickle=True)
        key = args.method
        ref_epi = z["uncerts"].item()[key][-1, 0]
        ref_ale = z["uncerts_ale"].item()[key][-1, 0]
        ref_recon = z["recons"].item()[key][-1, 0]
        ref_gt = z["img_gt"][0]

    import mfvi_dip_mia_tpu.tasks.data as D
    from mfvi_dip_mia_tpu.tasks import build_problem
    from mfvi_dip_mia_tpu.tasks.trainer import Method, fit
    D.get_image_denoising = lambda i: (img, (SIZE, SIZE))
    if args.method == "mfvi":
        problem = build_problem("den", "mfvi", 0, p_sigma=0.1)
        method = Method(name="mfvi", temp=4e-6, sigma=0.01)
        fit_kw = {}
    else:
        problem = build_problem("den", "mcd", 0, dropout_p=0.2)
        method = Method(name="mcd", dropout_p=0.2, weight_decay=1e-4)
        fit_kw = {}
    res = fit(problem, method, num_iter=args.iters, lr=3e-4, seed=42,
              show_every=250, **fit_kw)
    ours_epi = res.uncerts_epi[-1, 0]
    ours_ale = res.uncerts_ale[-1, 0]
    ours_recon = res.recons[-1, 0]

    from mfvi_dip_mia_tpu.ops.metrics import uce
    err_ours = np.abs(ours_recon - img[0])
    err_ref = np.abs(ref_recon - ref_gt)

    def uce_full(err, unc):
        u, err_b, unc_b, prop_b = uce(err, unc)
        return {"uce": float(u),
                "err_bins": [float(v) for v in np.asarray(err_b)],
                "unc_bins": [float(v) for v in np.asarray(unc_b)],
                "prop_bins": [float(v) for v in np.asarray(prop_b)]}

    out = {
        "method": args.method, "iters": args.iters, "size": SIZE,
        "ours": {"epi": stats(ours_epi), "ale": stats(ours_ale),
                 "err": stats(err_ours), "uce": uce_full(err_ours, ours_epi)},
        "ref": {"epi": stats(ref_epi), "ale": stats(ref_ale),
                "err": stats(err_ref), "uce": uce_full(err_ref, ref_epi)},
        # cross checks: isolate map-scale vs binning effects
        "cross": {
            "ours_err_ref_epi": float(uce(err_ours, ref_epi)[0]),
            "ref_err_ours_epi": float(uce(err_ref, ours_epi)[0]),
            "epi_mean_ratio_ours_over_ref":
                float(np.mean(ours_epi) / max(np.mean(ref_epi), 1e-12)),
            "ale_mean_ratio_ours_over_ref":
                float(np.mean(ours_ale) / max(np.mean(ref_ale), 1e-12)),
            "err_mean_ratio_ours_over_ref":
                float(np.mean(err_ours) / max(np.mean(err_ref), 1e-12)),
        },
    }
    os.makedirs("logs", exist_ok=True)
    path = f"logs/uce_diag_{args.method}.json"
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out["cross"], indent=2))
    print(f"ours UCE {out['ours']['uce']['uce']:.4f} "
          f"ref UCE {out['ref']['uce']['uce']:.4f} -> wrote {path}")


if __name__ == "__main__":
    main()

"""ct/sgld longer-budget parity confirmation (VERDICT r4 weak #4).

The 500-iter parity row measured -0.67 dB (15.54 vs 16.21, corr 0.969);
with inp/sgld it made SGLD the two worst non-inp deltas. This runs the same
workload at 3x the budget (1500 iters, 128^2, matched hyperparameters) —
oracle on torch CPU, ours on the chip unless MFVI_DIP_CONFIRM_CPU=1 (the
lockstep test pins trainer dynamics; backend does not change f32 semantics
materially) — and records both smoothed tails to logs/ct_sgld_confirm.json.
"""
from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

SIZE = 128
ITERS = 1500


def main():
    import jax
    if os.environ.get("MFVI_DIP_CONFIRM_CPU", "0") == "1":
        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from mfvi_dip_mia_tpu.tasks.data import synthetic_xray
    img = synthetic_xray(0, SIZE)

    def smoothed_tail(x, k=25):
        return float(np.nanmean(np.asarray(x)[-k:]))

    # ours first (chip, fast)
    import mfvi_dip_mia_tpu.tasks.data as D
    from mfvi_dip_mia_tpu.tasks import build_problem
    from mfvi_dip_mia_tpu.tasks.trainer import Method, fit
    D.get_img_ct = lambda i: (img, (SIZE, SIZE))
    problem = build_problem("ct", "sgld", 0)
    res = fit(problem, Method(name="sgld", gamma=0.996, weight_decay=5e-8),
              num_iter=ITERS, lr=3e-4, seed=42, show_every=500)
    ours = {"psnr_sm": smoothed_tail(res.psnrs[:, 2]),
            "ssim_sm": smoothed_tail(res.ssims[:, 2])}
    print(json.dumps({"ours": ours}), flush=True)

    import ref_oracle
    import pathlib
    ref = ref_oracle.import_reference()
    ref.get_img_ct = lambda i: (img, (SIZE, SIZE))
    import torch
    torch.set_num_threads(os.cpu_count() or 8)
    with tempfile.TemporaryDirectory() as td:
        ref.run_ct_sgld(img=0, num_iter=ITERS, lr=3e-4, gamma=0.996,
                        weight_decay=5e-8, plot=False, save=True,
                        save_path=td, show_every=500, seed=42)
        sub = [p for p in pathlib.Path(td).iterdir() if p.is_dir()]
        z = np.load(sub[0] / "save.npz", allow_pickle=True)
        psnrs = z["psnrs"].item()["sgld"]
        ssims = z["ssims"].item()["sgld"]
    refrow = {"psnr_sm": smoothed_tail(psnrs[:, 2]),
              "ssim_sm": smoothed_tail(ssims[:, 2])}

    import numpy as _np
    corr = float(_np.corrcoef(
        _np.asarray(res.psnrs[:, 2])[::10][:ITERS // 10],
        _np.asarray(psnrs[:, 2])[::10][:ITERS // 10])[0, 1])
    out = {"iters": ITERS, "size": SIZE, "ours": ours, "ref": refrow,
           "delta_db": round(ours["psnr_sm"] - refrow["psnr_sm"], 3),
           "traj_corr": round(corr, 4)}
    os.makedirs("logs", exist_ok=True)
    with open("logs/ct_sgld_confirm.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

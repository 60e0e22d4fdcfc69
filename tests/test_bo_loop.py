"""BO loop + fanout with a mock (analytic) objective: convergence toward the
optimum, NaN/crash filtering, round checkpoints, resume."""

import glob

import numpy as np
import pytest

from mfvi_dip_mia_tpu.bo.loop import bo, evaluate_candidates
from mfvi_dip_mia_tpu.parallel.fanout import run_candidates, candidate_kwargs


BO_PARAMS = {
    "temp": {"logbounds": [-10.0, 0.0], "candidates": [1e-2, 1e-8]},
    "sigma": {"logbounds": [-10.0, 0.0], "candidates": [1e-2, 1e-8]},
}


def analytic_psnr(cand):
    """Peak 30 at temp=1e-5, sigma=1e-4 in log space."""
    lt, ls = np.log10(cand[0]), np.log10(cand[1])
    return 30.0 - 0.5 * ((lt + 5.0) ** 2 + (ls + 4.0) ** 2)


def mock_runner(idx, dev, cand):
    return analytic_psnr(cand)


def test_candidate_kwargs_mapping():
    assert candidate_kwargs("mfvi", (1e-5, 1e-3)) == {
        "temp": 1e-5, "sigma": 1e-3}
    assert candidate_kwargs("mcd", (0.2, 1e-4)) == {
        "dropout_p": 0.2, "weight_decay": 1e-4}
    assert candidate_kwargs("sgld", (0.999, 1e-5)) == {
        "gamma": 0.999, "weight_decay": 1e-5}
    assert candidate_kwargs("dip", ()) == {}


def test_fanout_filters_failures():
    def flaky(idx, dev, cand):
        if idx == 0:
            raise RuntimeError("boom")
        if idx == 1:
            return float("nan")
        return 1.0 * idx

    cands = [(1e-3, 1e-3), (1e-4, 1e-4), (1e-5, 1e-5), (1e-6, 1e-6)]
    kept_c, kept_y = run_candidates("denoising", "mfvi", cands, {},
                                    runner=flaky)
    assert kept_y == [2.0, 3.0]
    assert kept_c == [cands[2], cands[3]]


def test_bo_converges_on_analytic_objective(tmp_path):
    run_params = {"bo_results_path": str(tmp_path), "devices": None}
    X, Y = bo("denoising", "mfvi", BO_PARAMS, run_params, n_rounds=4,
              plot=False, runner=mock_runner, gp_iters=300)
    assert max(Y) > 29.0  # found near-optimum (true max 30)
    best = X[int(np.argmax(Y))]
    assert abs(np.log10(best[0]) + 5) < 1.5
    assert abs(np.log10(best[1]) + 4) < 1.5
    # round state checkpoints written
    files = sorted(glob.glob(str(tmp_path / "*_fig_data.npz")))
    assert len(files) == 4
    z = np.load(files[-1])
    assert {"XX_lr", "XX_wd", "pred", "observed_X", "observed_Y",
            "expected_improvement", "confidence", "acq",
            "candidates"} <= set(z.files)
    assert z["pred"].shape == (100, 100)


def test_bo_resume(tmp_path):
    run_params = {"bo_results_path": str(tmp_path), "devices": None}
    bo("denoising", "mfvi", BO_PARAMS, run_params, n_rounds=2, plot=False,
       runner=mock_runner, gp_iters=150)
    n_obs_before = len(np.load(
        sorted(glob.glob(str(tmp_path / "*_fig_data.npz")))[-1]
    )["observed_Y"])
    X, Y = bo("denoising", "mfvi", BO_PARAMS, run_params, n_rounds=4,
              plot=False, resume=True, runner=mock_runner, gp_iters=150)
    assert len(glob.glob(str(tmp_path / "*_fig_data.npz"))) == 4
    assert len(Y) > n_obs_before


def test_evaluate_candidates_table(capsys):
    kept_c, kept_y = evaluate_candidates(
        "denoising", "mfvi", BO_PARAMS,
        {"bo_results_path": "x", "devices": None}, runner=mock_runner)
    assert len(kept_c) == 4  # 2x2 product
    out = capsys.readouterr().out
    assert "psnr" in out
    for y in kept_y:
        assert y == pytest.approx(analytic_psnr(
            kept_c[kept_y.index(y)]), abs=1e-6)

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


def test_bo_round_with_figures(tmp_path):
    """plot=True exercises the 4 diagnostic figures — in particular fig4,
    which plots candidates against their expected improvements and raises on
    a length mismatch (the r2 eis/candidates misalignment bug)."""
    run_params = {"bo_results_path": str(tmp_path), "devices": None}
    bo("denoising", "mfvi", BO_PARAMS, run_params, n_rounds=1,
       plot=True, runner=mock_runner, gp_iters=150)
    for fig in ("fig1", "fig2", "fig3", "fig4"):
        assert glob.glob(str(tmp_path / f"0_{fig}.pdf")), fig


def test_find_candidates_eis_aligned_after_dedup():
    """When several acquisition peaks L-BFGS-converge to one optimum, the
    deduped candidate list and the ei list must stay the same length and
    aligned (np.unique also SORTS — r2 returned pre-dedup eis)."""
    from mfvi_dip_mia_tpu.bo.acquisition import (acquisition_fun,
                                                 find_candidates)
    from mfvi_dip_mia_tpu.bo.gp import train_gp
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    # one clear smooth peak -> all refined starts collapse onto it
    x = rng.random((25, 2))
    y = 30.0 - 8.0 * ((x[:, 0] - 0.55) ** 2 + (x[:, 1] - 0.45) ** 2)
    gp = train_gp(x, y, iter_max=400)
    g = np.stack(np.meshgrid(np.linspace(0, 1, 100),
                             np.linspace(0, 1, 100),
                             indexing="ij"), -1).reshape(-1, 2)
    cands, eis, acq = find_candidates(gp, g, x)
    assert len(cands) == len(eis)
    import jax
    with jax.enable_x64():
        for c, e in zip(cands, eis):
            want = float(acquisition_fun(
                gp, jnp.asarray(c.reshape(1, -1), jnp.float64),
                jnp.asarray(x, jnp.float64), "ei")[0])
            assert e == pytest.approx(want, rel=1e-6, abs=1e-12)


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


def test_bo_screen_confirm(tmp_path):
    """screen_iters mode: rounds run at the reduced budget, then the
    incumbent best candidate gets ONE confirming fit at the full
    run_params.num_iter budget, recorded in screen_confirm.json — NOT
    appended to the screened (X, Y), which must stay single-budget
    (the measured <1h sweep mode)."""
    import json
    import warnings

    calls = []

    def recording_runner(idx, dev, cand):
        calls.append(tuple(cand))
        # screened fits read slightly low; the confirm call (last) is exact
        return analytic_psnr(cand) - 0.25

    run_params = {"bo_results_path": str(tmp_path), "devices": None,
                  "num_iter": 1000}
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        X, Y = bo("denoising", "mfvi", BO_PARAMS, run_params, n_rounds=3,
                  plot=False, runner=recording_runner, gp_iters=200,
                  screen_iters=300)
    # 300 < 0.4*1000: outside the measured ranking-stability evidence
    assert any("ranking-stability floor" in str(x.message) for x in w)
    # one confirm call beyond the rounds' fanouts, at the screened winner
    with open(tmp_path / "screen_confirm.json") as f:
        rec = json.load(f)
    assert rec["screen_iters"] == 300 and rec["full_iters"] == 1000
    assert tuple(rec["best_candidate"]) == calls[-1]
    # the confirm row is NOT mixed into the screened observation set
    assert len(X) == len(Y) == len(calls) - 1
    assert rec["screened_psnr"] == pytest.approx(max(Y))
    assert rec["confirmed_psnr"] == pytest.approx(
        analytic_psnr(rec["best_candidate"]) - 0.25)

    # resume on a completed screened sweep must NOT re-run the confirm fit
    n_calls = len(calls)
    bo("denoising", "mfvi", BO_PARAMS, dict(run_params), n_rounds=3,
       plot=False, runner=recording_runner, gp_iters=200,
       screen_iters=300, resume=True)
    assert len(calls) == n_calls  # no new fits at all (rounds done + skip)

    # guard: screen_iters must be strictly below the full budget
    with pytest.raises(ValueError):
        bo("denoising", "mfvi", BO_PARAMS,
           {"bo_results_path": str(tmp_path), "num_iter": 100},
           n_rounds=1, plot=False, runner=recording_runner,
           screen_iters=100)

"""End-to-end smoke + behavior tests for the generic trainer across the full
(task x method) matrix, on small synthetic images (64^2) for CPU speed."""

import numpy as np
import pytest

import mfvi_dip_mia_tpu.tasks.data as D
from mfvi_dip_mia_tpu.tasks import build_problem
from mfvi_dip_mia_tpu.tasks.trainer import Method, fit


@pytest.fixture(autouse=True)
def small_images(monkeypatch):
    monkeypatch.setattr(D, "get_image_denoising",
                        lambda img: (D.synthetic_xray(img, 64), (64, 64)))
    monkeypatch.setattr(D, "get_img_superresolution",
                        lambda img: (D.synthetic_mri(img, 64), (64, 64)))
    monkeypatch.setattr(D, "get_img_ct",
                        lambda img: (D.shepp_logan(64), (64, 64)))

    def small_inp(img):
        im, mask = D.synthetic_hair(img, 64)
        return im, mask, (64, 64)

    monkeypatch.setattr(D, "get_img_inpainting", small_inp)


@pytest.fixture
def small_nets(monkeypatch):
    """2-scale nets: CPU jit compile of the full 5/6-scale graphs dominates
    test time; topology correctness is covered by test_skip.py."""
    import mfvi_dip_mia_tpu.tasks.problems as P
    from mfvi_dip_mia_tpu.nn import SkipNet, build_skip_net

    def tiny_standard(n_channels, method, dropout_p, input_depth=16):
        kwargs = {}
        if method == "mcd":
            kwargs = dict(dropout_mode_down="2d", dropout_p_down=dropout_p,
                          dropout_mode_up="2d", dropout_p_up=dropout_p)
        return build_skip_net(input_depth, n_channels=n_channels,
                              pad="reflection", skip_n33d=[8, 16],
                              skip_n33u=[8, 16], skip_n11=4, num_scales=2,
                              upsample_mode="bilinear", **kwargs)

    monkeypatch.setattr(P, "_standard_net", tiny_standard)

    real_skipnet = SkipNet

    def tiny_skipnet(**kw):
        kw["num_channels_down"] = [8, 16]
        kw["num_channels_up"] = [8, 16]
        kw["num_channels_skip"] = kw["num_channels_skip"][:2]
        return real_skipnet(**kw)

    monkeypatch.setattr(P, "SkipNet", tiny_skipnet)


METHOD_PARAMS = {
    "dip": {},
    "mfvi": {"temp": 1e-6, "sigma": 1e-3},
    "mcd": {"dropout_p": 0.2, "weight_decay": 1e-4},
    "sgld": {"gamma": 0.9996, "weight_decay": 1e-4},
}


FAST_COMBOS = [("den", "mfvi"), ("sr", "mcd"), ("inp", "sgld"), ("ct", "dip")]


@pytest.mark.parametrize("task,method_name", FAST_COMBOS)
def test_smoke_fast_combinations(task, method_name, small_nets):
    problem = build_problem(task, method_name, 0, input_depth=8)
    method = Method(name=method_name, **METHOD_PARAMS[method_name])
    res = fit(problem, method, num_iter=6, lr=2e-3, seed=1, show_every=3)
    assert res.psnrs.shape == (7, 3)
    assert res.ssims.shape == (7, 3)
    assert np.isfinite(res.psnrs).all()
    assert np.isfinite(res.final_psnr)
    n_snaps = 7 // 3 + 1
    assert res.recons.shape[0] == n_snaps
    assert res.recons.shape[1] == problem.mean_ch
    assert res.recons.min() >= 0 and res.recons.max() <= 1


@pytest.mark.slow
@pytest.mark.parametrize("task", ["den", "sr", "inp", "ct"])
@pytest.mark.parametrize("method_name", ["dip", "mfvi", "mcd", "sgld"])
def test_smoke_all_combinations(task, method_name, small_nets):
    if (task, method_name) in FAST_COMBOS:
        pytest.skip("covered by the fast subset")
    problem = build_problem(task, method_name, 0, input_depth=8)
    method = Method(name=method_name, **METHOD_PARAMS[method_name])
    res = fit(problem, method, num_iter=6, lr=2e-3, seed=1, show_every=3)
    assert np.isfinite(res.psnrs).all()
    assert np.isfinite(res.final_psnr)
    assert res.recons.shape[1] == problem.mean_ch


def test_den_mfvi_learns(small_nets):
    problem = build_problem("den", "mfvi", 0, input_depth=8)
    method = Method(name="mfvi", temp=1e-6, sigma=1e-3)
    res = fit(problem, method, num_iter=150, lr=3e-3, seed=1, show_every=50)
    # smoothed-recon PSNR must climb well above its start
    assert res.final_psnr > res.psnrs[5, 2] + 2
    # absolute floor is seed-sensitive at 150 iters (measured 12.8-14.3
    # over seeds 1-3 for both sampling paths); the climb above is the gate
    assert res.final_psnr > 12
    # uncertainty maps populated
    assert res.uncerts_epi[-1].max() > 0
    assert res.uncerts_ale[-1].max() > 0


def test_den_dip_learns(small_nets):
    problem = build_problem("den", "dip", 0, input_depth=8)
    res = fit(problem, Method(name="dip"), num_iter=150, lr=3e-3, seed=1,
              show_every=50)
    assert res.final_psnr > 13
    # dip has no uncertainty rings
    assert res.uncerts_epi.max() == 0


def test_sgld_lr_decays_and_noise_applied(small_nets):
    problem = build_problem("den", "sgld", 0, input_depth=8)
    method = Method(name="sgld", gamma=0.99, weight_decay=0.0)
    res = fit(problem, method, num_iter=50, lr=1e-3, seed=1, show_every=25)
    assert np.isfinite(res.psnrs).all()


def test_ct_radon_loss_drives_reconstruction(small_nets):
    problem = build_problem("ct", "dip", 0, input_depth=8)
    res = fit(problem, Method(name="dip"), num_iter=150, lr=3e-3, seed=1,
              show_every=50)
    assert res.final_psnr > 11
    assert res.psnrs[-1, 2] >= res.psnrs[10, 2]


def test_ema_smoothing_parity(small_nets):
    """out_avg seeds with the first iterate then follows 0.99/0.01 EMA:
    mse traces must be finite from iteration 0 (no zero-initialized bias)."""
    problem = build_problem("den", "dip", 0, input_depth=8)
    res = fit(problem, Method(name="dip"), num_iter=5, lr=1e-3, seed=1,
              show_every=100)
    assert np.isfinite(res.mse_corrupted).all()
    assert res.mse_corrupted[0] > 0


def test_deterministic_given_seed(small_nets):
    problem = build_problem("den", "mfvi", 0, input_depth=8)
    method = Method(name="mfvi", temp=1e-6, sigma=1e-3)
    r1 = fit(problem, method, num_iter=10, lr=1e-3, seed=7, show_every=100,
             rng=np.random.default_rng(7))
    r2 = fit(problem, method, num_iter=10, lr=1e-3, seed=7, show_every=100,
             rng=np.random.default_rng(7))
    np.testing.assert_allclose(r1.psnrs, r2.psnrs, rtol=1e-5)


def test_fit_interleaved_matches_sequential(small_nets):
    """Two candidates interleaved on one device == two sequential fits
    (same seed -> identical PRNG streams -> identical metric rows)."""
    from mfvi_dip_mia_tpu.tasks.trainer import fit_interleaved

    methods = [Method(name="mfvi", temp=1e-6, sigma=1e-3),
               Method(name="mfvi", temp=1e-4, sigma=1e-2)]
    inter = fit_interleaved(build_problem("den", "mfvi", 0, input_depth=8),
                            methods, num_iter=40, lr=2e-3, seed=3,
                            show_every=20)
    for m, got in zip(methods, inter):
        problem = build_problem("den", "mfvi", 0, input_depth=8)
        want = fit(problem, m, num_iter=40, lr=2e-3, seed=3, show_every=20)
        np.testing.assert_allclose(got.psnrs, want.psnrs, rtol=1e-5,
                                   atol=1e-5)
        assert got.final_psnr == pytest.approx(want.final_psnr, abs=1e-4)


def test_fit_early_stop_truncates(small_nets):
    """Opt-in early stop: an impossible min_delta stops at the first
    patience boundary; trailing metrics are NaN and final_psnr is the last
    computed value."""
    problem = build_problem("den", "mfvi", 0, input_depth=8)
    method = Method(name="mfvi", temp=1e-6, sigma=1e-3)
    res = fit(problem, method, num_iter=200, lr=2e-3, seed=1, show_every=20,
              early_stop={"patience": 40, "min_delta": 100.0})
    assert np.isnan(res.psnrs[-1, 2])
    n_done = int(np.isfinite(res.psnrs[:, 2]).sum())
    assert n_done <= 80  # stopped around patience, far before 200
    assert np.isfinite(res.final_psnr)


def test_fanout_interleaved_groups(small_nets, monkeypatch):
    """run_candidates(auto) groups oversubscribed candidates into one
    interleaved multi-fit per device and returns the same scores as the
    thread path."""
    import jax
    import mfvi_dip_mia_tpu.tasks.data as D
    from mfvi_dip_mia_tpu.parallel.fanout import run_candidates

    run_params = dict(img=0, num_iter=30, lr=2e-3, seed=2, show_every=15,
                      input_depth=8, plot=False, save=False)
    cands = [(1e-6, 1e-3), (1e-4, 1e-2), (1e-5, 3e-3)]
    dev = [jax.devices()[0]]
    kept_i, y_i = run_candidates("den", "mfvi", cands, run_params, dev,
                                 interleave="auto")
    kept_t, y_t = run_candidates("den", "mfvi", cands, run_params, dev,
                                 interleave=False)
    assert kept_i == kept_t
    np.testing.assert_allclose(y_i, y_t, atol=1e-4)


def test_flat_sample_ab(small_nets, monkeypatch):
    """MFVI trains through BOTH sampling paths: the default fused whole-tree
    draw (bayes/vi.py::sample_mfvi_tree) and the per-site RT chain
    (MFVI_DIP_FLAT_SAMPLE=0). Streams differ so trajectories differ, but
    both must learn, and both must be internally deterministic."""
    problem = build_problem("den", "mfvi", 0, input_depth=8)
    method = Method(name="mfvi", temp=1e-6, sigma=1e-3)

    res_flat = fit(problem, method, num_iter=100, lr=3e-3, seed=1,
                   show_every=50)
    monkeypatch.setenv("MFVI_DIP_FLAT_SAMPLE", "0")
    res_site = fit(problem, method, num_iter=100, lr=3e-3, seed=1,
                   show_every=50)
    res_site2 = fit(problem, method, num_iter=100, lr=3e-3, seed=1,
                    show_every=50)

    assert res_flat.final_psnr > res_flat.psnrs[2, 2]
    assert res_site.final_psnr > res_site.psnrs[2, 2]
    # per-site path deterministic under the same seed
    np.testing.assert_allclose(res_site.psnrs, res_site2.psnrs, rtol=1e-5)
    # the two paths are different programs (different PRNG stream use)
    assert res_flat.final_psnr != pytest.approx(res_site.final_psnr,
                                                abs=1e-9)
    # and statistically interchangeable at this scale
    assert abs(res_flat.final_psnr - res_site.final_psnr) < 2.0


def test_fanout_sp_split_matches_plain(small_nets):
    """Undersubscribed fanout: sp_split gives each candidate a multi-device
    'sp' sub-mesh; scores must match the per-device fanout up to the sharded
    reduction-order drift (test_sp_fit_matches_unsharded measured ~0.02 dB)."""
    import jax
    from mfvi_dip_mia_tpu.parallel.fanout import run_candidates

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-virtual-device CPU mesh")

    run_params = dict(img=0, num_iter=40, lr=2e-3, seed=2, show_every=20,
                      input_depth=8, plot=False, save=False)
    cands = [(1e-6, 1e-3), (1e-4, 1e-2)]
    kept_sp, y_sp = run_candidates("den", "mfvi", cands, run_params,
                                   jax.devices(), sp_split=True)   # k = 4
    kept_p, y_p = run_candidates("den", "mfvi", cands, run_params,
                                 [jax.devices()[0]], interleave=False)
    assert kept_sp == kept_p
    np.testing.assert_allclose(y_sp, y_p, atol=0.1)


def test_bf16_compute_path_learns(small_nets):
    """compute_dtype=bf16 with the fused flat draw: the sampled flat vector
    is cast ONCE inside sample_mfvi_tree (out_dtype) instead of per-leaf
    mu/rho converts; the fit must learn and stay finite, and the sampled
    leaves must match the f32 draw within bf16 resolution."""
    import jax
    import jax.numpy as jnp
    from mfvi_dip_mia_tpu.bayes import vi, to_mfvi
    from mfvi_dip_mia_tpu.nn import init as init_lib

    # leaf-level: out_dtype draw == f32 draw rounded to bf16
    tree = to_mfvi({"l": {"w": init_lib.conv_kernel_torch_default(
        jax.random.PRNGKey(0), 3, 3, 4, 8), "b": jnp.zeros((8,))}},
        jax.random.PRNGKey(1))
    k = jax.random.PRNGKey(7)
    s32 = vi.sample_mfvi_tree(tree, k)
    s16 = vi.sample_mfvi_tree(tree, k, out_dtype=jnp.bfloat16)
    assert s16["l"]["w"].dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(s32["l"]["w"], np.float32),
        np.asarray(s16["l"]["w"], np.float32), rtol=0, atol=0.01)

    # end-to-end: a bf16 MFVI fit learns (finite, improving)
    problem = build_problem("den", "mfvi", 0, input_depth=8)
    method = Method(name="mfvi", temp=1e-6, sigma=1e-3)
    res = fit(problem, method, num_iter=100, lr=3e-3, seed=1, show_every=50,
              compute_dtype=jnp.bfloat16)
    assert np.isfinite(res.final_psnr)
    assert res.final_psnr > res.psnrs[2, 2]

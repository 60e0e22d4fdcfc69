"""Multi-chip sharding: mesh construction + the full sharded sweep step on
the 8-virtual-device CPU mesh (what the driver's dryrun exercises)."""

import sys

import numpy as np
import pytest
import jax

from mfvi_dip_mia_tpu.parallel import sharding as sh


def test_make_mesh_factorization():
    mesh = sh.make_mesh(8)
    assert mesh.shape["cand"] * mesh.shape["mc"] == 8
    mesh2 = sh.make_mesh(4, shape=(2, 2))
    assert dict(mesh2.shape) == {"cand": 2, "mc": 2}


def test_dryrun_multichip_8():
    sys.path.insert(0, "/root/repo")
    try:
        import __graft_entry__ as g
    finally:
        sys.path.remove("/root/repo")
    g.dryrun_multichip(8)  # asserts finite losses internally


def test_entry_shapes():
    sys.path.insert(0, "/root/repo")
    try:
        import __graft_entry__ as g
    finally:
        sys.path.remove("/root/repo")
    fn, args = g.entry()
    # abstract evaluation only: compiling the 256^2 flagship on CPU is the
    # driver's job; here we check the program is traceable and well-shaped
    out_shape = jax.eval_shape(fn, *args)
    assert out_shape[0].shape == ()
    assert out_shape[1].shape == (1, 256, 256, 2)


def _tiny_den_problem(size=64, depth=8):
    import jax.numpy as jnp
    import mfvi_dip_mia_tpu.tasks.data as D
    import mfvi_dip_mia_tpu.tasks.problems as P
    from mfvi_dip_mia_tpu.nn import build_skip_net
    from mfvi_dip_mia_tpu.utils import images as I

    img = D.synthetic_xray(0, size)
    noisy = I.add_gaussian_noise(img, 0.1, np.random.default_rng(0))
    net = build_skip_net(depth, n_channels=2, pad="reflection",
                         skip_n33d=[8, 16], skip_n33u=[8, 16], skip_n11=4,
                         num_scales=2, upsample_mode="bilinear")
    return P.Problem(
        task="den", method="mfvi", net=net, input_depth=depth,
        imsize=(size, size), mean_ch=1, gt=jnp.asarray(I.chw_to_nhwc(img)),
        target=jnp.asarray(I.chw_to_nhwc(noisy)), mask=None, operator=None,
        gt_np=img, target_np=noisy, has_ale=True)


def test_spmd_sweep_matches_fit():
    """The production SPMD candidate sweep must be numerically equivalent to
    per-candidate single-device trainer.fit: same seeds -> same metric
    trajectories (VERDICT r2 item 4). 4 candidates on the 4-way 'cand' mesh,
    120 iters in 3 chunks of 40."""
    from mfvi_dip_mia_tpu.tasks.trainer import Method, fit

    problem = _tiny_den_problem()
    methods = [Method(name="mfvi", temp=10.0 ** (-6 - i), sigma=1e-2)
               for i in range(4)]
    num_iter = 119
    finals, psnrs = sh.run_sweep_spmd(
        problem, methods, lr=2e-3, num_iter=num_iter, seed=42,
        show_every=40, chunk_iters=40,
        mesh=sh.make_mesh(4, names=("cand",)))

    assert len(finals) == 4 and np.isfinite(finals).all()
    # candidates differ (different temps -> different trajectories)
    assert len({round(f, 4) for f in finals}) > 1

    for c, m in enumerate(methods):
        res = fit(problem, m, num_iter=num_iter, lr=2e-3, seed=42,
                  show_every=40, collect_snapshots=False)
        np.testing.assert_allclose(psnrs[c], res.psnrs, rtol=5e-4, atol=5e-3)
        assert finals[c] == pytest.approx(res.final_psnr, abs=5e-3)


def test_spmd_sweep_two_candidates_per_slice():
    """C > mesh size: candidates run sequentially per slice via lax.map —
    same results as the 1:1 mapping (the two-fits-per-chip mode)."""
    from mfvi_dip_mia_tpu.tasks.trainer import Method

    problem = _tiny_den_problem()
    methods = [Method(name="mfvi", temp=10.0 ** (-6 - i), sigma=1e-2)
               for i in range(4)]
    f_wide, p_wide = sh.run_sweep_spmd(
        problem, methods, lr=2e-3, num_iter=79, seed=42, show_every=40,
        chunk_iters=40, mesh=sh.make_mesh(4, names=("cand",)))
    f_narrow, p_narrow = sh.run_sweep_spmd(
        problem, methods, lr=2e-3, num_iter=79, seed=42, show_every=40,
        chunk_iters=40, mesh=sh.make_mesh(2, names=("cand",)))
    np.testing.assert_allclose(p_narrow, p_wide, rtol=5e-4, atol=5e-3)


def test_sp_fit_matches_unsharded():
    """Spatial ('sp') sharding: height-split fit must equal the unsharded fit
    up to float reduction order (GSPMD halo exchanges + psums; VERDICT r2
    item 6)."""
    from mfvi_dip_mia_tpu.tasks.trainer import Method, fit

    problem = _tiny_den_problem()
    m = Method(name="mfvi", temp=1e-6, sigma=1e-2)
    res_ref = fit(problem, m, num_iter=79, lr=2e-3, seed=42, show_every=40,
                  collect_snapshots=False)
    mesh = sh.make_mesh(8, names=("sp",))
    res_sp = sh.fit_sp(problem, m, mesh=mesh, num_iter=79, lr=2e-3, seed=42,
                       show_every=40, collect_snapshots=False)
    # psum/halo reduction order differs from the unsharded program; the drift
    # compounds through 80 optimization steps (measured max 0.015 dB with the
    # two-pass BN, 0.037 after the round-5 one-pass moments changed the
    # sharded reduction order — still pure reorder noise)
    np.testing.assert_allclose(res_sp.psnrs, res_ref.psnrs,
                               rtol=1e-3, atol=6e-2)
    assert res_sp.final_psnr == pytest.approx(res_ref.final_psnr, abs=2e-2)

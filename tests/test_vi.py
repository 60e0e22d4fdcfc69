"""Tests for the MFVI pytree transform: structure, KL parity vs torch, RT/LRT
sampling moments."""

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from mfvi_dip_mia_tpu.bayes import vi
from mfvi_dip_mia_tpu.bayes import priors
from mfvi_dip_mia_tpu.nn import layers


def small_params():
    return {
        "a": {"conv": {"w": jnp.zeros((3, 3, 2, 4)), "b": jnp.zeros((4,))},
              "bn": {"scale": jnp.ones((4,)), "offset": jnp.zeros((4,))}},
        "b": [{"w": jnp.zeros((1, 1, 4, 4)), "b": None}],
    }


def test_to_mfvi_structure():
    p = vi.to_mfvi(small_params(), jax.random.PRNGKey(0))
    leaf = p["a"]["conv"]
    assert set(leaf) == {"w_mu", "w_rho", "b_mu", "b_rho"}
    assert leaf["w_mu"].shape == (3, 3, 2, 4)
    # bn untouched
    assert set(p["a"]["bn"]) == {"scale", "offset"}
    # bias=None conv gets no bias posteriors
    assert set(p["b"][0]) == {"w_mu", "w_rho"}
    # init distributions roughly right
    assert float(jnp.std(leaf["w_rho"])) == pytest.approx(0.1, abs=0.05)
    assert float(jnp.mean(leaf["w_rho"])) == pytest.approx(-3.0, abs=0.15)


def test_kl_reverse_matches_torch():
    """KL(prior || posterior) summed, exactly as BayTorch computes it with
    kl_type='reverse' (module.py:64-80)."""
    key = jax.random.PRNGKey(1)
    p = vi.to_mfvi(small_params(), key)
    prior_sigma = 1e-4

    got = float(vi.kl_mfvi(p, 0.0, prior_sigma, kl_type="reverse"))

    total = 0.0
    s_pr = prior_sigma + vi.PRIOR_SIGMA_STABILIZER
    for leaf in [p["a"]["conv"], p["b"][0]]:
        for mu_k, rho_k in (("w_mu", "w_rho"), ("b_mu", "b_rho")):
            if mu_k not in leaf:
                continue
            mu = torch.from_numpy(np.asarray(leaf[mu_k], np.float64))
            rho = torch.from_numpy(np.asarray(leaf[rho_k], np.float64))
            post = torch.distributions.Normal(mu, torch.nn.functional.softplus(rho))
            prior = torch.distributions.Normal(
                torch.zeros_like(mu), torch.full_like(mu, s_pr))
            total += torch.distributions.kl_divergence(prior, post).sum().item()
    assert got == pytest.approx(total, rel=1e-4)


def test_kl_forward_matches_torch():
    key = jax.random.PRNGKey(2)
    p = vi.to_mfvi({"c": {"w": jnp.zeros((3, 3, 1, 1)), "b": None}}, key)
    got = float(vi.kl_mfvi(p, 0.0, 0.1, kl_type="forward"))
    mu = torch.from_numpy(np.asarray(p["c"]["w_mu"], np.float64))
    rho = torch.from_numpy(np.asarray(p["c"]["w_rho"], np.float64))
    post = torch.distributions.Normal(mu, torch.nn.functional.softplus(rho))
    prior = torch.distributions.Normal(torch.zeros_like(mu),
                                       torch.full_like(mu, 0.1 + 1e-6))
    expected = torch.distributions.kl_divergence(post, prior).sum().item()
    assert got == pytest.approx(expected, rel=1e-4)


def test_kl_extreme_temperature_is_finite():
    """POTOBIM regime: prior sigma = sqrt(2.2e-10)*1.7e-7 ~ 2.5e-12 (dominated
    by the 1e-6 stabilizer); KL must stay finite in f32."""
    p = vi.to_mfvi(small_params(), jax.random.PRNGKey(3))
    sigma_pr = float(np.sqrt(2.2e-10) * 1.7e-7)
    kl = float(vi.kl_mfvi(p, 0.0, sigma_pr))
    assert np.isfinite(kl)
    assert kl > 0


def test_rt_sampling_moments():
    """RT conv output over many keys has mean = mean-weight conv."""
    x = jnp.ones((1, 8, 8, 2))
    leaf = {
        "w_mu": 0.3 * jnp.ones((3, 3, 2, 4)),
        "w_rho": -3.0 * jnp.ones((3, 3, 2, 4)),
        "b_mu": jnp.zeros((4,)),
        "b_rho": -5.0 * jnp.ones((4,)),
    }
    outs = jax.vmap(lambda k: vi.apply_conv_leaf(
        leaf, x, stride=1, padding=1, key=k, training=True, reparam="rt"))(
        jax.random.split(jax.random.PRNGKey(0), 256))
    mean = jnp.mean(outs, axis=0)
    expected = layers.conv2d(x, leaf["w_mu"], leaf["b_mu"], 1, 1)
    np.testing.assert_allclose(np.asarray(mean), np.asarray(expected),
                               atol=0.05)


def test_lrt_matches_rt_in_distribution():
    """LRT activation mean/var match analytic conv(mu) / conv(x^2, sigma^2)."""
    x = jnp.asarray(np.random.default_rng(0).random((1, 6, 6, 2)),
                    jnp.float32)
    leaf = {
        "w_mu": 0.1 * jnp.ones((3, 3, 2, 3)),
        "w_rho": -2.0 * jnp.ones((3, 3, 2, 3)),
        "b_mu": None, "b_rho": None,
    }
    outs = jax.vmap(lambda k: vi.apply_conv_leaf(
        leaf, x, stride=1, padding=0, key=k, training=True, reparam="lrt"))(
        jax.random.split(jax.random.PRNGKey(1), 2048))
    emp_mean = jnp.mean(outs, axis=0)
    emp_var = jnp.var(outs, axis=0)
    act_mu = layers.conv2d(x, leaf["w_mu"], None, 1, 0)
    sig2 = jax.nn.softplus(leaf["w_rho"]) ** 2
    act_var = layers.conv2d(x * x, sig2, None, 1, 0)
    np.testing.assert_allclose(np.asarray(emp_mean), np.asarray(act_mu),
                               atol=0.05)
    np.testing.assert_allclose(np.asarray(emp_var), np.asarray(act_var),
                               rtol=0.25, atol=1e-4)


def test_eval_mode_uses_posterior_mean():
    x = jnp.ones((1, 4, 4, 2))
    leaf = {"w_mu": jnp.ones((1, 1, 2, 2)), "w_rho": jnp.zeros((1, 1, 2, 2)),
            "b_mu": jnp.zeros((2,)), "b_rho": jnp.zeros((2,))}
    out = vi.apply_conv_leaf(leaf, x, stride=1, padding=0, training=False)
    np.testing.assert_allclose(np.asarray(out), 2.0)


def test_posterior_mean_params_roundtrip():
    p = vi.to_mfvi(small_params(), jax.random.PRNGKey(5))
    det = vi.posterior_mean_params(p)
    np.testing.assert_allclose(np.asarray(det["a"]["conv"]["w"]),
                               np.asarray(p["a"]["conv"]["w_mu"]))
    assert det["b"][0]["b"] is None


def test_mixture_prior_log_prob_matches_torch():
    prior = priors.make_prior({"mu": [0.0, 0.0], "sigma": [0.1, 1.0],
                               "pi": [0.5, 0.5]})
    x = jnp.linspace(-2, 2, 11)
    got = np.asarray(prior.log_prob(x))
    tx = torch.linspace(-2, 2, 11)
    pdf = 0.5 * torch.exp(torch.distributions.Normal(0., 0.1 + 1e-6).log_prob(tx)) \
        + 0.5 * torch.exp(torch.distributions.Normal(0., 1.0 + 1e-6).log_prob(tx))
    np.testing.assert_allclose(got, torch.log(pdf).numpy(), rtol=1e-4)


def test_mc_kl_close_to_analytic_for_normals():
    p = priors.NormalPrior(0.0, 1.0)
    q = priors.NormalPrior(1.0, 1.0)
    est = priors.mc_kl_divergence(jax.random.PRNGKey(0), p, q, (50000,),
                                  n_samples=1)
    assert float(jnp.mean(est)) == pytest.approx(0.5, abs=0.05)


def test_rt_3d_conv_leaf():
    """Conv3dRT analog: 5-D variational kernels route through conv3d."""
    x = jnp.ones((1, 4, 4, 4, 2))
    leaf = {"w_mu": jnp.ones((1, 1, 1, 2, 3)) * 0.5,
            "w_rho": -6.0 * jnp.ones((1, 1, 1, 2, 3)),
            "b_mu": jnp.zeros((3,)), "b_rho": -6.0 * jnp.ones((3,))}
    out = vi.apply_conv_leaf(leaf, x, stride=1, padding=0,
                             key=jax.random.PRNGKey(0), training=True)
    assert out.shape == (1, 4, 4, 4, 3)
    np.testing.assert_allclose(np.asarray(out), 1.0, atol=0.05)
    # eval: exact posterior mean
    out_e = vi.apply_conv_leaf(leaf, x, stride=1, padding=0, training=False)
    np.testing.assert_allclose(np.asarray(out_e), 1.0, rtol=1e-6)
    # 3-D LRT path
    out_l = vi.apply_conv_leaf(leaf, x, stride=1, padding=0,
                               key=jax.random.PRNGKey(1), training=True,
                               reparam="lrt")
    assert out_l.shape == (1, 4, 4, 4, 3)


def test_kl_mfvi_mc_degenerate_mixture_matches_closed_form():
    """A 2-component mixture with identical components IS a Normal prior, so
    the MC estimate (averaged over keys) must approach the closed-form
    kl_mfvi. Verifies the trainer's mixture routing math (module.py:32-35)."""
    params = {"conv": {"w_mu": 0.3 * jnp.ones((3, 3, 4, 4)),
                       "w_rho": -2.0 * jnp.ones((3, 3, 4, 4))}}
    sigma = 0.5
    exact = float(vi.kl_mfvi(params, 0.0, sigma))
    loc = jnp.zeros((2,))
    scale = jnp.full((2,), sigma + 1e-6)
    pi = jnp.asarray([0.5, 0.5])
    ests = [float(vi.kl_mfvi_mc(params, jax.random.PRNGKey(k),
                                loc, scale, pi)) for k in range(30)]
    assert np.mean(ests) == pytest.approx(exact, rel=0.08)


def test_trainer_accepts_mixture_prior():
    """Method(prior={'pi': ...}) routes the KL through the MC estimator
    inside the scanned step and still trains (finite loss trajectory)."""
    from mfvi_dip_mia_tpu.tasks import build_problem
    from mfvi_dip_mia_tpu.tasks.trainer import Method, fit
    import mfvi_dip_mia_tpu.tasks.data as D
    from unittest import mock
    size = 64
    with mock.patch.object(
            D, "get_image_denoising",
            lambda i: (D.synthetic_xray(i, size), (size, size))):
        problem = build_problem("den", "mfvi", 0, input_depth=8)
    m = Method(name="mfvi", temp=1e-6, sigma=0.01,
               prior={"mu": [0.0, 0.0], "sigma": [0.1, 0.0005],
                      "pi": [0.75, 0.25]})
    res = fit(problem, m, num_iter=30, lr=1e-3, seed=0, show_every=30)
    assert np.isfinite(res.psnrs[:, 0]).all()
    assert np.isfinite(res.final_psnr)


def test_sample_mfvi_tree_structure_and_determinism():
    p = vi.to_mfvi(small_params(), jax.random.PRNGKey(0))
    s1 = vi.sample_mfvi_tree(p, jax.random.PRNGKey(7))
    s2 = vi.sample_mfvi_tree(p, jax.random.PRNGKey(7))
    s3 = vi.sample_mfvi_tree(p, jax.random.PRNGKey(8))
    leaf = s1["a"]["conv"]
    assert set(leaf) == {"w", "b"}
    assert leaf["w"].shape == (3, 3, 2, 4)
    assert leaf["b"].shape == (4,)
    # bias=None conv stays bias-free; bn passes through untouched
    assert s1["b"][0]["b"] is None
    assert s1["a"]["bn"]["scale"] is p["a"]["bn"]["scale"]
    # same key -> identical draw; different key -> different draw
    np.testing.assert_array_equal(np.asarray(leaf["w"]),
                                  np.asarray(s2["a"]["conv"]["w"]))
    assert not np.allclose(np.asarray(leaf["w"]),
                           np.asarray(s3["a"]["conv"]["w"]))
    # deterministic trees pass through unchanged
    q = small_params()
    assert vi.sample_mfvi_tree(q, jax.random.PRNGKey(0)) is q


def test_sample_mfvi_tree_matches_per_site_marginals():
    """Every element must be mu + softplus(rho) * eps with eps ~ N(0,1) iid —
    the RT marginal (BayTorch reparam_layers.py:26-37). Reconstruct eps from
    many draws and check its moments, per leaf and pooled."""
    p = vi.to_mfvi(small_params(), jax.random.PRNGKey(3))
    n = 2000
    eps_all = []
    for leaf_path in (("a", "conv"), ):
        mu = np.asarray(p["a"]["conv"]["w_mu"]).ravel()
        sig = np.asarray(jax.nn.softplus(p["a"]["conv"]["w_rho"])).ravel()
        draws = np.stack([
            np.asarray(vi.sample_mfvi_tree(
                p, jax.random.PRNGKey(i))["a"]["conv"]["w"]).ravel()
            for i in range(n)])
        eps = (draws - mu) / sig
        eps_all.append(eps.ravel())
    eps = np.concatenate(eps_all)
    assert abs(eps.mean()) < 0.01
    assert abs(eps.std() - 1.0) < 0.01
    # independence across elements within one draw: off-diagonal correlation
    # of the first draw's eps vector against the second element stream
    c = np.corrcoef(eps.reshape(n, -1)[:, 0], eps.reshape(n, -1)[:, 1])[0, 1]
    assert abs(c) < 0.08

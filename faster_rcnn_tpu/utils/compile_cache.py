"""Persistent XLA compilation cache (repo-local, shared by every entry point).

The joint train step's cold XLA:TPU compile is expensive (456 s recorded in
BENCH_r04.json); the persistent cache cuts re-runs of the SAME program to
seconds.  Until round 5 only ``__graft_entry__`` enabled it, so the CLIs,
the bench, and the mAP-proxy runs each paid the full cold compile on every
invocation.  This module is the single shared switch: call ``enable()``
before the first jit dispatch (idempotent, safe after backend init — JAX
only reads these config values at compile time).

The cache key includes the XLA flags, backend, and program HLO, so entries
built for CPU/TPU or different shapes never collide.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".jax_cache",
)


def enable(cache_dir: str | None = None) -> None:
    """Point JAX's persistent compilation cache at ``cache_dir``.

    No-ops silently on JAX versions without the config knobs.  Honors an
    explicit JAX_COMPILATION_CACHE_DIR env var over the repo default so
    drivers can redirect it.
    """
    import jax

    d = cache_dir or os.environ.get("JAX_COMPILATION_CACHE_DIR") or _DEFAULT_DIR
    try:
        jax.config.update("jax_compilation_cache_dir", d)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass

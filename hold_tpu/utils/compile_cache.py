"""Persistent XLA compilation cache.

The TPU environment compiles through a remote service with very high
first-compile latency (minutes for mid-sized graphs); the persistent cache
makes every subsequent process reuse serialized executables.  Thresholds are
forced because the default min-compile-time heuristic skips writes under this
backend.
"""

from __future__ import annotations

import os


def enable_compile_cache(cache_dir: str | None = None) -> None:
    import jax

    # CPU executables are AOT-compiled for the *build* machine's ISA features;
    # reusing a cache entry written on a different host can SIGILL.  The cache
    # only pays off against the remote TPU compile service anyway, so keep the
    # CPU backend cache-free.  (Checking the config, not the backend, avoids
    # pinning the platform before callers get to choose it.)
    #
    # Only the FIRST entry of jax_platforms decides the default backend — the
    # environment sets "axon,cpu" on TPU hosts, so a substring test for "cpu"
    # silently disabled the cache everywhere (found when .jax_cache never
    # materialized and every TPU run paid minutes of remote recompiles).
    first = str(jax.config.jax_platforms or "").split(",")[0].strip()
    if first == "cpu":
        return

    cache_dir = cache_dir or os.environ.get(
        "HOLD_TPU_COMPILE_CACHE",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__)))), ".jax_cache"),
    )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

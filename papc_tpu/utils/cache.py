"""Persistent XLA compilation cache.

First compilation of the full detection predict program costs minutes;
without a persistent cache every CLI invocation pays it again. Entry
points call :func:`enable_persistent_cache` so repeated runs reuse
compiled executables across processes.
"""

from __future__ import annotations

import os


def enable_persistent_cache(cache_dir: str | None = None):
    import jax

    cache_dir = cache_dir or os.environ.get(
        "PAPC_COMPILE_CACHE", os.path.expanduser("~/.cache/papc_tpu_xla")
    )
    # scope per backend: CPU executables AOT-compiled elsewhere (e.g. via
    # a remote-compile service) can carry machine-feature claims that
    # mismatch this host
    try:
        cache_dir = os.path.join(cache_dir, jax.default_backend())
    except Exception:
        pass
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # persist EVERY entry: compiles go through the remote relay, so
        # even "fast" sub-second init ops cost a round trip each — a
        # fresh process used to pay ~100 tiny misses (~80 s) while the
        # big jitted programs were already cache hits
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update(
            "jax_persistent_cache_min_entry_size_bytes", 0
        )
    except Exception:
        pass  # older jax without these flags
    return cache_dir

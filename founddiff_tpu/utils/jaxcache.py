"""Persistent XLA compilation cache.

Remote compiles of the 512^2 programs cost 5-40 min through the axon tunnel
(CLAUDE.md); caching them on disk makes bench/profile/entry-point reruns
near-instant.  Call :func:`enable_compilation_cache` before the first jit.
"""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> None:
    import jax

    path = path or os.environ.get(
        "FOUNDDIFF_JAX_CACHE",
        os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), ".jax_cache"),
    )
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 1024)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

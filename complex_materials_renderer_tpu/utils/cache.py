"""Persistent XLA/Mosaic compilation cache.

The reference launches with ZERO compilation — its megakernel ships as
precompiled SPIR-V loaded at startup (reference main.cpp:271-291). The
TPU rebuild's equivalent is JAX's persistent compilation cache: the
first render of a given (scene shape, pass signature) pays the Mosaic
compile (~minutes through a remote compile service), every later process
reloads the executable from disk in seconds. cli.py, bench.py and the
driver entry enable it before the first backend touch.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.environ.get(
    "CMR_COMPILE_CACHE", os.path.expanduser("~/.cache/cmr_tpu_jax")
)


def enable_persistent_cache(cache_dir: str | None = None) -> None:
    """Idempotently point JAX's compilation cache at a durable directory.

    Safe to call multiple times and after jax import; must be called
    before the first compilation to benefit it. Set CMR_COMPILE_CACHE=""
    to disable.
    """
    cache_dir = _DEFAULT_DIR if cache_dir is None else cache_dir
    if not cache_dir:
        return
    import jax

    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # Cache everything that took meaningful compile time; the Mosaic
        # megakernel compiles are the multi-minute offenders.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        # Older JAX without these flags: run without a persistent cache.
        pass

"""Persistent XLA/Mosaic compilation cache (+ the shipped seed).

The reference launches with ZERO compilation — its megakernel ships as
precompiled SPIR-V loaded at startup (reference main.cpp:271-291). The
TPU rebuild's equivalent is two-layer:

- JAX's persistent compilation cache: the first render of a given
  (scene shape, pass signature) pays the Mosaic compile (~minutes
  through a remote compile service), every later process reloads the
  executable from disk in seconds.
- a SHIPPED SEED (``cache_seed/`` inside the package): precompiled
  executables for the default preview configuration, committed to the
  repo exactly like the reference's SPIR-V binaries, and copied into
  the cache directory the first time the cache is enabled — so even a
  fresh cache-less checkout launches its first default render without
  a Mosaic compile. Entries are keyed by (HLO, jax/XLA version,
  platform); a seed built for a different environment simply misses.
  Regenerate with tools/make_cache_seed.py.

cli.py, bench.py and the driver entry enable it before the first
backend touch.
"""

from __future__ import annotations

import json
import os
import shutil
import warnings

_DEFAULT_DIR = os.environ.get(
    "CMR_COMPILE_CACHE", os.path.expanduser("~/.cache/cmr_tpu_jax")
)

SEED_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "cache_seed")
SEED_MANIFEST = os.path.join(SEED_DIR, "MANIFEST.json")


def seed_manifest() -> dict | None:
    """Provenance of the committed seed (written by tools/make_cache_seed.py:
    jax/jaxlib versions, platform, device kind, entry list). ``None`` when
    no manifest is shipped."""
    try:
        with open(SEED_MANIFEST) as f:
            return json.load(f)
    except (OSError, ValueError):
        return None


def seed_cache(cache_dir: str, seed_dir: str | None = None) -> int:
    """Copy shipped precompiled entries into ``cache_dir`` (idempotent:
    entries already present are left alone). Returns the number copied.

    The seed binaries are committed build artifacts (the analogue of the
    reference's committed SPIR-V, main.cpp:271-291), produced by
    tools/make_cache_seed.py on the chip recorded in MANIFEST.json. JAX
    keys entries by (HLO, jax/XLA version, platform), so a seed from a
    different environment simply never matches — but a silent version
    miss also silently reverts cold start to the full Mosaic compile, so
    a version mismatch warns (and tests/test_cache.py fails loudly when
    the installed jax outruns the seed). Set ``CMR_CACHE_SEED=0`` to
    skip seeding entirely."""
    if os.environ.get("CMR_CACHE_SEED", "1") == "0":
        return 0
    seed_dir = SEED_DIR if seed_dir is None else seed_dir
    if not os.path.isdir(seed_dir):
        return 0
    if seed_dir == SEED_DIR:
        man = seed_manifest()
        if man is not None:
            import jax

            if man.get("jax") != jax.__version__:
                warnings.warn(
                    f"shipped compile-cache seed was built for jax "
                    f"{man.get('jax')} but {jax.__version__} is installed; "
                    "the seed will miss and the first default render pays "
                    "the full compile. Regenerate with "
                    "tools/make_cache_seed.py on the chip.",
                    stacklevel=2,
                )
    copied = 0
    for name in os.listdir(seed_dir):
        if not name.endswith("-cache"):
            continue
        dst = os.path.join(cache_dir, name)
        if os.path.exists(dst):
            continue
        try:
            shutil.copyfile(os.path.join(seed_dir, name), dst)
            copied += 1
        except OSError:
            pass
    return copied


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
        seed_cache(cache_dir)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # Cache everything that took meaningful compile time; the Mosaic
        # megakernel compiles are the multi-minute offenders.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        # CRITICAL for the seed (and for any cache relocation): with the
        # XLA-side caches enabled (default), jax injects
        # debug_options.xla_gpu_per_fusion_autotune_cache_dir =
        # <cache_dir>/... into CompileOptions, and jax 0.9's cache key
        # does NOT strip that field — so the cache-dir PATH leaks into
        # every entry's key and entries can never hit from a different
        # directory (measured: the same jit got a new key per dir).
        # These XLA caches are GPU-only machinery; disable them so keys
        # depend on (HLO, versions, platform) alone.
        jax.config.update("jax_persistent_cache_enable_xla_caches", "none")
    except Exception:
        # Older JAX without these flags: run without a persistent cache.
        pass

"""Persistent-compile-cache guards (utils/cache.py).

The shipped ``cache_seed/`` entries are the analogue of the reference's
committed SPIR-V (main.cpp:271-291): they only pay off if (a) the
installed jax still matches the seed's provenance and (b) cache keys are
independent of the cache DIRECTORY and process (the round-4 regression:
jax 0.9 hashed the cache-dir path into every key via
xla_gpu_per_fusion_autotune_cache_dir, so entries could never hit from
another checkout). Both properties are asserted here so a jax upgrade or
a key-behavior change fails loudly instead of silently reverting cold
start from ~15 s to the full ~117 s Mosaic compile.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import jax
import pytest

from complex_materials_renderer_tpu.utils import cache as cache_mod

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_seed_manifest_matches_installed_jax():
    """A jax version bump must fail HERE (regenerate the seed with
    tools/make_cache_seed.py on the chip), not silently miss at runtime."""
    man = cache_mod.seed_manifest()
    assert man is not None, "cache_seed/MANIFEST.json missing"
    assert man["jax"] == jax.__version__, (
        f"shipped cache seed was built for jax {man['jax']} but "
        f"{jax.__version__} is installed — regenerate with "
        "tools/make_cache_seed.py on the chip (the seed can no longer hit)"
    )
    for name in man["entries"]:
        assert os.path.exists(os.path.join(cache_mod.SEED_DIR, name)), name


def test_seed_copy_and_opt_out(tmp_path, monkeypatch):
    seed = tmp_path / "seed"
    seed.mkdir()
    (seed / "fake-entry-cache").write_bytes(b"x" * 16)
    dst = tmp_path / "cache"
    dst.mkdir()

    monkeypatch.setenv("CMR_CACHE_SEED", "0")
    assert cache_mod.seed_cache(str(dst), str(seed)) == 0
    assert not (dst / "fake-entry-cache").exists()

    monkeypatch.delenv("CMR_CACHE_SEED")
    assert cache_mod.seed_cache(str(dst), str(seed)) == 1
    assert (dst / "fake-entry-cache").exists()
    # Idempotent: present entries are not re-copied.
    assert cache_mod.seed_cache(str(dst), str(seed)) == 0


def test_version_mismatch_warns(tmp_path, monkeypatch):
    man = dict(cache_mod.seed_manifest() or {})
    man["jax"] = "0.0.0-not-installed"
    fake_seed = tmp_path / "fake_seed"
    fake_seed.mkdir()
    (fake_seed / "MANIFEST.json").write_text(json.dumps(man))
    monkeypatch.setattr(cache_mod, "SEED_DIR", str(fake_seed))
    monkeypatch.setattr(
        cache_mod, "SEED_MANIFEST", str(fake_seed / "MANIFEST.json")
    )
    dst = tmp_path / "cache"
    dst.mkdir()
    with pytest.warns(UserWarning, match="seed was built for jax"):
        cache_mod.seed_cache(str(dst))


_CHILD = """
import os, sys
cache_dir = sys.argv[1]
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_platforms", "cpu")
from complex_materials_renderer_tpu.utils.cache import enable_persistent_cache
enable_persistent_cache(cache_dir)
# The tiny test jit compiles in well under the production 1 s threshold.
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp

def f(x):
    return jnp.tanh(x @ x + 1.0).sum()

print(jax.jit(f)(jnp.ones((64, 64), jnp.float32)))
"""


def _run_child(cache_dir: str) -> None:
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("CMR_COMPILE_CACHE", None)
    subprocess.run(
        [sys.executable, "-c", _CHILD.format(repo=REPO), cache_dir],
        check=True,
        env=env,
        timeout=300,
        capture_output=True,
    )


def test_cache_keys_are_dir_and_process_independent(tmp_path):
    """Compile with cache dir A, copy the entries to a fresh dir B, and a
    fresh process using B must HIT (write nothing new). This is exactly
    the property the shipped seed rides on; jax 0.9's default settings
    violated it (see enable_persistent_cache)."""
    dir_a = tmp_path / "a"
    dir_b = tmp_path / "b"
    dir_a.mkdir()
    dir_b.mkdir()

    _run_child(str(dir_a))
    entries = [n for n in os.listdir(dir_a) if n.endswith("-cache")]
    assert entries, "child process wrote no cache entries to dir A"

    for n in entries:
        shutil.copyfile(dir_a / n, dir_b / n)
    before = set(os.listdir(dir_b))

    _run_child(str(dir_b))
    after = set(os.listdir(dir_b))
    assert after == before, (
        "seeded cache MISSED from a different directory — cache keys are "
        f"no longer location-independent (new entries: {after - before})"
    )

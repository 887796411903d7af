"""Test config: run on the CPU backend with 8 virtual devices so sharding
tests exercise a multi-chip mesh without TPU hardware (SURVEY §4: the CPU
backend is the CI 'fake backend'; the driver separately dry-runs the
multi-chip path)."""

import os

# Force-override: the runtime environment pre-sets JAX_PLATFORMS=axon (the
# TPU tunnel) and its sitecustomize imports jax at interpreter start, so the
# env var alone is too late — use jax.config as well.
# Stash the runtime's own platform choice so subprocess tests can restore
# the driver-like environment (test_entry.py runs the multichip dryrun in a
# fresh interpreter WITHOUT this file's CPU forcing).
os.environ.setdefault("CMR_ORIG_JAX_PLATFORMS", os.environ.get("JAX_PLATFORMS", ""))
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_SCENES = "/root/reference/resources/scenes"


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


def reference_scene(name: str) -> str:
    path = os.path.join(REFERENCE_SCENES, name)
    if not os.path.exists(path):
        pytest.skip(f"reference scene {name} not available")
    return path

"""Test config: run on the CPU backend with 8 virtual devices so sharding
tests exercise a multi-chip mesh without TPU hardware (SURVEY §4: the CPU
backend is the CI 'fake backend'; the driver separately dry-runs the
multi-chip path)."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

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

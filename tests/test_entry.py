"""Driver entry-point tests: entry() compiles and runs; dryrun_multichip
executes on the virtual 8-device mesh."""

import sys
import os

import jax
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import __graft_entry__ as graft  # noqa: E402


def test_entry_compiles_and_runs():
    fn, args = graft.entry()
    img = jax.jit(fn)(*args)
    img = np.asarray(jax.block_until_ready(img))
    assert img.shape == (24, 32, 3)
    assert np.all(np.isfinite(img))


def test_dryrun_multichip_8():
    graft.dryrun_multichip(8)


def test_dryrun_multichip_driver_env():
    """Run the dryrun exactly as the driver does: a fresh interpreter with
    the runtime's own JAX_PLATFORMS (axon on the real host) and none of
    conftest's CPU forcing. Round 1's init-order bug (backend initialized
    before the CPU fallback config, MULTICHIP_r01.json) only reproduced in
    this environment — conftest masked it in-process."""
    import subprocess

    repo = os.path.join(os.path.dirname(__file__), "..")
    env = dict(os.environ)
    orig = env.pop("CMR_ORIG_JAX_PLATFORMS", "")
    if orig:
        env["JAX_PLATFORMS"] = orig
    else:
        env.pop("JAX_PLATFORMS", None)
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "")
        .replace("--xla_force_host_platform_device_count=8", "")
        .strip()
    )
    res = subprocess.run(
        [sys.executable, "-c", "import __graft_entry__ as g; g.dryrun_multichip(8)"],
        cwd=repo,
        env=env,
        capture_output=True,
        text=True,
        timeout=900,
    )
    assert res.returncode == 0, res.stderr[-3000:]
    assert "dryrun_multichip ok" in res.stdout


def test_dryrun_multichip_odd():
    graft.dryrun_multichip(4)

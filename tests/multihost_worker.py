"""Worker process for the real multi-process multihost test.

Launched by tests/test_sharding.py::test_multihost_two_processes as TWO
separate interpreters that form a jax.distributed job over the CPU
backend (2 local virtual devices each -> a 4-device global mesh). Each
worker renders through parallel.multihost.render_multihost — the
actually-multi-process branch with the final cross-host allgather — and
saves its returned full image for the parent to compare.

Usage: python multihost_worker.py <process_id> <num_processes> <port> <out.npy>
"""

import os
import sys

pid = int(sys.argv[1])
nproc = int(sys.argv[2])
port = sys.argv[3]
out_path = sys.argv[4]

# The runtime pre-sets JAX_PLATFORMS=axon via sitecustomize (which imports
# jax at interpreter start), so config-level forcing is required too.
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)

import numpy as np  # noqa: E402

_here = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _here)
sys.path.insert(0, os.path.dirname(_here))  # repo root for the package

from helpers import (  # noqa: E402
    assemble,
    fixture_camera,
    fixture_lights,
    make_test_scene,
)

from complex_materials_renderer_tpu.parallel import multihost  # noqa: E402

multihost.init_distributed(
    coordinator_address=f"127.0.0.1:{port}",
    num_processes=nproc,
    process_id=pid,
)
assert jax.process_count() == nproc, jax.process_count()
assert len(jax.devices()) == 2 * nproc, jax.devices()

tris, mats, media = make_test_scene()
scene, bvh = assemble(tris, mats, media)
img = multihost.render_multihost(
    fixture_camera(), scene, bvh, fixture_lights(), (16, 16), 2,
    rng_mode="counter",
)
assert img.shape == (16, 16, 3), img.shape
np.save(out_path, img)
jax.distributed.shutdown()

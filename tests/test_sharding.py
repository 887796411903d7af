"""Sharding equivalence on the 8-virtual-device CPU mesh (SURVEY §4:
sharded-vs-single-chip bit-equivalence)."""

import os
import jax
import numpy as np
import pytest

from complex_materials_renderer_tpu.parallel.sharding import (
    make_render_mesh,
    render_beauty_sharded,
)
from complex_materials_renderer_tpu.render.integrator import render_beauty
from helpers import assemble, make_test_scene, fixture_camera, fixture_lights


@pytest.fixture(scope="module")
def setup():
    tris, mats, media = make_test_scene()
    scene, bvh = assemble(tris, mats, media)
    return scene, bvh, fixture_camera(), fixture_lights()


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_tile_sharded_bit_identical_parity(setup):
    scene, bvh, cam, lights = setup
    ref = np.asarray(render_beauty(cam, scene, bvh, lights, (32, 32), 4))
    img = np.asarray(
        render_beauty_sharded(
            cam, scene, bvh, lights, (32, 32), 4, mesh=make_render_mesh()
        )
    )
    np.testing.assert_array_equal(ref, img)


def test_sample_and_tile_sharded_counter(setup):
    scene, bvh, cam, lights = setup
    ref = np.asarray(
        render_beauty(cam, scene, bvh, lights, (32, 32), 8, rng_mode="counter")
    )
    img = np.asarray(
        render_beauty_sharded(
            cam,
            scene,
            bvh,
            lights,
            (32, 32),
            8,
            rng_mode="counter",
            mesh=make_render_mesh(sample_parallel=4),
        )
    )
    # Identical samples; only the psum summation order differs.
    np.testing.assert_allclose(ref, img, atol=1e-6)


def test_non_divisible_height_pads(setup):
    scene, bvh, cam, lights = setup
    ref = np.asarray(render_beauty(cam, scene, bvh, lights, (16, 30), 2))
    img = np.asarray(
        render_beauty_sharded(
            cam, scene, bvh, lights, (16, 30), 2, mesh=make_render_mesh()
        )
    )
    assert img.shape == (30, 16, 3)
    np.testing.assert_array_equal(ref, img)


def test_sample_parallel_requires_counter(setup):
    scene, bvh, cam, lights = setup
    with pytest.raises(ValueError):
        render_beauty_sharded(
            cam,
            scene,
            bvh,
            lights,
            (16, 16),
            8,
            rng_mode="parity",
            mesh=make_render_mesh(sample_parallel=2),
        )


def test_sharded_chunked_renderer_matches_single(setup):
    """The Renderer's sharded band/sample-chunk loop reproduces the
    single-device render."""
    import dataclasses
    import os

    import complex_materials_renderer_tpu.renderer as renderer_mod
    from complex_materials_renderer_tpu.renderer import Renderer
    from complex_materials_renderer_tpu.scene import load_scene

    showcase = os.path.join(os.path.dirname(__file__), "..", "scenes", "showcase.obj")
    if not os.path.exists(showcase):
        pytest.skip("showcase scene not generated")
    base = load_scene(showcase)
    opt = dataclasses.replace(
        base.options,
        width=16,
        height=24,
        num_samples=4,
        backend="bvh",
        cluster_size=8,
    )
    single = Renderer(base, dataclasses.replace(opt, shard="none")).render()
    sharded = Renderer(base, dataclasses.replace(opt, shard="auto")).render()
    np.testing.assert_allclose(sharded, single, atol=1e-6)


@pytest.mark.slow
def test_tile_sharded_mega_engine(setup):
    """The fused megakernel under shard_map (interpreter mode) matches its
    own single-device render bit-for-bit: sharding only partitions rows."""
    from complex_materials_renderer_tpu.accel.clusters import build_clusters
    from complex_materials_renderer_tpu.kernels.pallas_trace import (
        device_cluster_grid,
    )
    from complex_materials_renderer_tpu.render.megarender import (
        render_beauty_mega,
    )

    tris, mats, media = make_test_scene()
    scene, _ = assemble(tris, mats, media)
    grid = device_cluster_grid(build_clusters(tris, mats, cluster_size=8))
    kw = dict(max_depth=4, rr_depth=2, nee_max_media=1)
    cam, lights = fixture_camera(), fixture_lights()
    ref = np.asarray(
        render_beauty_mega(cam, scene, grid, lights, (16, 16), 1, **kw)
    )
    img = np.asarray(
        render_beauty_sharded(
            cam, scene, grid, lights, (16, 16), 1,
            mesh=make_render_mesh(), engine="mega", **kw,
        )
    )
    np.testing.assert_array_equal(ref, img)


def test_multihost_single_process(setup):
    """Single-process multihost path == the plain sharded render (the
    multi-process branch adds only the final cross-host allgather)."""
    from complex_materials_renderer_tpu.parallel import multihost

    scene, bvh, cam, lights = setup
    multihost.init_distributed()  # no-op single host
    img = multihost.render_multihost(
        cam, scene, bvh, lights, (16, 16), 2
    )
    ref = np.asarray(
        render_beauty_sharded(
            cam, scene, bvh, lights, (16, 16), 2, mesh=make_render_mesh()
        )
    )
    np.testing.assert_array_equal(img, ref)


@pytest.mark.slow
def test_tile_sharded_binned_engine(setup):
    """The binned per-lane tracer under shard_map (interpreter mode)
    matches its own single-device render bit-for-bit: the engine's
    internal lane re-sorting is shard-local."""
    from complex_materials_renderer_tpu.accel.clusters import build_clusters
    from complex_materials_renderer_tpu.kernels.pallas_trace import (
        device_cluster_grid,
    )
    from complex_materials_renderer_tpu.render.megarender import (
        render_beauty_mega,
    )

    tris, mats, media = make_test_scene()
    scene, _ = assemble(tris, mats, media)
    grid = device_cluster_grid(build_clusters(tris, mats, cluster_size=8))
    kw = dict(max_depth=3, rr_depth=2, nee_max_media=1)
    cam, lights = fixture_camera(), fixture_lights()
    ref = np.asarray(
        render_beauty_mega(
            cam, scene, grid, lights, (16, 16), 1,
            trace_engine="binned", **kw,
        )
    )
    img = np.asarray(
        render_beauty_sharded(
            cam, scene, grid, lights, (16, 16), 1,
            mesh=make_render_mesh(), engine="binned", **kw,
        )
    )
    np.testing.assert_array_equal(ref, img)


@pytest.mark.slow
def test_multihost_two_processes(setup, tmp_path):
    """REAL multi-process multihost: two separate interpreters form a
    jax.distributed job on the CPU backend (2 virtual devices each, so
    the global ('sample','tile') mesh spans processes) and render via
    multihost.render_multihost — exercising the cross-host allgather
    branch that single-process tests cannot reach. Both workers must
    return the full frame, identical to the single-process sharded
    render (global (pixel, sample) seeding makes the decomposition
    invisible)."""
    import socket
    import subprocess
    import sys as _sys

    scene, bvh, cam, lights = setup

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env.pop("JAX_PLATFORMS", None)
    # The axon sitecustomize registers its PJRT plugin at interpreter
    # start when this is set, which initializes the XLA backend before
    # jax.distributed.initialize() can run — strip it so the worker
    # boots a plain CPU interpreter.
    env.pop("PALLAS_AXON_POOL_IPS", None)
    outs = [str(tmp_path / f"img{i}.npy") for i in range(2)]
    procs = [
        subprocess.Popen(
            [_sys.executable, worker, str(i), "2", str(port), outs[i]],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
        )
        for i in range(2)
    ]
    logs = [p.communicate(timeout=420)[0].decode() for p in procs]
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log}"

    imgs = [np.load(o) for o in outs]
    np.testing.assert_array_equal(imgs[0], imgs[1])
    ref = np.asarray(
        render_beauty_sharded(
            cam, scene, bvh, lights, (16, 16), 2,
            mesh=make_render_mesh(), rng_mode="counter",
        )
    )
    np.testing.assert_array_equal(imgs[0], ref)

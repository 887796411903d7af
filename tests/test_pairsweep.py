"""Pair-sweep engine tests (kernels/pairsweep.py, render/pairrender.py).

The pair engine must be a drop-in for the other engines: same physics
module (integrator._bounce with a swapped Tracer), same per-lane RNG
streams, same image. Trace-level tests compare against trace_binned
(whose payload semantics are the megakernel's by construction): the
'dist'/'nee'/'occl' payloads must be bit-identical; 'full' recomputes
the shading payload from the winning slot outside the kernel, so
position/normal may differ by FMA-contraction ulps (same tolerance
regime as the mega-vs-wavefront tests)."""

import numpy as np
import pytest

from complex_materials_renderer_tpu.accel.clusters import build_clusters
from complex_materials_renderer_tpu.kernels.binned_trace import trace_binned
from complex_materials_renderer_tpu.kernels.megakernel import pack_media
from complex_materials_renderer_tpu.kernels.pairsweep import trace_pairs
from complex_materials_renderer_tpu.kernels.pallas_trace import (
    device_cluster_grid,
)
from complex_materials_renderer_tpu.render.hitinfo import make_scene_arrays
from complex_materials_renderer_tpu.render.integrator import render_beauty
from complex_materials_renderer_tpu.render.megarender import (
    render_beauty_mega,
)

from helpers import make_test_scene, fixture_camera, fixture_lights


def _trace_setup(seed=0, R=100):
    tris, mats, media = make_test_scene()
    grid = build_clusters(tris, mats, cluster_size=16, super_factor=2)
    dg = device_cluster_grid(grid, interpret=True)
    media9 = pack_media(media, 1.0)
    rng = np.random.default_rng(seed)
    o = rng.uniform(-2, 3, (R, 3)).astype(np.float32)
    d = rng.standard_normal((R, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    wlo = tris.reshape(-1, 3).min(0)
    whi = tris.reshape(-1, 3).max(0)
    return dg, media9, o, d, wlo, whi


@pytest.mark.parametrize("payload", ["dist", "nee", "occl"])
def test_trace_pairs_bitexact_vs_binned(payload):
    dg, media9, o, d, wlo, whi = _trace_setup()
    R = o.shape[0]
    bound = np.where(
        np.arange(R) % 7 == 0, 0.0, 6.0 if payload == "nee" else 1e4
    ).astype(np.float32)
    kw = dict(world_lo=wlo, world_hi=whi) if payload == "dist" else {}
    rb = trace_binned(dg, media9, o, d, bound, payload, list_len=4, **kw)
    rp = trace_pairs(
        dg, media9, o, d, bound, payload, list_len=4, chunk_blocks=1, **kw
    )
    for i, (a, b) in enumerate(zip(rb, rp)):
        np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b), err_msg=f"field {i}"
        )


def test_trace_pairs_full_matches_binned():
    dg, media9, o, d, wlo, whi = _trace_setup(seed=1)
    R = o.shape[0]
    bound = np.where(np.arange(R) % 7 == 0, 0.0, 1e4).astype(np.float32)
    rb = trace_binned(
        dg, media9, o, d, bound, "full", world_lo=wlo, world_hi=whi,
        list_len=4,
    )
    rp = trace_pairs(
        dg, media9, o, d, bound, "full", world_lo=wlo, world_hi=whi,
        list_len=4, chunk_blocks=1,
    )
    # t/slot/mat decide control flow: exact. u/v/normal/position are
    # recomputed from the winning slot (same arithmetic, different
    # fusion): ulp tolerance.
    np.testing.assert_array_equal(np.asarray(rb[0]), np.asarray(rp[0]))
    np.testing.assert_array_equal(np.asarray(rb[1]), np.asarray(rp[1]))
    np.testing.assert_array_equal(np.asarray(rb[7]), np.asarray(rp[7]))
    for i in (2, 3, 4, 5, 6, 8, 9, 10):
        np.testing.assert_allclose(
            np.asarray(rb[i]), np.asarray(rp[i]), rtol=1e-5, atol=1e-6,
            err_msg=f"field {i}",
        )


def test_trace_pairs_overflow_generations():
    """list_len=1 forces a relist generation per candidate cluster; the
    result must match a roomy single-generation run exactly."""
    dg, media9, o, d, wlo, whi = _trace_setup(seed=2)
    R = o.shape[0]
    bound = np.full(R, 1e4, np.float32)
    kw = dict(world_lo=wlo, world_hi=whi)
    tight = trace_pairs(
        dg, media9, o, d, bound, "dist", list_len=1, chunk_blocks=1, **kw
    )
    roomy = trace_pairs(
        dg, media9, o, d, bound, "dist", list_len=8, chunk_blocks=1, **kw
    )
    for a, b in zip(tight, roomy):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    nb = np.full(R, 6.0, np.float32)
    tightn = trace_pairs(
        dg, media9, o, d, nb, "nee", list_len=1, chunk_blocks=1
    )
    roomyn = trace_pairs(
        dg, media9, o, d, nb, "nee", list_len=8, chunk_blocks=1
    )
    for a, b in zip(tightn, roomyn):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_trace_pairs_chunking_invariant():
    """chunk_blocks only changes the sweep's grid granularity."""
    dg, media9, o, d, wlo, whi = _trace_setup(seed=3, R=257)
    bound = np.full(257, 1e4, np.float32)
    a = trace_pairs(
        dg, media9, o, d, bound, "dist", world_lo=wlo, world_hi=whi,
        list_len=4, chunk_blocks=1,
    )
    b = trace_pairs(
        dg, media9, o, d, bound, "dist", world_lo=wlo, world_hi=whi,
        list_len=4, chunk_blocks=2,
    )
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


@pytest.mark.slow
def test_pair_matches_wavefront_tiny():
    """Pair engine vs the XLA wavefront engine on an 8x8 frame: the
    physics is literally the same code (integrator._bounce); traces and
    the K-list NEE march must agree on this scene."""
    tris, mats, media = make_test_scene()
    scene = make_scene_arrays(tris, mats, media, 1.0, 1)
    grid = device_cluster_grid(build_clusters(tris, mats, cluster_size=8))
    kw = dict(max_depth=4, rr_depth=2, nee_max_media=2)
    img_p = np.asarray(
        render_beauty_mega(
            fixture_camera(), scene, grid, fixture_lights(), (8, 8), 1,
            trace_engine="pair", **kw
        )
    )
    img_w = np.asarray(
        render_beauty(
            fixture_camera(), scene, grid, fixture_lights(), (8, 8), 1, **kw
        )
    )
    assert np.all(np.isfinite(img_p))
    np.testing.assert_allclose(img_p, img_w, atol=1e-5)


@pytest.mark.slow
def test_pair_matches_mega_counter_mode():
    """Counter-RNG sample-packed path: pair vs fused megakernel, both
    under the megarender driver (same banking/packing)."""
    tris, mats, media = make_test_scene()
    scene = make_scene_arrays(tris, mats, media, 1.0, 1)
    grid = device_cluster_grid(build_clusters(tris, mats, cluster_size=8))
    kw = dict(max_depth=4, rr_depth=2, nee_max_media=2, rng_mode="counter")
    img_p = np.asarray(
        render_beauty_mega(
            fixture_camera(), scene, grid, fixture_lights(), (8, 8), 2,
            trace_engine="pair", **kw
        )
    )
    img_m = np.asarray(
        render_beauty_mega(
            fixture_camera(), scene, grid, fixture_lights(), (8, 8), 2, **kw
        )
    )
    assert np.all(np.isfinite(img_p))
    np.testing.assert_allclose(img_p, img_m, atol=1e-5)

"""Fused-megakernel engine tests (kernels/megakernel.py).

The megakernel must be a drop-in replacement for the wavefront engine:
same physics, same per-lane RNG streams (ops/rng.py PCG32), same image.
On TPU the two engines measured pixel-identical; the CPU CI runs the
Pallas interpreter on a tiny frame and allows float-noise tolerance.
"""

import numpy as np
import pytest

from complex_materials_renderer_tpu.accel.clusters import build_clusters
from complex_materials_renderer_tpu.kernels.pallas_trace import device_cluster_grid
from complex_materials_renderer_tpu.render.hitinfo import make_scene_arrays
from complex_materials_renderer_tpu.render.integrator import render_beauty
from complex_materials_renderer_tpu.render.megarender import _tile_perm, render_beauty_mega

from helpers import make_test_scene, fixture_camera, fixture_lights


def test_tile_perm_roundtrip():
    for w, h in [(32, 32), (64, 48), (17, 9), (100, 33)]:
        perm, inv = _tile_perm(w, h)
        assert sorted(perm.tolist()) == list(range(w * h))
        np.testing.assert_array_equal(perm[inv], np.arange(w * h))


@pytest.mark.slow
def test_mega_matches_wavefront_tiny():
    """Interpreter-mode megakernel vs the XLA wavefront engine on an 8x8
    frame: identical RNG streams and physics -> near-identical image
    (measured max diff ~4e-8 interpreted; exactly 0 on TPU hardware)."""
    tris, mats, media = make_test_scene()
    scene = make_scene_arrays(tris, mats, media, 1.0, 1)
    grid = device_cluster_grid(build_clusters(tris, mats, cluster_size=8))
    kw = dict(max_depth=4, rr_depth=2, nee_max_media=1)
    img_m = np.asarray(
        render_beauty_mega(
            fixture_camera(), scene, grid, fixture_lights(), (8, 8), 1, **kw
        )
    )
    img_w = np.asarray(
        render_beauty(
            fixture_camera(), scene, grid, fixture_lights(), (8, 8), 1, **kw
        )
    )
    assert np.all(np.isfinite(img_m))
    np.testing.assert_allclose(img_m, img_w, atol=1e-5)


@pytest.mark.slow
def test_mega_coincident_shell_nee_matches_wavefront():
    """Double-faced (coincident duplicated) media shells: every NEE
    crossing yields a real boundary PLUS a duplicate within T_MIN. The
    march skips duplicates, but each used to occupy a K-list slot — with
    nee_max_media=1 (list 2) a single box crossing (2 real + 2 dup
    boundaries) exhausted the list and failed dark where the wavefront
    engine's per-leg traces (reference semantics, volpath:353-412)
    resolve. The NEE_DUP_SPARE slots absorb them; images must agree."""
    tris, mats, media = make_test_scene()
    # Duplicate every medium triangle in place (double-faced shell).
    med = mats == 1
    tris = np.concatenate([tris, tris[med]])
    mats = np.concatenate([mats, mats[med]])
    scene = make_scene_arrays(tris, mats, media, 1.0, 1)
    grid = device_cluster_grid(build_clusters(tris, mats, cluster_size=8))
    # Config chosen so in-medium scatter lanes actually run NEE through
    # the doubled shell: with NEE_DUP_SPARE=0 this measured mean
    # 0.027176 vs 0.027695 (spares) — the exhaustion fails dark.
    kw = dict(max_depth=6, rr_depth=3, nee_max_media=1)
    img_m = np.asarray(
        render_beauty_mega(
            fixture_camera(), scene, grid, fixture_lights(), (24, 24), 4,
            **kw,
        )
    )
    img_w = np.asarray(
        render_beauty(
            fixture_camera(), scene, grid, fixture_lights(), (24, 24), 4,
            **kw,
        )
    )
    assert np.all(np.isfinite(img_m))
    np.testing.assert_allclose(img_m, img_w, atol=1e-5)


@pytest.mark.slow
def test_mega_partitioned_grid_matches():
    """An opaque/media-partitioned grid (NEE occlusion walk + media-only
    K-list sweep) renders the same image as the unpartitioned grid."""
    tris, mats, media = make_test_scene()
    scene = make_scene_arrays(tris, mats, media, 1.0, 1)
    kw = dict(max_depth=4, rr_depth=2, nee_max_media=1)
    plain = device_cluster_grid(build_clusters(tris, mats, cluster_size=8))
    part = device_cluster_grid(
        build_clusters(tris, mats, cluster_size=8, media_mats={1})
    )
    assert part.num_opaque_supers > 0
    img_a = np.asarray(
        render_beauty_mega(
            fixture_camera(), scene, plain, fixture_lights(), (8, 8), 1, **kw
        )
    )
    img_b = np.asarray(
        render_beauty_mega(
            fixture_camera(), scene, part, fixture_lights(), (8, 8), 1, **kw
        )
    )
    np.testing.assert_allclose(img_a, img_b, atol=1e-5)


@pytest.mark.slow
def test_mega_cluster_width_invariant():
    """The image must not depend on the cluster width: closest-hit
    updates are strict (order-independent) and the NEE K-list keeps the
    K nearest keys regardless of insertion order, so regrouping
    triangles into narrower/wider clusters renders the same frame.
    Guards the width flip motivated by tools/study_width.py (width
    32/64 models 1.26-1.40x faster on dense-media scenes)."""
    tris, mats, media = make_test_scene()
    scene = make_scene_arrays(tris, mats, media, 1.0, 1)
    kw = dict(max_depth=4, rr_depth=2, nee_max_media=1)
    imgs = []
    for width in (8, 16, 32):
        grid = device_cluster_grid(
            build_clusters(tris, mats, cluster_size=width)
        )
        imgs.append(
            np.asarray(
                render_beauty_mega(
                    fixture_camera(), scene, grid, fixture_lights(),
                    (8, 8), 1, **kw
                )
            )
        )
    np.testing.assert_allclose(imgs[0], imgs[1], atol=1e-5)
    np.testing.assert_allclose(imgs[0], imgs[2], atol=1e-5)


def test_mega_super_factor_invariant():
    """The image must not depend on the super-cluster fan-out: supers are
    pure culling groups, so regrouping clusters under different fan-outs
    (including degenerate 1- and whole-scene groups) renders the same
    frame. Guards the hierarchy-shape sweeps that ride cluster-width
    experiments (at width 32 a fixed fan-out of 16 quadruples the super
    count; scaling the fan-out keeps the linear walk's super-gate count
    flat)."""
    tris, mats, media = make_test_scene()
    scene = make_scene_arrays(tris, mats, media, 1.0, 1)
    kw = dict(max_depth=4, rr_depth=2, nee_max_media=1)
    imgs = []
    for sf in (1, 4, 16):
        grid = device_cluster_grid(
            build_clusters(tris, mats, cluster_size=8, super_factor=sf)
        )
        imgs.append(
            np.asarray(
                render_beauty_mega(
                    fixture_camera(), scene, grid, fixture_lights(),
                    (8, 8), 1, **kw
                )
            )
        )
    np.testing.assert_allclose(imgs[0], imgs[1], atol=1e-5)
    np.testing.assert_allclose(imgs[0], imgs[2], atol=1e-5)


@pytest.mark.slow
def test_mega_skipped_blocks_pass_through():
    """Blocks beyond ``live_blocks`` must pass their state through
    EXPLICITLY (the kernel copies input refs to output refs; it may not
    rely on input_output_aliases preserving unwritten output regions).
    Uses 2 blocks (2048 lanes) with live_blocks=1: block 2's dead lanes
    carry distinctive radiance/RNG that must survive byte-for-byte."""
    import jax.numpy as jnp

    from complex_materials_renderer_tpu.kernels.megakernel import (
        BLOCK,
        MegaState,
        pack_media,
        pack_misc,
        trace_paths_mega,
    )

    tris, mats, media = make_test_scene()
    scene = make_scene_arrays(tris, mats, media, 1.0, 1)
    grid = device_cluster_grid(build_clusters(tris, mats, cluster_size=8))
    r = 2 * BLOCK
    rs = np.random.default_rng(7)
    org = np.tile(np.array([[0.0, 1.5, 5.0]], np.float32), (r, 1))
    d = rs.normal(size=(r, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    alive = np.zeros(r, bool)
    alive[:BLOCK] = True  # block 2 entirely dead
    rad = rs.uniform(size=(r, 3)).astype(np.float32)
    rngs = rs.integers(0, 2**32, size=r, dtype=np.uint32)
    state = MegaState(
        org=jnp.asarray(org),
        dir=jnp.asarray(d),
        thr=jnp.ones((r, 3), jnp.float32),
        rad=jnp.asarray(rad),
        rng=jnp.asarray(rngs),
        depth=jnp.zeros((r,), jnp.int32),
        alive=jnp.asarray(alive),
        aux=jnp.zeros((r,), jnp.uint32),
    )
    media9 = pack_media(scene.media, scene.scale)
    misc = pack_misc(fixture_lights(), scene.world_lo, scene.world_hi)
    out = trace_paths_mega(
        grid, media9, misc, state,
        max_depth=2, rr_depth=1, nee_max_media=1, max_iters=1,
        live_blocks=jnp.int32(1),
    )
    # Block 2: every field identical to the input.
    for field in MegaState._fields:
        got = np.asarray(getattr(out, field))[BLOCK:]
        want = np.asarray(getattr(state, field))[BLOCK:]
        np.testing.assert_array_equal(got, want, err_msg=field)
    # Block 1 actually ran (radiance or rng must have advanced somewhere).
    assert not np.array_equal(np.asarray(out.rng)[:BLOCK], rngs[:BLOCK])


@pytest.mark.slow
def test_mega_debug_knob_takes_effect():
    """The ``debug`` ablation knob is a static jit argument: two
    same-shape renders with different values must produce different
    images (an env-var knob read at trace time would silently reuse the
    first cached trace)."""
    tris, mats, media = make_test_scene()
    scene = make_scene_arrays(tris, mats, media, 1.0, 1)
    grid = device_cluster_grid(build_clusters(tris, mats, cluster_size=8))
    kw = dict(max_depth=3, rr_depth=2, nee_max_media=1)
    cam, lights = fixture_camera(), fixture_lights()
    img_a = np.asarray(
        render_beauty_mega(cam, scene, grid, lights, (8, 8), 1, **kw)
    )
    img_b = np.asarray(
        render_beauty_mega(
            cam, scene, grid, lights, (8, 8), 1, debug="nonee", **kw
        )
    )
    assert not np.allclose(img_a, img_b)


@pytest.mark.slow
def test_mega_counter_sample_packing_matches():
    """Counter mode packs SG sample-lanes per pixel (pixel-group scan).
    The per-(pixel, sample) streams are derived identically, so the image
    must match the wavefront engine's counter render to float noise —
    including the pixel-group padding path (r < PG)."""
    tris, mats, media = make_test_scene()
    scene = make_scene_arrays(tris, mats, media, 1.0, 1)
    grid = device_cluster_grid(build_clusters(tris, mats, cluster_size=8))
    kw = dict(max_depth=4, rr_depth=2, nee_max_media=1, rng_mode="counter")
    cam, lights = fixture_camera(), fixture_lights()
    img_m = np.asarray(
        render_beauty_mega(cam, scene, grid, lights, (8, 8), 4, **kw)
    )
    img_w = np.asarray(
        render_beauty(cam, scene, grid, lights, (8, 8), 4, **kw)
    )
    assert np.all(np.isfinite(img_m))
    np.testing.assert_allclose(img_m, img_w, atol=1e-5)


@pytest.mark.slow
@pytest.mark.parametrize("ablation", ["ordered", "carrywalk"])
def test_mega_ordered_traversal_matches(ablation):
    """The retained CMR_MEGA_DEBUG traversal ablations — 'ordered'
    (nearest-first ordered walk) and 'carrywalk' (register-carried
    state through lax.cond gates, the pre-scratch-ref walk) — must
    render the same image as the default scratch-ref linear culled
    traversal: all are exact traversals, differing only in visit order
    / state residency."""
    tris, mats, media = make_test_scene()
    scene = make_scene_arrays(tris, mats, media, 1.0, 1)
    grid = device_cluster_grid(build_clusters(tris, mats, cluster_size=8))
    kw = dict(max_depth=4, rr_depth=2, nee_max_media=1)
    cam, lights = fixture_camera(), fixture_lights()
    img_lin = np.asarray(
        render_beauty_mega(cam, scene, grid, lights, (8, 8), 1, **kw)
    )
    img_abl = np.asarray(
        render_beauty_mega(
            cam, scene, grid, lights, (8, 8), 1, debug=ablation, **kw
        )
    )
    np.testing.assert_allclose(img_abl, img_lin, atol=1e-6)


@pytest.mark.slow
def test_mega_fused_dnee_matches():
    """The fused dist+NEE walk (the DEFAULT — one 'dnee' traversal from
    the shared hit-point origin) must render the same image as the
    separate dist trace + NEE sweep (CMR_MEGA_DEBUG=nofuse): per-set
    accepts are gated by their own geometry tests, and the tighter
    evolving opaque bound only prunes list entries the march ignores
    anyway. Checked on both the plain and the opaque/media-partitioned
    grid (where the fused walk replaces THREE walks: dist + occlusion +
    K-list sweep)."""
    tris, mats, media = make_test_scene()
    scene = make_scene_arrays(tris, mats, media, 1.0, 1)
    kw = dict(max_depth=4, rr_depth=2, nee_max_media=1)
    cam, lights = fixture_camera(), fixture_lights()
    for grid in (
        device_cluster_grid(build_clusters(tris, mats, cluster_size=8)),
        device_cluster_grid(
            build_clusters(tris, mats, cluster_size=8, media_mats={1})
        ),
    ):
        img_sep = np.asarray(
            render_beauty_mega(
                cam, scene, grid, lights, (8, 8), 1, debug="nofuse", **kw
            )
        )
        img_fus = np.asarray(
            render_beauty_mega(cam, scene, grid, lights, (8, 8), 1, **kw)
        )
        assert np.all(np.isfinite(img_fus))
        np.testing.assert_allclose(img_fus, img_sep, atol=1e-6)


@pytest.mark.slow
@pytest.mark.parametrize("mode", ["all", "hybrid"])
def test_mega_dynamic_schedule_modes(mode):
    """Dynamic live_blocks modes (sorted full-shape wavefront, traced
    block bound, aliased state I/O) produce the same image as the static
    phase schedule."""
    tris, mats, media = make_test_scene()
    scene = make_scene_arrays(tris, mats, media, 1.0, 1)
    grid = device_cluster_grid(build_clusters(tris, mats, cluster_size=8))
    kw = dict(max_depth=4, rr_depth=2, nee_max_media=1)
    cam, lights = fixture_camera(), fixture_lights()
    ref = np.asarray(
        render_beauty_mega(
            cam, scene, grid, lights, (8, 8), 1, schedule_mode="off", **kw
        )
    )
    img = np.asarray(
        render_beauty_mega(
            cam, scene, grid, lights, (8, 8), 1, schedule_mode=mode, **kw
        )
    )
    np.testing.assert_allclose(img, ref, atol=1e-6)


@pytest.mark.slow
def test_mega_dynamic_multiblock_skip():
    """Dynamic live_blocks with a MULTI-block wavefront (advisor r2
    finding: the 8x8 tests only ever exercised one block, so the
    skipped-block path never ran in CI). A 64x32 frame = 2 kernel
    blocks; as lanes die and the sorted wavefront shrinks below one
    block, later bounces run with live_blocks=1 and the second block
    must pass through explicitly — a garbled pass-through corrupts the
    banked radiance of every dead lane."""
    tris, mats, media = make_test_scene()
    scene = make_scene_arrays(tris, mats, media, 1.0, 1)
    grid = device_cluster_grid(build_clusters(tris, mats, cluster_size=8))
    kw = dict(max_depth=4, rr_depth=2, nee_max_media=1)
    cam, lights = fixture_camera(), fixture_lights()
    ref = np.asarray(
        render_beauty_mega(
            cam, scene, grid, lights, (64, 32), 1, schedule_mode="off", **kw
        )
    )
    img = np.asarray(
        render_beauty_mega(
            cam, scene, grid, lights, (64, 32), 1, schedule_mode="all", **kw
        )
    )
    assert np.all(np.isfinite(img))
    np.testing.assert_allclose(img, ref, atol=1e-6)


def test_mega_ld_matches_wavefront():
    """rng='ld' in the megakernel must sample the exact same Owen-
    scrambled Sobol values as the wavefront engine's ops/rng.py ld path:
    both assign lockstep dimensions (camera jitter = dims 0-1, bounce
    k's sites = dims 2+8k..9+8k), so images agree to float-associativity
    noise like the PCG modes do."""
    tris, mats, media = make_test_scene()
    scene = make_scene_arrays(tris, mats, media, 1.0, 1)
    grid = device_cluster_grid(build_clusters(tris, mats, cluster_size=8))
    kw = dict(max_depth=4, rr_depth=2, nee_max_media=1, rng_mode="ld")
    img_m = np.asarray(
        render_beauty_mega(
            fixture_camera(), scene, grid, fixture_lights(), (8, 8), 2, **kw
        )
    )
    img_w = np.asarray(
        render_beauty(
            fixture_camera(), scene, grid, fixture_lights(), (8, 8), 2, **kw
        )
    )
    assert np.all(np.isfinite(img_m))
    np.testing.assert_allclose(img_m, img_w, atol=1e-5)
    # And ld samples the counter estimand: means agree at low spp.
    img_c = np.asarray(
        render_beauty_mega(
            fixture_camera(), scene, grid, fixture_lights(), (8, 8), 32,
            max_depth=4, rr_depth=2, nee_max_media=1, rng_mode="counter",
        )
    )
    img_l = np.asarray(
        render_beauty_mega(
            fixture_camera(), scene, grid, fixture_lights(), (8, 8), 32,
            **kw,
        )
    )
    assert abs(img_l.mean() - img_c.mean()) < 0.01

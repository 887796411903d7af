"""Integrator behavior tests: physics oracles on controlled scenes plus
backend equivalence (SURVEY §4 test plan)."""

import jax.numpy as jnp
import numpy as np

from complex_materials_renderer_tpu.ops.camera import make_camera
from complex_materials_renderer_tpu.ops.medium import MediaTable
from complex_materials_renderer_tpu.render.integrator import (
    Lights,
    render_beauty,
    sample_direct_light,
)
from helpers import assemble, box_triangles, make_test_scene, quad, fixture_camera, fixture_lights


def _no_media():
    return MediaTable(
        mat_id=np.array([-2], np.int32),
        sigma_s=np.zeros((1, 3), np.float32),
        sigma_a=np.zeros((1, 3), np.float32),
        g=np.zeros((1, 3), np.float32),
        ior=np.ones((1,), np.float32),
    )


def test_beauty_finite_and_deterministic():
    tris, mats, media = make_test_scene()
    scene, bvh = assemble(tris, mats, media)
    img1 = np.asarray(render_beauty(fixture_camera(), scene, bvh, fixture_lights(), (32, 24), 4))
    img2 = np.asarray(render_beauty(fixture_camera(), scene, bvh, fixture_lights(), (32, 24), 4))
    assert np.all(np.isfinite(img1))
    np.testing.assert_array_equal(img1, img2)  # bit-reproducible (volpath:575)
    assert img1.max() > 0.0  # something is lit


def test_counter_mode_close_to_parity_in_expectation():
    tris, mats, media = make_test_scene()
    scene, bvh = assemble(tris, mats, media)
    a = np.asarray(
        render_beauty(fixture_camera(), scene, bvh, fixture_lights(), (16, 16), 64)
    )
    b = np.asarray(
        render_beauty(
            fixture_camera(), scene, bvh, fixture_lights(), (16, 16), 64, rng_mode="counter"
        )
    )
    # Same estimator, different streams: means agree statistically.
    assert abs(a.mean() - b.mean()) / max(a.mean(), 1e-9) < 0.15


def test_direct_light_unoccluded_inverse_square():
    tris, mats, media = make_test_scene(with_medium=False)
    scene, bvh = assemble(tris, mats, media)
    lights = Lights(
        position=jnp.array([0.0, 5.0, 0.0]), intensity=jnp.array([10.0, 10.0, 10.0])
    )
    # Point 1 unit below the light, nothing in between.
    pos = jnp.array([[0.0, 4.0, 0.0]])
    val = np.asarray(
        sample_direct_light(pos, scene, bvh, lights, jnp.array([True]), 4)
    )[0]
    np.testing.assert_allclose(val, 10.0, rtol=1e-4)
    # Twice the distance -> quarter the power.
    pos2 = jnp.array([[0.0, 3.0, 0.0]])
    val2 = np.asarray(
        sample_direct_light(pos2, scene, bvh, lights, jnp.array([True]), 4)
    )[0]
    np.testing.assert_allclose(val2, 2.5, rtol=1e-4)


def test_direct_light_occluded_by_surface():
    tris, mats, media = make_test_scene(with_medium=False)
    scene, bvh = assemble(tris, mats, media)
    lights = Lights(
        position=jnp.array([0.0, -5.0, 0.0]), intensity=jnp.array([10.0, 10.0, 10.0])
    )
    # Light below the floor, point above it -> fully occluded (the floor
    # has no medium; volpath:372-376).
    pos = jnp.array([[0.0, 3.0, 0.0]])
    val = np.asarray(
        sample_direct_light(pos, scene, bvh, lights, jnp.array([True]), 4)
    )[0]
    np.testing.assert_array_equal(val, 0.0)


def test_direct_light_through_medium_beer_lambert():
    # Light behind a medium box; shadow ray crosses the box (one pair).
    box = box_triangles([0.0, 0.0, 0.0], 1.0)
    mats = np.zeros(len(box), np.int32)
    media = MediaTable(
        mat_id=np.array([0], np.int32),
        sigma_s=np.array([[0.1, 0.2, 0.3]], np.float32),
        sigma_a=np.array([[0.05, 0.05, 0.05]], np.float32),
        g=np.zeros((1, 3), np.float32),
        ior=np.array([1.0], np.float32),
    )
    scene, bvh = assemble(box, mats, media, scale=1.0)
    lights = Lights(
        position=jnp.array([0.0, 0.0, 10.0]), intensity=jnp.array([100.0, 100.0, 100.0])
    )
    pos = jnp.array([[0.0, 0.0, -5.0]])  # 15 units from light, box spans z[-1,1]
    val = np.asarray(
        sample_direct_light(pos, scene, bvh, lights, jnp.array([True]), 4)
    )[0]
    expect = 100.0 / 15.0**2 * 0.9 * np.exp(-np.array([0.15, 0.25, 0.35]) * 2.0)
    np.testing.assert_allclose(val, expect, rtol=1e-3)


def test_surface_only_scene_single_bounce_analytic():
    """One diffuse floor, light above: with max_depth so the first bounce
    dominates, the direct term matches the analytic NEE estimate at the
    hit point for a pinned camera ray."""
    tris = np.asarray(
        quad([-100, 0, 100], [100, 0, 100], [100, 0, -100], [-100, 0, -100]),
        np.float32,
    )
    mats = np.zeros(2, np.int32)
    scene, bvh = assemble(tris, mats, _no_media(), background=0)
    # NB: looking straight down the world-up axis would degenerate the
    # look-at basis (cross with (0,1,0), volpath:589) — tilt slightly. The
    # center ray from (0,2,1) toward the origin hits the floor at (0,0,0).
    cam = make_camera((0.0, 2.0, 1.0), (0.0, 0.0, 0.0), 36.0)
    lights = Lights(
        position=jnp.array([0.0, 3.0, 0.0]), intensity=jnp.array([50.0, 50.0, 50.0])
    )
    img = np.asarray(
        render_beauty(cam, scene, bvh, lights, (3, 3), 512, max_depth=1)
    )
    # First-bounce NEE at the origin: L = 50/9 (light 3 above), thr = 0.8,
    # eval = 0.8/pi * wo_local.z, color 0.8. The reference's frame-mixing
    # quirk (volpath:257-262: local wo dotted against the world normal,
    # here (0,1,0), i.e. the disk's y coordinate) zeroes half the samples,
    # so E[eval] = 0.8/pi * E[wo.z * 1{disk_y>0}] = 0.8/pi * 1/3.
    expect = (50.0 / 9.0) * 0.8 * (0.8 / np.pi) * (1.0 / 3.0) * 0.8
    center = img[1, 1].mean()
    np.testing.assert_allclose(center, expect, rtol=0.08)


def test_dense_medium_darkens_background():
    """A dense absorbing box must darken the pixels behind it."""
    tris, mats, _ = make_test_scene(with_medium=True)
    dense = MediaTable(
        mat_id=np.array([1], np.int32),
        sigma_s=np.array([[0.01, 0.01, 0.01]], np.float32),
        sigma_a=np.array([[5.0, 5.0, 5.0]], np.float32),
        g=np.zeros((1, 3), np.float32),
        ior=np.array([1.0], np.float32),  # no refraction bending
    )
    scene_d, bvh = assemble(tris, mats, dense, scale=1.0)
    clear = MediaTable(
        mat_id=np.array([1], np.int32),
        sigma_s=np.array([[1e-6, 1e-6, 1e-6]], np.float32),
        sigma_a=np.array([[1e-6, 1e-6, 1e-6]], np.float32),
        g=np.zeros((1, 3), np.float32),
        ior=np.array([1.0], np.float32),
    )
    scene_c, _ = assemble(tris, mats, clear, scale=1.0)
    img_d = np.asarray(render_beauty(fixture_camera(), scene_d, bvh, fixture_lights(), (24, 24), 16))
    img_c = np.asarray(render_beauty(fixture_camera(), scene_c, bvh, fixture_lights(), (24, 24), 16))
    # Center rows pass through the box.
    assert img_d[10:14, 10:14].mean() < 0.5 * img_c[10:14, 10:14].mean()


def test_max_depth_one_kills_gi():
    tris, mats, media = make_test_scene(with_medium=False)
    scene, bvh = assemble(tris, mats, media)
    shallow = np.asarray(
        render_beauty(fixture_camera(), scene, bvh, fixture_lights(), (16, 16), 8, max_depth=2)
    )
    deep = np.asarray(
        render_beauty(fixture_camera(), scene, bvh, fixture_lights(), (16, 16), 8, max_depth=32)
    )
    assert np.all(np.isfinite(shallow)) and np.all(np.isfinite(deep))
    assert deep.mean() >= shallow.mean() - 1e-6


def test_boundary_event_directions_and_tir():
    from complex_materials_renderer_tpu.render.integrator import _boundary_event
    from complex_materials_renderer_tpu.ops.fresnel import reflect, refract

    n = jnp.array([[0.0, 1.0, 0.0]] * 3)
    theta = np.deg2rad(30.0)
    entering = [np.sin(theta), -np.cos(theta), 0.0]  # air -> medium
    exiting_ok = [np.sin(theta), np.cos(theta), 0.0]  # medium -> air, < critical
    theta_tir = np.deg2rad(75.0)  # > critical angle for ior 1.5 (~41.8 deg)
    exiting_tir = [np.sin(theta_tir), np.cos(theta_tir), 0.0]
    d = jnp.array([entering, exiting_ok, exiting_tir], jnp.float32)
    ior = jnp.full(3, 1.5, jnp.float32)

    refl, trans_dir, r, tir = _boundary_event(d, n, ior)
    refl = np.asarray(refl)
    trans_dir = np.asarray(trans_dir)
    r = np.asarray(r)
    np.testing.assert_array_equal(np.asarray(tir), [False, False, True])

    # Reflection is the mirror direction.
    expect_refl = np.array(reflect(d, n))
    expect_refl /= np.linalg.norm(expect_refl, axis=-1, keepdims=True)
    np.testing.assert_allclose(refl, expect_refl, atol=1e-6)

    # Entering: refraction bends toward the normal (air -> denser).
    np.testing.assert_allclose(
        abs(trans_dir[0, 0]), np.sin(theta) / 1.5, atol=1e-5
    )
    assert 0.0 <= r[0] <= 1.0 and r[0] < 0.5

    # Exiting below the critical angle: bends away from the normal.
    np.testing.assert_allclose(
        abs(trans_dir[1, 0]), np.sin(theta) * 1.5, atol=1e-5
    )

    # TIR: the "transmitted" direction is the reflection, staying inside
    # the medium, and R == 0 routes the lane down the refract branch
    # (volpath:658-667 semantics).
    np.testing.assert_allclose(trans_dir[2], refl[2], atol=1e-6)
    assert r[2] == 0.0


def test_direct_light_through_two_media():
    """Shadow ray crossing two separated medium boxes: the march's second
    iteration must apply the second box's transmittance and 0.9 factor
    (volpath:350-423 loops per boundary pair)."""
    box_a = box_triangles([0.0, 0.0, 0.0], 1.0)
    box_b = box_triangles([0.0, 0.0, 4.0], 1.0)
    tris = np.concatenate([box_a, box_b])
    mats = np.concatenate(
        [np.zeros(len(box_a), np.int32), np.ones(len(box_b), np.int32)]
    )
    media = MediaTable(
        mat_id=np.array([0, 1], np.int32),
        sigma_s=np.array([[0.1, 0.1, 0.1], [0.2, 0.2, 0.2]], np.float32),
        sigma_a=np.array([[0.05, 0.05, 0.05], [0.1, 0.1, 0.1]], np.float32),
        g=np.zeros((2, 3), np.float32),
        ior=np.ones(2, np.float32),
    )
    scene, bvh = assemble(tris, mats, media, scale=1.0)
    lights = Lights(
        position=jnp.array([0.0, 0.0, 10.0]),
        intensity=jnp.array([100.0, 100.0, 100.0]),
    )
    pos = jnp.array([[0.0, 0.0, -5.0]])  # 15 from light; boxes at z[-1,1], z[3,5]
    val = np.asarray(
        sample_direct_light(pos, scene, bvh, lights, jnp.array([True]), 4)
    )[0]
    # Two pairs: 0.9^2 and Beer-Lambert through 2 units of each medium.
    expect = (
        100.0 / 15.0**2
        * 0.9 * np.exp(-0.15 * 2.0)
        * 0.9 * np.exp(-0.3 * 2.0)
    )
    np.testing.assert_allclose(val, expect, rtol=1e-3)
    # With the bound at 1 pair the march is still unresolved (the second
    # box was never reached): truncation fails DARK — the reference's
    # unbounded loop could still find more attenuation or an occluder, so
    # keeping partial transmittance would overestimate direct light.
    val1 = np.asarray(
        sample_direct_light(pos, scene, bvh, lights, jnp.array([True]), 1)
    )[0]
    np.testing.assert_array_equal(val1, 0.0)


def test_tir_kill_mode_darker_than_reflect():
    """tir='kill' reproduces the reference's terminate-on-TIR behavior
    (volpath:642 normalize(vec3(0)) -> NaN direction -> path dies on the
    next miss), so a high-ior gem-like medium renders darker than the
    default continue-with-reflection mode."""
    tris, mats, media = make_test_scene()
    media = media._replace(ior=np.full_like(np.asarray(media.ior), 1.77))
    scene, bvh = assemble(tris, mats, media)
    img_reflect = np.asarray(
        render_beauty(fixture_camera(), scene, bvh, fixture_lights(), (24, 24), 8)
    )
    img_kill = np.asarray(
        render_beauty(
            fixture_camera(), scene, bvh, fixture_lights(), (24, 24), 8, tir="kill"
        )
    )
    assert np.all(np.isfinite(img_kill))
    assert img_kill.mean() < img_reflect.mean()  # TIR paths terminated
    assert img_kill.mean() > 0.0  # but not black: non-TIR light survives

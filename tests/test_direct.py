"""Analytic media direct-light estimator (--direct analytic).

The reference evaluates NEE from the BOUNDARY hit point (volpath:697),
so the sampled free-flight depth enters the direct term only through
``sigma_s * T(t) / p_success(t)`` — whose expectation over the
min-channel exponential draw has a closed form
(ops/medium.analytic_direct_scale). Replacing the stochastic factor
with that expectation and crediting every transmitted segment estimates
the identical image with less variance and NO change to the RNG stream.

These tests pin (1) the closed form against brute-force quadrature of
the reference estimator, (2) estimator agreement in the mean at render
level, (3) the variance win, and (4) mega/wavefront engine equivalence
under the flag.
"""

import numpy as np
import pytest

from complex_materials_renderer_tpu.ops.medium import (
    analytic_direct_scale,
    sample_distance,
)
from complex_materials_renderer_tpu.render.integrator import render_beauty

from helpers import assemble, fixture_camera, fixture_lights, make_test_scene


@pytest.mark.parametrize(
    "ss,sa,dist",
    [
        ((0.8, 0.5, 0.3), (0.1, 0.2, 0.3), 1.7),      # colored, moderate
        ((0.08, 0.08, 0.08), (0.02, 0.03, 0.04), 6.0),  # thin (test-scene)
        ((4.0, 5.0, 6.0), (0.5, 0.5, 0.5), 50.0),       # dense, clamp region
        ((0.9, 0.9, 0.9), (0.0, 0.0, 0.0), 0.4),        # pure scatter, short
        ((0.0, 0.5, 0.5), (0.0, 0.1, 0.1), 3.0),        # zero min channel
        ((0.0, 0.0, 0.0), (0.0, 0.0, 0.0), 3.0),        # vacuum
    ],
)
def test_analytic_scale_matches_reference_estimator(ss, sa, dist):
    """E_rand[sigma_s*T(t)/p_success(t) * 1{scatter}] == analytic scale.

    Midpoint quadrature over the unit uniform reproduces the reference
    estimator's expectation including the <1e-4 transmittance clamp and
    the min-channel/weight quirks (volpath:482-543)."""
    n = 200_001
    rand = (np.arange(n, dtype=np.float64) + 0.5) / n
    ss_l = np.tile(np.asarray(ss, np.float32), (n, 1))
    sa_l = np.tile(np.asarray(sa, np.float32), (n, 1))
    ms = sample_distance(
        rand.astype(np.float32), ss_l, sa_l, np.float32(dist)
    )
    safe_ps = np.where(np.asarray(ms.prob_success) > 0.0,
                       np.asarray(ms.prob_success), 1.0)
    factor = np.where(
        np.asarray(ms.success)[:, None]
        & (np.asarray(ms.prob_success) > 0.0)[:, None],
        ss_l * np.asarray(ms.transmittance) / safe_ps[:, None],
        0.0,
    )
    mc = factor.mean(axis=0)
    gate, scale = analytic_direct_scale(
        np.asarray(ss, np.float32)[None],
        np.asarray(sa, np.float32)[None],
        np.float32(dist),
    )
    got = np.asarray(scale)[0]
    if not np.asarray(gate)[0]:
        np.testing.assert_allclose(mc, 0.0, atol=1e-6)
        np.testing.assert_allclose(got, 0.0)
    else:
        np.testing.assert_allclose(got, mc, rtol=2e-3, atol=1e-5)


def _renders(spp, direct, seed_mode="counter", res=(16, 16)):
    tris, mats, media = make_test_scene()
    scene, bvh = assemble(tris, mats, media)
    img = render_beauty(
        fixture_camera(), scene, bvh, fixture_lights(), res, spp,
        max_depth=6, rr_depth=4, nee_max_media=2, rng_mode=seed_mode,
        direct=direct,
    )
    return np.asarray(img)


@pytest.mark.slow
def test_analytic_direct_same_mean_less_noise():
    """Same converged image, lower per-pixel error at equal spp.

    The reference image is a 1024-spp scatter-estimator render; both
    low-spp estimators must converge toward it, and the analytic one
    must land closer (the scatter-or-not Bernoulli and the t-jitter are
    removed from the direct term)."""
    ref = _renders(1024, "scatter")
    a = _renders(24, "analytic")
    b = _renders(24, "scatter")
    assert np.all(np.isfinite(a))
    rmse_a = float(np.sqrt(((a - ref) ** 2).mean()))
    rmse_b = float(np.sqrt(((b - ref) ** 2).mean()))
    # Mean agreement: the two estimators share the estimand.
    assert abs(a.mean() - ref.mean()) < 3.5 * abs(b.mean() - ref.mean()) + 1e-3
    assert rmse_a < rmse_b, (rmse_a, rmse_b)


@pytest.mark.slow
def test_mega_analytic_matches_wavefront_analytic():
    """Interpreter-mode megakernel vs the XLA wavefront engine with the
    analytic direct term: identical RNG streams and estimator."""
    from complex_materials_renderer_tpu.accel.clusters import build_clusters
    from complex_materials_renderer_tpu.kernels.pallas_trace import (
        device_cluster_grid,
    )
    from complex_materials_renderer_tpu.render.hitinfo import make_scene_arrays
    from complex_materials_renderer_tpu.render.megarender import (
        render_beauty_mega,
    )

    tris, mats, media = make_test_scene()
    scene = make_scene_arrays(tris, mats, media, 1.0, 1)
    grid = device_cluster_grid(build_clusters(tris, mats, cluster_size=8))
    kw = dict(max_depth=4, rr_depth=2, nee_max_media=1, direct="analytic")
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
    # And the flag changes the image vs the scatter estimator (same
    # stream, different direct accumulation).
    img_s = np.asarray(
        render_beauty(
            fixture_camera(), scene, grid, fixture_lights(), (8, 8), 1,
            max_depth=4, rr_depth=2, nee_max_media=1, direct="scatter",
        )
    )
    assert np.abs(img_w - img_s).max() > 0.0


@pytest.mark.slow
@pytest.mark.parametrize("engine", ["binned", "pair"])
def test_alt_engines_analytic_match_wavefront(engine):
    """binned/pair trace engines under --direct analytic: the candidate-
    bounded distance traces must raise their walk bound to the
    transmittance-clamp depth, or the analytic in-scatter integral reads
    a truncated segment length on scatter lanes."""
    from complex_materials_renderer_tpu.accel.clusters import build_clusters
    from complex_materials_renderer_tpu.kernels.pallas_trace import (
        device_cluster_grid,
    )
    from complex_materials_renderer_tpu.render.hitinfo import make_scene_arrays
    from complex_materials_renderer_tpu.render.megarender import (
        render_beauty_mega,
    )

    tris, mats, media = make_test_scene()
    scene = make_scene_arrays(tris, mats, media, 1.0, 1)
    grid = device_cluster_grid(build_clusters(tris, mats, cluster_size=8))
    kw = dict(max_depth=4, rr_depth=2, nee_max_media=1, direct="analytic")
    img_e = np.asarray(
        render_beauty_mega(
            fixture_camera(), scene, grid, fixture_lights(), (8, 8), 1,
            trace_engine=engine, **kw
        )
    )
    img_w = np.asarray(
        render_beauty(
            fixture_camera(), scene, grid, fixture_lights(), (8, 8), 1, **kw
        )
    )
    assert np.all(np.isfinite(img_e))
    np.testing.assert_allclose(img_e, img_w, atol=1e-5)

"""Parity gate: the production engines vs the independent GLSL oracle.

tests/oracle_volpath.py is a fresh scalar transcription of
volpath.comp.glsl that shares NO code with the `ops/` physics modules.
Agreement here is the only in-environment evidence that the engines read
the GLSL spec correctly — the golden corpus freezes this renderer's own
output and the engine-equivalence tests share `ops/`, so a common-mode
misreading is invisible to both (round-2 VERDICT, "What's missing" #4).

Gate: RMSE <= 1e-3 (the BASELINE.json oracle threshold) on a 32x32@4
frame under parity RNG with tir='kill' (the reference's IEEE behavior —
a TIR'd transmission NaN-poisons the ray and the path dies). Any pixel
differing by > 1e-2 fails loudly for investigation.
"""

import numpy as np
import pytest

from helpers import fixture_camera, fixture_lights, make_test_scene, assemble
from oracle_volpath import render_oracle

CAMERA_POS = (0.0, 1.5, 5.0)  # == fixture_camera()
LOOK_AT = (0.0, 1.0, 0.0)
FOV = 36.0


def _oracle_image(tris, mats, media, res, spp, background=1, scale=1.0):
    media_rows = [
        (
            int(media.mat_id[i]),
            np.asarray(media.sigma_s[i]),
            np.asarray(media.sigma_a[i]),
            np.asarray(media.g[i]),
            float(media.ior[i]),
        )
        for i in range(len(media.mat_id))
    ]
    lights = fixture_lights()
    return render_oracle(
        tris, mats, media_rows, scale, background,
        CAMERA_POS, LOOK_AT, FOV,
        np.asarray(lights.position), np.asarray(lights.intensity),
        res, res, spp,
    )


@pytest.mark.slow
def test_wavefront_matches_glsl_oracle():
    """32x32@4, parity RNG, tir='kill': wavefront engine == independent
    GLSL transcription to RMSE <= 1e-3, no pixel off by > 1e-2."""
    from complex_materials_renderer_tpu.render.integrator import render_beauty

    tris, mats, media = make_test_scene()
    scene, bvh = assemble(tris, mats, media, background=1, scale=1.0)
    img_engine = np.asarray(
        render_beauty(
            fixture_camera(), scene, bvh, fixture_lights(), (32, 32), 4,
            rng_mode="parity", tir="kill",
        )
    )
    img_oracle = _oracle_image(tris, mats, media, 32, 4)

    assert np.all(np.isfinite(img_engine))
    assert np.all(np.isfinite(img_oracle))
    diff = img_engine.astype(np.float64) - img_oracle
    rmse = float(np.sqrt(np.mean(diff**2)))
    worst = float(np.max(np.abs(diff)))
    assert rmse <= 1e-3, f"RMSE {rmse} vs GLSL oracle exceeds 1e-3"
    assert worst <= 1e-2, (
        f"pixel diff {worst} vs GLSL oracle exceeds 1e-2 — investigate "
        "(argmax pixel "
        f"{np.unravel_index(np.argmax(np.abs(diff).max(-1)), (32, 32))})"
    )


@pytest.mark.slow
def test_oracle_surface_only_scene():
    """Surface-only path (no media): diffuse + NEE + RR transcription
    agrees without the volumetric terms in play."""
    from complex_materials_renderer_tpu.render.integrator import render_beauty

    tris, mats, media = make_test_scene(with_medium=False)
    scene, bvh = assemble(tris, mats, media, background=1, scale=1.0)
    img_engine = np.asarray(
        render_beauty(
            fixture_camera(), scene, bvh, fixture_lights(), (16, 16), 4,
            rng_mode="parity", tir="kill",
        )
    )
    img_oracle = _oracle_image(tris, mats, media, 16, 4)
    diff = img_engine.astype(np.float64) - img_oracle
    rmse = float(np.sqrt(np.mean(diff**2)))
    assert rmse <= 1e-3, f"surface-only RMSE {rmse} exceeds 1e-3"

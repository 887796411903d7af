"""Renderer-level tests: backend agreement and chunked-pass equivalence."""

import dataclasses
import os

import numpy as np
import pytest

import complex_materials_renderer_tpu.renderer as renderer_mod
from complex_materials_renderer_tpu.config import RenderOptions
from complex_materials_renderer_tpu.renderer import Renderer
from complex_materials_renderer_tpu.scene import load_scene

SHOWCASE = os.path.join(os.path.dirname(__file__), "..", "scenes", "showcase.obj")


def _options(**kw):
    opt = RenderOptions(
        obj_path=SHOWCASE,
        width=24,
        height=20,
        num_samples=2,
        shard="none",
        cluster_size=8,  # narrow unroll: fast under the Pallas interpreter
        **kw,
    )
    return opt


@pytest.fixture(scope="module")
def showcase_scene():
    if not os.path.exists(SHOWCASE):
        pytest.skip("showcase scene not generated")
    return load_scene(SHOWCASE, _options())


def test_backends_agree_exactly(showcase_scene):
    """The Pallas cluster tracer and the XLA threaded BVH must produce the
    same image (same seeds, same physics — only the traversal differs).

    Quad merging OFF for the exact gate: a merged pair re-bases the
    second triangle's Moller-Trumbore arithmetic, so hit distances move
    by float rounding (measured max 2e-5 at 3/1440 pixels on showcase).
    The default (quads on) is gated separately below at that tolerance."""
    opt_c = dataclasses.replace(
        showcase_scene.options, backend="cluster", quads="off"
    )
    opt_b = dataclasses.replace(showcase_scene.options, backend="bvh")
    img_c = Renderer(showcase_scene, opt_c).render()
    img_b = Renderer(showcase_scene, opt_b).render()
    assert img_c.shape == img_b.shape == (20, 24, 3)
    np.testing.assert_allclose(img_c, img_b, atol=1e-5)
    assert img_c.mean() > 0.0

    # Default cluster build (quad slots): same estimator to rounding.
    opt_q = dataclasses.replace(showcase_scene.options, backend="cluster")
    img_q = Renderer(showcase_scene, opt_q).render()
    np.testing.assert_allclose(img_q, img_b, atol=1e-4)


def test_chunked_passes_match_monolithic(showcase_scene, monkeypatch):
    """Row/sample chunking with carried RNG state must reproduce the
    monolithic render bit-for-bit (parity mode carries the per-pixel PCG
    stream across chunks)."""
    opt = dataclasses.replace(showcase_scene.options, backend="bvh", num_samples=4)
    mono = Renderer(showcase_scene, opt).render()
    # Force tiny device passes: 5-row tiles, 1 sample each.
    monkeypatch.setattr(renderer_mod, "LANES_PER_PASS", 24 * 5)
    monkeypatch.setattr(renderer_mod, "PATHS_PER_PASS", 24 * 5)
    chunked = Renderer(showcase_scene, opt).render()
    np.testing.assert_allclose(chunked, mono, rtol=1e-6, atol=1e-7)


def test_aov_render_via_renderer(showcase_scene):
    opt = dataclasses.replace(showcase_scene.options, aov="depth")
    img = Renderer(showcase_scene, opt).render()
    assert img.shape == (20, 24, 3)
    assert img.min() < 1000.0  # something visible


def test_checkpoint_resume(showcase_scene, tmp_path, monkeypatch):
    """Interrupted chunked render resumes from the accumulate-buffer
    checkpoint with identical results."""
    opt = dataclasses.replace(showcase_scene.options, backend="bvh", num_samples=4)
    monkeypatch.setattr(renderer_mod, "LANES_PER_PASS", 24 * 10)
    monkeypatch.setattr(renderer_mod, "PATHS_PER_PASS", 24 * 10)
    full = Renderer(showcase_scene, opt).render()

    ckpt = str(tmp_path / "render.ckpt.npz")

    class Boom(RuntimeError):
        pass

    # Interrupt after a few passes by wrapping render_beauty.
    calls = {"n": 0}
    real = renderer_mod.render_beauty

    def exploding(*a, **kw):
        calls["n"] += 1
        if calls["n"] > 3:
            raise Boom()
        return real(*a, **kw)

    monkeypatch.setattr(renderer_mod, "render_beauty", exploding)
    with pytest.raises(Boom):
        Renderer(showcase_scene, opt).render(checkpoint_path=ckpt)
    assert os.path.exists(ckpt)

    monkeypatch.setattr(renderer_mod, "render_beauty", real)
    resumed = Renderer(showcase_scene, opt).render(checkpoint_path=ckpt)
    np.testing.assert_allclose(resumed, full, rtol=1e-6, atol=1e-7)
    assert not os.path.exists(ckpt)  # removed on completion


def test_checkpoint_rejects_mismatched_options(showcase_scene, tmp_path, monkeypatch):
    """A checkpoint written with different render settings (here -s) must
    refuse to resume: acc is stored pre-scaled by n/num_samples, so
    blending accumulations across settings silently corrupts the image."""
    opt = dataclasses.replace(showcase_scene.options, backend="bvh", num_samples=4)
    monkeypatch.setattr(renderer_mod, "LANES_PER_PASS", 24 * 10)
    monkeypatch.setattr(renderer_mod, "PATHS_PER_PASS", 24 * 10)
    ckpt = str(tmp_path / "render.ckpt.npz")

    class Boom(RuntimeError):
        pass

    calls = {"n": 0}
    real = renderer_mod.render_beauty

    def exploding(*a, **kw):
        calls["n"] += 1
        if calls["n"] > 2:
            raise Boom()
        return real(*a, **kw)

    monkeypatch.setattr(renderer_mod, "render_beauty", exploding)
    with pytest.raises(Boom):
        Renderer(showcase_scene, opt).render(checkpoint_path=ckpt)
    monkeypatch.setattr(renderer_mod, "render_beauty", real)

    opt2 = dataclasses.replace(opt, num_samples=8)
    with pytest.raises(ValueError, match="fingerprint"):
        Renderer(showcase_scene, opt2).render(checkpoint_path=ckpt)


def test_auto_cluster_width():
    """cluster_size 0 = auto: a scene that fits in ONE cluster shrinks
    the statically-unrolled width down the {16,32,64} ladder (the kernel
    pays the FULL width in triangle tests per visit, pad slots included
    — a 14-triangle scene at width 128 does ~9x the arithmetic it
    needs; host model tools/study_widthsf.py says 3-5x end-to-end on
    isobox), while anything larger keeps the measured default 128."""
    iso_path = os.path.join(os.path.dirname(SHOWCASE), "isobox.obj")
    if not os.path.exists(iso_path):
        pytest.skip("isobox scene not generated")
    opt = _options(backend="cluster")
    opt.cluster_size = 0
    opt.obj_path = iso_path
    iso = load_scene(iso_path, opt)
    r = Renderer(iso, iso.options)
    assert r._host_accel.mat_id.shape[1] == 16  # 14 tris -> width 16

    opt2 = _options(backend="cluster")
    opt2.cluster_size = 0
    sc = load_scene(SHOWCASE, opt2)
    assert Renderer(sc, sc.options)._host_accel.mat_id.shape[1] == 128

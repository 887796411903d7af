"""Quad-merged cluster slots (accel/clusters.pair_quads): build-time
pairing invariants + trace equivalence against the unpaired build.

A merged planar convex quad accepts EXACTLY the union of its two
triangles (same plane), so a quads=True grid must produce the same hits
as quads=False up to float rounding of the second triangle's
re-based Moller-Trumbore arithmetic."""

from __future__ import annotations

import numpy as np
import pytest

from complex_materials_renderer_tpu.accel.clusters import (
    build_clusters,
    pair_quads,
)
from complex_materials_renderer_tpu.kernels.pallas_trace import (
    device_cluster_grid,
    trace_shaded_clusters,
)

from helpers import box_triangles, quad


def _box_scene():
    floor = np.asarray(
        quad([-10, 0, 10], [10, 0, 10], [10, 0, -10], [-10, 0, -10]),
        np.float32,
    )
    box = box_triangles([0.0, 1.0, 0.0], 0.8)
    box2 = box_triangles([2.0, 0.5, -1.0], 0.4)
    # A few unpaired (lone) triangles as well.
    lone = np.asarray(
        [
            [[-3, 0.1, 0], [-2, 0.1, 0], [-2.5, 1.4, 0.3]],
            [[3, 0.1, 2], [4, 0.2, 2], [3.5, 1.2, 2.5]],
        ],
        np.float32,
    )
    tris = np.concatenate([floor, box, box2, lone])
    mats = np.concatenate(
        [
            np.zeros(2, np.int32),
            np.ones(len(box), np.int32),
            np.full(len(box2), 2, np.int32),
            np.full(2, 3, np.int32),
        ]
    )
    return tris, mats


def test_pair_quads_cube_pairs_fully():
    tris = box_triangles([0, 0, 0], 1.0)
    prims, ab, pmats, ptri, cents = pair_quads(
        tris, np.zeros(len(tris), np.int32)
    )
    assert prims.shape == (6, 4, 3)  # 12 tris -> 6 parallelogram quads
    np.testing.assert_allclose(ab, 1.0, atol=1e-5)  # parallelograms
    # Far corner closes the parallelogram: v3 == v0 + e1' + e2'.
    v0 = prims[:, 0]
    far = v0 + (prims[:, 1] - v0) + (prims[:, 2] - v0)
    np.testing.assert_allclose(prims[:, 3], far, atol=1e-5)


def test_pair_quads_skips_nonplanar_and_mixed_mats():
    tris = box_triangles([0, 0, 0], 1.0)
    # Bend one vertex of the +z face out of plane: that face cannot pair.
    bent = tris.copy()
    bent[0, 0, 2] += 0.2
    prims, ab, *_ = pair_quads(bent, np.zeros(len(tris), np.int32))
    n_quads = int((np.abs(ab[:, 0] - 0.5) > 1e-6).sum())
    assert n_quads == 5  # 5 faces pair; the bent one stays 2 triangles
    # Mixed materials across a shared edge: nothing pairs.
    mats = np.arange(len(tris), dtype=np.int32)
    prims2, ab2, *_ = pair_quads(tris, mats)
    assert prims2.shape[0] == len(tris)


def test_pair_quads_keeps_unpaired_triangles_exact():
    tris, mats = _box_scene()
    prims, ab, pmats, ptri, _ = pair_quads(tris, mats)
    tri_rows = np.abs(ab[:, 0] - 0.5) < 1e-6
    # Every unpaired primitive is byte-identical to its source triangle
    # (bit-identical MT arithmetic with the unpaired build).
    for k in np.nonzero(tri_rows)[0]:
        np.testing.assert_array_equal(prims[k, :3], tris[ptri[k]])


def _trace_both(tris, mats, o, d, width=16):
    hits = []
    for quads in (False, True):
        grid = build_clusters(tris, mats, cluster_size=width, quads=quads)
        dev = device_cluster_grid(grid)
        hits.append(trace_shaded_clusters(o, d, dev, 1e-4, 1e4))
    return hits


def test_trace_equivalence_quads_vs_tris():
    tris, mats = _box_scene()
    rng = np.random.default_rng(7)
    n = 512
    o = rng.uniform(-4, 4, (n, 3)).astype(np.float32)
    o[:, 1] = rng.uniform(0.05, 3.0, n).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    a, b = _trace_both(tris, mats, o, d)
    ha = np.asarray(a.hit)
    hb = np.asarray(b.hit)
    # Knife-edge exceptions (a ray hitting within eps of a shared
    # diagonal can resolve differently) are allowed but must be rare.
    agree = ha == hb
    assert agree.mean() > 0.99
    ta, tb = np.asarray(a.t)[agree & ha], np.asarray(b.t)[agree & ha]
    np.testing.assert_allclose(ta, tb, rtol=1e-4, atol=1e-5)
    ma, mb = np.asarray(a.mat_id)[agree], np.asarray(b.mat_id)[agree]
    np.testing.assert_array_equal(ma, mb)
    na = np.asarray(a.normal)[agree & ha]
    nb = np.asarray(b.normal)[agree & ha]
    dots = np.einsum("ij,ij->i", na, nb)
    assert dots.min() > 0.999
    pa = np.asarray(a.position)[agree & ha]
    pb = np.asarray(b.position)[agree & ha]
    np.testing.assert_allclose(pa, pb, rtol=1e-3, atol=1e-4)


def test_mega_render_equivalence_quads():
    """Full mega-engine image with quads on vs off: same estimator, so
    images agree except (rare) knife-edge decision flips."""
    import dataclasses

    from complex_materials_renderer_tpu.renderer import Renderer
    from complex_materials_renderer_tpu.scene import load_scene
    from complex_materials_renderer_tpu.config import RenderOptions

    opt = RenderOptions()
    opt.obj_path = "scenes/isobox.obj"
    opt.width = opt.height = 32
    opt.num_samples = 2
    opt.rng = "parity"
    opt.shard = "none"
    opt.backend = "cluster"
    opt.engine = "mega"
    scene = load_scene(opt.obj_path, opt)
    imgs = []
    for quads in ("off", "auto"):
        o = dataclasses.replace(scene.options, quads=quads)
        imgs.append(np.asarray(Renderer(scene, o).render()))
    diff = np.abs(imgs[0] - imgs[1]).max(-1)
    flips = (diff > 1e-3).sum()
    assert flips <= 2, f"{flips} flip pixels"
    ok = diff <= 1e-3
    np.testing.assert_allclose(imgs[0][ok], imgs[1][ok], atol=1e-3)

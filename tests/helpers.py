"""Shared test fixtures: tiny procedural scenes (a floor + a medium cube),
device-state assembly without going through files."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from complex_materials_renderer_tpu.accel import build_bvh
from complex_materials_renderer_tpu.kernels.traverse import device_bvh
from complex_materials_renderer_tpu.ops.camera import make_camera
from complex_materials_renderer_tpu.ops.medium import MediaTable
from complex_materials_renderer_tpu.render.hitinfo import make_scene_arrays
from complex_materials_renderer_tpu.render.integrator import Lights


def quad(p0, p1, p2, p3):
    """Two CCW triangles for the quad p0-p1-p2-p3."""
    return [[p0, p1, p2], [p0, p2, p3]]


def box_triangles(center, half):
    """12 triangles of an axis-aligned box with outward normals."""
    cx, cy, cz = center
    h = half
    x0, x1 = cx - h, cx + h
    y0, y1 = cy - h, cy + h
    z0, z1 = cz - h, cz + h
    tris = []
    tris += quad([x0, y0, z1], [x1, y0, z1], [x1, y1, z1], [x0, y1, z1])  # +z
    tris += quad([x1, y0, z0], [x0, y0, z0], [x0, y1, z0], [x1, y1, z0])  # -z
    tris += quad([x1, y0, z1], [x1, y0, z0], [x1, y1, z0], [x1, y1, z1])  # +x
    tris += quad([x0, y0, z0], [x0, y0, z1], [x0, y1, z1], [x0, y1, z0])  # -x
    tris += quad([x0, y1, z1], [x1, y1, z1], [x1, y1, z0], [x0, y1, z0])  # +y
    tris += quad([x0, y0, z0], [x1, y0, z0], [x1, y0, z1], [x0, y0, z1])  # -y
    return np.asarray(tris, np.float32)


def make_test_scene(with_medium=True):
    """Floor quad (mat 0, diffuse) + box (mat 1, medium if requested)."""
    floor = np.asarray(
        quad([-10, 0, 10], [10, 0, 10], [10, 0, -10], [-10, 0, -10]), np.float32
    )
    box = box_triangles([0.0, 1.0, 0.0], 0.8)
    tris = np.concatenate([floor, box])
    mat_ids = np.concatenate(
        [np.zeros(2, np.int32), np.ones(len(box), np.int32)]
    )
    if with_medium:
        media = MediaTable(
            mat_id=np.array([1], np.int32),
            sigma_s=np.array([[0.08, 0.08, 0.08]], np.float32),
            sigma_a=np.array([[0.02, 0.03, 0.04]], np.float32),
            g=np.array([[0.6, 0.6, 0.6]], np.float32),
            ior=np.array([1.33], np.float32),
        )
    else:
        media = MediaTable(
            mat_id=np.array([-2], np.int32),
            sigma_s=np.zeros((1, 3), np.float32),
            sigma_a=np.zeros((1, 3), np.float32),
            g=np.zeros((1, 3), np.float32),
            ior=np.ones((1,), np.float32),
        )
    return tris, mat_ids, media


def assemble(tris, mat_ids, media, background=1, scale=1.0, leaf_size=4):
    flat = build_bvh(tris, leaf_size=leaf_size)
    bvh = device_bvh(flat, tris, leaf_size=leaf_size)
    scene = make_scene_arrays(tris, mat_ids, media, scale, background)
    return scene, bvh


def fixture_camera():
    return make_camera((0.0, 1.5, 5.0), (0.0, 1.0, 0.0), 36.0)


def fixture_lights():
    return Lights(
        position=jnp.array([2.0, 4.0, 3.0], jnp.float32),
        intensity=jnp.array([0.8, 0.8, 0.6], jnp.float32) * 100.0,
    )


def tiny_scene_render(rng="counter", spp=32, res=24, sample_offset=0):
    """One small wavefront render of the shared test scene (numpy image)."""
    from complex_materials_renderer_tpu.render.integrator import render_beauty

    tris, mat_ids, media = make_test_scene()
    scene, bvh = assemble(tris, mat_ids, media)
    img = render_beauty(
        fixture_camera(), scene, bvh, fixture_lights(),
        (res, res), spp, max_depth=8, rr_depth=4,
        rng_mode=rng, sample_offset=sample_offset,
    )
    return np.asarray(img, np.float64)

"""Scene pipeline tests: OBJ/MTL parsing, media JSON, packed-buffer
contract against the reference's shipped fixtures (model.cpp:49)."""

import json
import os

import numpy as np
import pytest

from complex_materials_renderer_tpu.config import RenderOptions
from complex_materials_renderer_tpu.scene import (
    load_media_json,
    load_scene,
    pack_media_buffer,
)
from complex_materials_renderer_tpu.scene.obj import parse_mtl, parse_obj

from conftest import reference_scene


def _write(tmp_path, name, text):
    p = tmp_path / name
    p.write_text(text)
    return str(p)


def test_parse_simple_obj(tmp_path):
    _write(
        tmp_path,
        "box.mtl",
        "newmtl red\nKd 1 0 0\nnewmtl blue\nKd 0 0 1\n",
    )
    obj = _write(
        tmp_path,
        "box.obj",
        """mtllib box.mtl
v 0 0 0
v 1 0 0
v 1 1 0
v 0 1 0
usemtl blue
f 1 2 3 4
usemtl red
f 1/1/1 2/2/2 3/3/3
""",
    )
    mesh = parse_obj(obj)
    assert mesh.vertices.shape == (4, 3)
    # Quad fans into two triangles + one more face.
    assert mesh.indices.shape == (3, 3)
    np.testing.assert_array_equal(mesh.indices[0], [0, 1, 2])
    np.testing.assert_array_equal(mesh.indices[1], [0, 2, 3])
    np.testing.assert_array_equal(mesh.material_ids, [1, 1, 0])
    assert mesh.material_names == ["red", "blue"]


def test_parse_obj_negative_indices(tmp_path):
    obj = _write(
        tmp_path,
        "neg.obj",
        "v 0 0 0\nv 1 0 0\nv 0 1 0\nf -3 -2 -1\n",
    )
    mesh = parse_obj(obj)
    np.testing.assert_array_equal(mesh.indices[0], [0, 1, 2])


def test_media_json_scene_overrides(tmp_path):
    payload = {
        "scene": {
            "camera": [1, 2, 3],
            "cameraLookAt": [0, 0, 0],
            "fov": 45.0,
            "lightPos": [4, 5, 6],
            "lightColor": [1, 1, 1],
            "lightIntensity": 55.0,
            "scale": 100.0,
        },
        "2": {
            "sigma_s": [0.1, 0.2, 0.3],
            "sigma_a": [0.4, 0.5, 0.6],
            "g": [0.7, 0.8, 0.9],
            "ior": 1.5,
        },
    }
    p = _write(tmp_path, "s.json", json.dumps(payload))
    opts = RenderOptions()
    table, opts = load_media_json(p, opts)
    assert opts.camera_pos == (1.0, 2.0, 3.0)
    assert opts.scale == 100.0
    assert opts.light_intensity == 55.0
    np.testing.assert_array_equal(table.mat_id, [2])
    np.testing.assert_allclose(table.sigma_s[0], [0.1, 0.2, 0.3])
    np.testing.assert_allclose(table.ior, [1.5])


def test_packed_buffer_contract_gem_corner():
    path = reference_scene("gem_corner.json")
    packed = pack_media_buffer(path)
    # count includes the scene entry (model.cpp:50), then 11 floats/medium.
    assert packed[0] == 5.0
    assert packed.shape[0] == 1 + 4 * 11
    # First medium: matID 0, sigma_s from the fixture.
    np.testing.assert_allclose(packed[1:5], [0.0, 0.18, 0.07, 0.03], rtol=1e-6)
    # Last medium ior.
    np.testing.assert_allclose(packed[-1], 1.77, rtol=1e-6)


def test_load_reference_scene_gem_corner():
    path = reference_scene("gem_corner.obj")
    scene = load_scene(path)
    # gem_corner.obj has 694 tris + 893 quads; fan triangulation (the
    # tinyobjloader default the reference relies on) yields 694 + 2*893.
    assert scene.triangles.shape[0] == 694 + 2 * 893
    assert scene.mat_ids.shape[0] == scene.triangles.shape[0]
    # Scene block applied (gem_corner.json).
    assert scene.options.camera_pos == (0.2, 4.2, 6.5)
    assert scene.options.scale == 10.0
    # gem_corner.mtl defines 6 materials; the scene uses 5 of them and the
    # JSON media cover ids 0-3 (gem_corner.json).
    assert set(np.unique(scene.mat_ids)).issubset({-1, 0, 1, 2, 3, 4, 5})
    np.testing.assert_array_equal(np.sort(scene.media.mat_id), [0, 1, 2, 3])


def test_load_reference_scene_cup():
    path = reference_scene("cup.obj")
    scene = load_scene(path)
    # cup.obj is 20,624 quads -> 41,248 triangles after fan triangulation.
    assert scene.triangles.shape[0] == 41248
    np.testing.assert_array_equal(np.sort(scene.media.mat_id), [0, 2, 3])
    assert scene.options.scale == 10.0


def test_missing_json_degrades(tmp_path):
    obj = _write(tmp_path, "bare.obj", "v 0 0 0\nv 1 0 0\nv 0 1 0\nf 1 2 3\n")
    scene = load_scene(obj)
    assert scene.triangles.shape == (1, 3, 3)
    assert scene.media.mat_id.shape[0] == 1  # sentinel row matching nothing
    assert scene.media.mat_id[0] == -2

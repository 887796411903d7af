"""Native C++ runtime parity tests: the native OBJ parser, BVH builder and
HDR writer must agree with their pure-Python oracles."""

import numpy as np
import pytest

from complex_materials_renderer_tpu import native
from complex_materials_renderer_tpu.accel.bvh import _build_bvh_python
from complex_materials_renderer_tpu.io import read_hdr
from complex_materials_renderer_tpu.io.hdr import float_to_rgbe, rgbe_to_float
from complex_materials_renderer_tpu.scene.obj import _parse_obj_python

from conftest import reference_scene

pytestmark = pytest.mark.skipif(
    native.load() is None, reason="native library unavailable"
)


def test_parse_obj_matches_python(tmp_path):
    (tmp_path / "m.mtl").write_text("newmtl a\nKd 1 0 0\nnewmtl b\n")
    (tmp_path / "m.obj").write_text(
        """mtllib m.mtl
v 0 0 0
v 1 0 0
v 1 1 0
v 0 1 0
usemtl b
f 1 2 3 4
usemtl a
f 1/2/3 2//1 3
f -4 -3 -2
usemtl missing
f 1 2 4
"""
    )
    path = str(tmp_path / "m.obj")
    a = _parse_obj_python(path)
    b_verts, b_idx, b_mats, b_names = native.parse_obj(path)
    np.testing.assert_array_equal(a.vertices, b_verts)
    np.testing.assert_array_equal(a.indices, b_idx)
    np.testing.assert_array_equal(a.material_ids, b_mats)
    assert a.material_names == b_names


def test_parse_reference_scene_matches_python():
    path = reference_scene("gem_corner.obj")
    a = _parse_obj_python(path)
    b_verts, b_idx, b_mats, b_names = native.parse_obj(path)
    np.testing.assert_allclose(a.vertices, b_verts, rtol=1e-6)
    np.testing.assert_array_equal(a.indices, b_idx)
    np.testing.assert_array_equal(a.material_ids, b_mats)
    assert a.material_names == b_names


def _random_tris(n, seed=0):
    rng = np.random.default_rng(seed)
    base = rng.uniform(-2, 2, size=(n, 1, 3))
    return (base + rng.uniform(-0.4, 0.4, size=(n, 3, 3))).astype(np.float32)


@pytest.mark.parametrize("num_tris", [1, 9, 333])
def test_native_bvh_structure_and_traversal(num_tris):
    import jax.numpy as jnp

    from complex_materials_renderer_tpu.kernels import intersect
    from complex_materials_renderer_tpu.kernels.traverse import (
        device_bvh,
        trace_closest,
    )

    tris = _random_tris(num_tris, seed=num_tris)
    built = native.build_bvh(tris, 4)
    assert built is not None
    bmin, bmax, left, count, miss, order = built
    # Same structural invariants as the Python builder.
    assert sorted(order.tolist()) == list(range(num_tris))
    leaves = count > 0
    assert count[leaves].max() <= 4
    assert miss[0] == -1
    assert np.all(bmin <= bmax + 1e-6)

    from complex_materials_renderer_tpu.accel.bvh import FlatBVH

    flat = FlatBVH(bmin=bmin, bmax=bmax, left=left, count=count, miss=miss, tri_order=order)
    dbvh = device_bvh(flat, tris, leaf_size=4)

    rng = np.random.default_rng(7)
    o = jnp.asarray(rng.uniform(-4, 4, size=(128, 3)).astype(np.float32))
    d = rng.normal(size=(128, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    d = jnp.asarray(d)
    got = trace_closest(o, d, dbvh, 1e-4, 1e4)
    want = intersect.trace_naive(o, d, jnp.asarray(tris), 1e-4, 1e4)
    np.testing.assert_array_equal(np.asarray(got.prim), np.asarray(want.prim))
    np.testing.assert_allclose(np.asarray(got.t), np.asarray(want.t), rtol=1e-5)


def test_native_hdr_roundtrip(tmp_path):
    rng = np.random.default_rng(11)
    img = (rng.random((20, 64, 3)) * 4.0).astype(np.float32)
    img[:, 20:40] = 0.5  # runs for RLE
    path = str(tmp_path / "n.hdr")
    assert native.write_hdr(path, img)
    back = read_hdr(path)
    step = img.max(axis=-1, keepdims=True) / 128.0
    assert np.all(np.abs(back - img) <= 0.5 * step + 1e-6)


def test_native_hdr_matches_python_encoder(tmp_path):
    rng = np.random.default_rng(12)
    img = (rng.random((8, 32, 3)) * 7.0).astype(np.float32)
    p_native = str(tmp_path / "a.hdr")
    assert native.write_hdr(p_native, img)
    a = read_hdr(p_native)
    b = rgbe_to_float(float_to_rgbe(img))
    np.testing.assert_array_equal(a, b)


def test_parse_obj_trailing_whitespace_material_names(tmp_path):
    """usemtl/newmtl names with trailing spaces/tabs must resolve the same
    on the native fast path as in the Python fallback (tinyobjloader also
    trims): an untrimmed name silently mapped the face to mat id -1."""
    (tmp_path / "w.mtl").write_text("newmtl glass  \nKd 1 0 0\n")
    (tmp_path / "w.obj").write_text(
        "mtllib w.mtl \nv 0 0 0\nv 1 0 0\nv 1 1 0\nusemtl glass \t\nf 1 2 3\n"
    )
    path = str(tmp_path / "w.obj")
    a = _parse_obj_python(path)
    b_verts, b_idx, b_mats, b_names = native.parse_obj(path)
    np.testing.assert_array_equal(a.material_ids, b_mats)
    assert list(a.material_ids) == [0]
    assert a.material_names == b_names

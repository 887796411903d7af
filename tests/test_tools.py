"""mat_parser tool tests (reference C8 rebuild, non-interactive mode)."""

import json

from complex_materials_renderer_tpu.tools.mat_parser import (
    MATERIAL_DICTIONARY,
    main,
)


def _tiny_obj(tmp_path):
    (tmp_path / "t.mtl").write_text("newmtl a\nnewmtl b\n")
    (tmp_path / "t.obj").write_text(
        "mtllib t.mtl\nv 0 0 0\nv 1 0 0\nv 0 1 0\nusemtl b\nf 1 2 3\n"
    )
    return str(tmp_path / "t.obj")


def test_batch_mode_writes_consumable_json(tmp_path):
    obj = _tiny_obj(tmp_path)
    rc = main([obj, "--scene-defaults", "--material", "1=milk"])
    assert rc == 0
    doc = json.loads((tmp_path / "t.json").read_text())
    assert "scene" in doc
    assert doc["1"]["sigma_s"] == MATERIAL_DICTIONARY["milk"]["sigma_s"]
    assert doc["1"]["ior"] == 1.33

    # And the scene loader consumes it.
    from complex_materials_renderer_tpu.scene import load_scene

    scene = load_scene(obj)
    assert scene.media.mat_id.tolist() == [1]


def test_prefix_resolution(tmp_path):
    obj = _tiny_obj(tmp_path)
    rc = main([obj, "--material", "0=ruby"])
    assert rc == 0
    doc = json.loads((tmp_path / "t.json").read_text())
    assert doc["0"]["ior"] == 1.77


def test_list_materials(capsys):
    rc = main(["ignored.obj", "--list-materials"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "milk" in out and "sigma_s" in out


def test_compare_tool(tmp_path):
    import numpy as np

    from complex_materials_renderer_tpu.io import write_hdr
    from complex_materials_renderer_tpu.tools.compare import compare, main as cmp_main

    rng = np.random.default_rng(3)
    a = (rng.random((8, 16, 3)) * 2).astype(np.float32)
    b = a * 1.02  # beyond rgbe quantization
    pa, pb = str(tmp_path / "a.hdr"), str(tmp_path / "b.hdr")
    write_hdr(pa, a)
    write_hdr(pb, b)
    stats = compare(pa, pb)
    assert stats["rmse"] < 0.05  # ~2% scaled difference
    assert cmp_main([pa, pa, "--threshold", "1e-6"]) == 0
    assert cmp_main([pa, pb, "--threshold", "1e-9"]) == 1

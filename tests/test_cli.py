"""CLI + end-to-end pipeline tests (reference utils.cpp:36-89 semantics)."""

import json
import os

import numpy as np
import pytest

from complex_materials_renderer_tpu.config import RenderOptions, parse_argv
from complex_materials_renderer_tpu.io import read_hdr


def test_parse_reference_flags():
    opt = parse_argv(["-s", "64", "-b", "2", "-o", "name", "path/to/scene.obj"])
    assert opt.num_samples == 64
    assert opt.background == 2
    assert opt.out_name == "name"
    assert opt.obj_path == "path/to/scene.obj"


def test_background_clamp():
    # Out-of-range -> 0 (utils.cpp:80-84).
    assert parse_argv(["-b", "7"]).background == 0
    assert parse_argv(["-b", "-3"]).background == 0
    assert parse_argv(["-b", "2"]).background == 2


def test_bare_argument_is_scene_path():
    opt = parse_argv(["foo.obj", "-s", "2"])
    assert opt.obj_path == "foo.obj"
    assert opt.num_samples == 2


def test_help_exits():
    with pytest.raises(SystemExit):
        parse_argv(["--help"])


def test_extension_flags():
    opt = parse_argv(
        ["--width", "64", "--height", "48", "--aov", "depth", "--rng", "counter",
         "--max-depth", "8", "--backend", "naive", "--shard", "none"]
    )
    assert (opt.width, opt.height) == (64, 48)
    assert opt.aov == "depth"
    assert opt.rng == "counter"
    assert opt.max_depth == 8
    opt = parse_argv(["--cluster-size", "32", "--partition", "media"])
    assert opt.cluster_size == 32
    assert opt.partition == "media"
    assert parse_argv([]).direct == "scatter"
    assert parse_argv(["--direct", "analytic"]).direct == "analytic"
    with pytest.raises(ValueError):
        parse_argv(["--direct", "analytical"])


def test_partition_auto_resolution():
    """'auto' segregates opaque/media clusters exactly for >128-cluster
    media scenes (the regime where the chip A/Bs measured it a win:
    cup +4-6%, dragon +8%; small scenes lose 10-13%)."""
    from complex_materials_renderer_tpu.renderer import resolve_partition

    assert resolve_partition("media", 14, 128, False) is True
    assert resolve_partition("off", 10 ** 6, 128, True) is False
    # auto: needs BOTH media and a big grid
    assert resolve_partition("auto", 41248, 128, True) is True   # cup
    assert resolve_partition("auto", 1378, 128, True) is False   # showcase
    assert resolve_partition("auto", 41248, 128, False) is False
    # threshold sits at >128 unpartitioned clusters
    assert resolve_partition("auto", 128 * 128, 128, True) is False
    assert resolve_partition("auto", 128 * 128 + 1, 128, True) is True


def _write_tiny_scene(tmp_path):
    (tmp_path / "tiny.mtl").write_text("newmtl walls\nKd 0.8 0.8 0.8\nnewmtl goo\nKd 1 1 1\n")
    (tmp_path / "tiny.obj").write_text(
        """mtllib tiny.mtl
v -5 0 5
v 5 0 5
v 5 0 -5
v -5 0 -5
usemtl walls
f 1 2 3 4
v -0.5 0.2 0.5
v 0.5 0.2 0.5
v 0.0 1.2 0.0
usemtl goo
f 5 6 7
"""
    )
    (tmp_path / "tiny.json").write_text(
        json.dumps(
            {
                "scene": {
                    "camera": [0.0, 1.0, 4.0],
                    "cameraLookAt": [0.0, 0.5, 0.0],
                    "fov": 36.0,
                    "lightPos": [1.0, 3.0, 2.0],
                    "lightColor": [0.8, 0.8, 0.6],
                    "lightIntensity": 60.0,
                    "scale": 1.0,
                },
                "1": {
                    "sigma_s": [0.2, 0.2, 0.2],
                    "sigma_a": [0.05, 0.05, 0.05],
                    "g": [0.4, 0.4, 0.4],
                    "ior": 1.2,
                },
            }
        )
    )
    return str(tmp_path / "tiny.obj")


def test_cli_end_to_end_beauty(tmp_path, monkeypatch):
    from complex_materials_renderer_tpu.cli import main

    obj = _write_tiny_scene(tmp_path)
    out = str(tmp_path / "render")
    monkeypatch.chdir(tmp_path)
    rc = main([obj, "-s", "2", "--width", "24", "--height", "16", "-o", out, "--shard", "none"])
    assert rc == 0
    img = read_hdr(out + ".hdr")
    assert img.shape == (16, 24, 3)
    assert np.all(np.isfinite(img))


def test_cli_end_to_end_aov(tmp_path, monkeypatch):
    from complex_materials_renderer_tpu.cli import main

    obj = _write_tiny_scene(tmp_path)
    out = str(tmp_path / "depthmap")
    monkeypatch.chdir(tmp_path)
    rc = main([obj, "--aov", "depth", "--width", "16", "--height", "16", "-o", out])
    assert rc == 0
    img = read_hdr(out + ".hdr")
    assert img.shape == (16, 16, 3)
    # Scene json camera override applied: floor visible -> finite depths
    # below tMax/10 somewhere.
    assert img.min() < 1000.0


def test_showcase_scene_loads():
    path = os.path.join(os.path.dirname(__file__), "..", "scenes", "showcase.obj")
    if not os.path.exists(path):
        pytest.skip("showcase scene not generated")
    from complex_materials_renderer_tpu.scene import load_scene

    scene = load_scene(path)
    assert scene.triangles.shape[0] > 1000
    assert set(scene.media.mat_id.tolist()) == {1, 2, 3}
    assert scene.options.scale == 10.0

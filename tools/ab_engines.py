"""A/B the wavefront and mega engines on the real chip.

Usage: python tools/ab_engines.py [scene] [res] [spp]
Prints Mpaths/s for each engine on the same render config.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np


def main() -> None:
    scene_path = sys.argv[1] if len(sys.argv) > 1 else "scenes/showcase.obj"
    res = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    spp = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    cluster_size = int(sys.argv[4]) if len(sys.argv) > 4 else 128

    from complex_materials_renderer_tpu.config import RenderOptions
    from complex_materials_renderer_tpu.renderer import Renderer
    from complex_materials_renderer_tpu.scene import load_scene

    import jax

    engines = os.environ.get("CMR_AB_ENGINES", "wavefront,mega").split(",")
    results = {}
    imgs = {}
    for engine in engines:
        opt = RenderOptions()
        opt.obj_path = scene_path
        opt.width = opt.height = res
        opt.num_samples = spp
        opt.rng = "counter"
        opt.shard = "none"
        opt.engine = engine
        opt.cluster_size = cluster_size
        scene = load_scene(opt.obj_path, opt)
        r = Renderer(scene, scene.options)
        r.render()  # warm: compile the exact pass signatures
        t0 = time.perf_counter()
        img = r.render()
        dt = time.perf_counter() - t0
        paths = res * res * spp
        results[engine] = paths / dt / 1e6
        imgs[engine] = np.asarray(img)
        print(f"{engine}: {results[engine]:.3f} Mpaths/s  ({dt:.2f}s)", flush=True)

    if len(imgs) == 2:
        diff = np.abs(imgs["wavefront"] - imgs["mega"])
        print(
            f"image max|diff|={diff.max():.3e} mean={diff.mean():.3e} "
            f"(means {imgs['wavefront'].mean():.4f} vs {imgs['mega'].mean():.4f})"
        )


if __name__ == "__main__":
    main()

"""Benchmark: Mpaths/sec/chip on the showcase scene.

Renders the showcase scene and reports millions of camera paths (pixel
samples) traced per second on one chip, against the BASELINE.json
north-star target of 50 Mpaths/s/chip. Prints ONE JSON line.

A "path" is one camera sample: jittered primary ray plus its full bounce
history (up to max_depth segments, each with closest-hit + distance +
NEE traversals), matching the reference's per-thread workload
(volpath.comp.glsl:580-798).
"""

from __future__ import annotations

import json
import time

import numpy as np

TARGET_MPATHS = 50.0  # BASELINE.json north-star, v5e


def main() -> None:
    import jax

    from complex_materials_renderer_tpu.config import RenderOptions
    from complex_materials_renderer_tpu.renderer import Renderer
    from complex_materials_renderer_tpu.scene import load_scene

    opt = RenderOptions()
    opt.obj_path = "scenes/showcase.obj"
    opt.width, opt.height = 512, 512
    opt.num_samples = 16
    opt.rng = "counter"  # sample-parallel-safe mode is the perf path
    opt.shard = "none"  # single-chip number

    import dataclasses

    scene = load_scene(opt.obj_path, opt)
    renderer = Renderer(scene, scene.options)

    # Warmup/compile both pass signatures (fresh-seed and carried-RNG)
    # with the same auto pass shape the timed render uses.
    from complex_materials_renderer_tpu.renderer import _auto_sample_chunk

    auto_chunk = min(_auto_sample_chunk(opt.width, opt.height), opt.num_samples)
    warm_opt = dataclasses.replace(scene.options, num_samples=2 * auto_chunk)
    Renderer(scene, warm_opt).render()

    t0 = time.perf_counter()
    img = renderer.render()
    elapsed = time.perf_counter() - t0

    paths = opt.width * opt.height * opt.num_samples
    mpaths = paths / elapsed / 1e6
    assert np.all(np.isfinite(np.asarray(img)))

    print(
        json.dumps(
            {
                "metric": "Mpaths/sec/chip (showcase 512x512)",
                "value": round(mpaths, 3),
                "unit": "Mpaths/s",
                "vs_baseline": round(mpaths / TARGET_MPATHS, 4),
            }
        )
    )


if __name__ == "__main__":
    main()

"""Regenerate the shipped compile-cache seed (utils/cache.py SEED_DIR).

The reference launches with zero compilation — its megakernel ships as
precompiled SPIR-V (reference main.cpp:271-291). The TPU analogue is a
committed seed of JAX persistent-cache entries for the DEFAULT preview
configuration (BASELINE config 1: default scene, 128x128@8), produced on
the real chip and copied into the user's cache directory on first use
(utils/cache.seed_cache), so a fresh cache-less checkout launches its
first default render without paying the multi-minute Mosaic compile.

Entries are keyed by (HLO, jax/XLA version, platform); a seed built for
a different jax version or chip generation simply misses — harmless.

Run ON THE REAL CHIP:  python tools/make_cache_seed.py
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SEED_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "complex_materials_renderer_tpu",
    "cache_seed",
)


def main() -> None:
    work = tempfile.mkdtemp(prefix="cmr_seed_")
    os.environ["CMR_COMPILE_CACHE"] = work

    from complex_materials_renderer_tpu.utils.cache import (
        enable_persistent_cache,
    )

    enable_persistent_cache(work)

    import numpy as np

    from complex_materials_renderer_tpu.config import RenderOptions
    from complex_materials_renderer_tpu.io import write_hdr
    from complex_materials_renderer_tpu.renderer import Renderer
    from complex_materials_renderer_tpu.scene import load_scene

    t0 = time.perf_counter()
    opt = RenderOptions()
    opt.width = opt.height = 128
    opt.num_samples = 8
    scene = load_scene(opt.obj_path, opt)
    img = Renderer(scene, scene.options).render()
    write_hdr("/tmp/cmr_seed_preview.hdr", np.asarray(img))
    print(f"preview render (cold, fresh cache): {time.perf_counter() - t0:.1f} s")

    os.makedirs(SEED_DIR, exist_ok=True)
    # Replace the old seed wholesale: stale entries for a previous kernel
    # revision would never hit again and only bloat the repo.
    for name in os.listdir(SEED_DIR):
        if name.endswith("-cache"):
            os.unlink(os.path.join(SEED_DIR, name))
    total = 0
    names = [n for n in os.listdir(work) if n.endswith("-cache")]
    for name in names:
        src = os.path.join(work, name)
        shutil.copyfile(src, os.path.join(SEED_DIR, name))
        total += os.path.getsize(src)
    print(f"seeded {len(names)} entries, {total / 1e6:.2f} MB -> {SEED_DIR}")

    # Provenance manifest: utils/cache.seed_cache warns (and
    # tests/test_cache.py fails) when the installed jax no longer matches
    # — a version bump must not silently revert cold start to the full
    # Mosaic compile.
    import json

    import jax
    import jaxlib

    manifest = {
        "jax": jax.__version__,
        "jaxlib": jaxlib.__version__,
        "platform": jax.default_backend(),
        "device_kind": jax.devices()[0].device_kind,
        "config": "default preview (BASELINE config 1: 128x128 @ 8 spp)",
        "entries": sorted(names),
    }
    with open(os.path.join(SEED_DIR, "MANIFEST.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    print(f"manifest -> {os.path.join(SEED_DIR, 'MANIFEST.json')}")


if __name__ == "__main__":
    main()

"""Command-line entry point.

The TPU-native equivalent of the reference's main() lifecycle
(main.cpp:61-411): parse args -> load scene -> build acceleration
structure -> render -> write <out>.hdr -> report timings. Flags mirror the
reference CLI (utils.cpp:36-89) plus the rebuild's extensions (see
config.HELP_TEXT).
"""

from __future__ import annotations

import sys

from .config import RenderOptions, parse_argv
from .io import write_hdr
from .renderer import Renderer
from .scene import load_scene
from .utils.timing import PhaseTimer


def main(argv=None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    options = parse_argv(argv, RenderOptions())

    # Reference launches with zero compilation (precompiled SPIR-V,
    # main.cpp:271-291); the persistent cache is the jit-world analogue.
    from .utils.cache import enable_persistent_cache

    enable_persistent_cache()

    timer = PhaseTimer()
    with timer.phase("scene_load"):
        scene = load_scene(options.obj_path, options)
    # Scene JSON overrides camera/light/scale (model.cpp:54-79) but CLI-set
    # samples/background/out stay in force — same precedence as the
    # reference.
    renderer = Renderer(scene, scene.options)

    if scene.options.profile:
        # Kernel-level observability beyond the phase timers: a full
        # jax.profiler trace (view with tensorboard/xprof).
        import jax

        with jax.profiler.trace(scene.options.profile):
            image = renderer.render()
    else:
        image = renderer.render()

    with timer.phase("write"):
        out_path = f"{scene.options.out_name}.hdr"
        write_hdr(out_path, image)

    print(f"wrote {out_path} ({scene.options.width}x{scene.options.height}, "
          f"{scene.options.num_samples} spp, aov={scene.options.aov})")
    print(timer.report())
    print(renderer.timer.report())
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Multi-host (DCN) rendering: one process per host, tiles sharded over
the global device mesh.

The reference is strictly single-GPU (SURVEY §5: no distributed anything);
this is the TPU-native extension for pod-scale renders. Design follows the
single-slice layer (parallel/sharding.py): tracing is embarrassingly
parallel over (pixel, sample), so the ONLY cross-host traffic is the
final framebuffer combine — `psum` over the sample axis rides ICI within
a slice, and the host-side gather of row bands crosses DCN once per
render. Scene tables are replicated (a few MB at reference scene scale).

Usage (one process per host, all started with the same arguments):

    from complex_materials_renderer_tpu.parallel import multihost
    multihost.init_distributed(coordinator, num_processes, process_id)
    img = multihost.render_multihost(camera, scene, bvh, lights,
                                     (w, h), spp, rng_mode="counter")

`render_multihost` returns the full image on every process.
"""

from __future__ import annotations

import jax
import numpy as np

from .sharding import make_render_mesh, render_beauty_sharded


def init_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Initialize jax.distributed (no-op when already initialized or when
    running single-process with no coordinator).

    Must not touch the XLA backend before jax.distributed.initialize()
    (jax.process_count() / jax.devices() would initialize it and make
    initialize() raise), so the already-initialized check reads the
    distributed client state directly."""
    from jax._src import distributed as _dist

    if _dist.global_state.client is not None:
        return  # already initialized
    if coordinator_address is None and num_processes in (None, 1):
        return  # single host, nothing to do
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def make_global_render_mesh(sample_parallel: int = 1):
    """('sample', 'tile') mesh over every device in the job (all hosts).
    Lay the sample axis within hosts where possible so its psum rides ICI,
    and tile-DP (no mid-render communication) spans DCN."""
    return make_render_mesh(jax.devices(), sample_parallel=sample_parallel)


def render_multihost(
    camera,
    scene,
    bvh,
    lights,
    resolution,
    num_samples: int,
    sample_parallel: int = 1,
    **kw,
):
    """Render (H, W, 3) across every host; returns the full image
    (replicated on each process).

    Row bands are sharded over the global 'tile' axis; each process
    computes its addressable shards and the full image is assembled with
    one cross-host allgather at the end (the only DCN traffic).
    """
    width, height = resolution
    mesh = make_global_render_mesh(sample_parallel)
    img = render_beauty_sharded(
        camera, scene, bvh, lights, resolution, num_samples,
        mesh=mesh, **kw,
    )
    if jax.process_count() == 1:
        return np.asarray(img)
    # Each process holds its tile rows; assemble the global image.
    from jax.experimental import multihost_utils

    out = np.asarray(multihost_utils.process_allgather(img, tiled=True))
    # Fail loudly if allgather semantics for non-fully-addressable inputs
    # change across JAX versions (a host-local interpretation would
    # concatenate per-process rows into (P*H, W, 3) instead).
    if out.shape != (height, width, 3):
        raise RuntimeError(
            "process_allgather returned shape "
            f"{out.shape}, expected {(height, width, 3)}; "
            "multi-host assembly semantics mismatch"
        )
    return out

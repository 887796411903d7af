"""Tile/sample sharding of the beauty pass via shard_map.

Design (replaces the reference's single 1920x1080 dispatch grid,
main.cpp:330-331, with a mesh decomposition):

- mesh axes ('sample', 'tile'). The framebuffer's rows are sharded over
  'tile'; every device traces only its rows — there is NO communication
  during path tracing (the workload is embarrassingly parallel over
  (pixel, sample), SURVEY §2).
- the sample budget is split over 'sample'; partial framebuffers are
  combined with one psum over ICI at the end. Sample-splitting requires
  the order-independent counter RNG; with the parity RNG the sample axis
  must be 1 (the reference's sequential per-pixel stream can't be split).
- scene tables (BVH, triangles, media) are replicated — they are a few MB
  at the reference's scene scale, which is the right trade on v5e: zero
  gather traffic beats sharded geometry.

Determinism: seeds derive from the *global* (pixel, sample) id, so the
sharded render is bit-identical to the single-device render of the same
mode — tested in tests/test_sharding.py.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..kernels.traverse import DeviceBVH
from ..ops.camera import Camera
from ..render.hitinfo import SceneArrays
from ..render.integrator import Lights, render_beauty


def make_render_mesh(devices=None, sample_parallel: int = 1) -> Mesh:
    """Build a ('sample', 'tile') mesh over the available devices."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    sample_parallel = max(1, sample_parallel)
    if n % sample_parallel:
        raise ValueError(f"{n} devices not divisible by sample axis {sample_parallel}")
    arr = np.asarray(devices).reshape(sample_parallel, n // sample_parallel)
    return Mesh(arr, axis_names=("sample", "tile"))


def render_beauty_sharded(
    camera: Camera,
    scene: SceneArrays,
    bvh: DeviceBVH,
    lights: Lights,
    resolution,
    num_samples: int,
    max_depth: int = 32,
    rr_depth: int = 16,
    nee_max_media: int = 4,
    rng_mode: str = "parity",
    mesh: Mesh | None = None,
    row_offset: int = 0,
    full_resolution=None,
    sample_offset: int = 0,
    engine: str = "wavefront",
    direct: str = "scatter",
):
    """Render (H, W, 3), rows sharded over 'tile', samples over 'sample'.

    ``row_offset``/``full_resolution``/``sample_offset`` place this call as
    a band/chunk of a larger render (the host loops bands x sample chunks
    so no single dispatch runs unboundedly long — same chunking contract
    as the single-device path).

    ``engine='mega'`` runs the fused megakernel per shard and
    ``engine='binned'`` the binned per-lane tracer (both require the
    cluster backend); tracing stays communication-free either way — the
    engines differ only inside each device's shard.
    """
    width, height = resolution
    full_resolution = full_resolution if full_resolution else (width, height)
    if mesh is None:
        mesh = make_render_mesh()
    n_tile = mesh.shape["tile"]
    n_sample = mesh.shape["sample"]
    if n_sample > 1 and rng_mode not in ("counter", "ld"):
        raise ValueError(
            "sample-parallel rendering requires an order-independent "
            "rng mode ('counter' or 'ld')"
        )
    if num_samples % n_sample:
        raise ValueError(f"{num_samples} samples not divisible by sample axis {n_sample}")

    rows_per_tile = math.ceil(height / n_tile)
    padded_h = rows_per_tile * n_tile
    samples_per_dev = num_samples // n_sample

    # Row starts per tile shard, sharded over 'tile' so each device reads
    # its own offset; sample offsets likewise over 'sample'.
    row_starts = jnp.arange(n_tile, dtype=jnp.int32) * rows_per_tile
    sample_starts = jnp.arange(n_sample, dtype=jnp.uint32) * jnp.uint32(samples_per_dev)

    if engine in ("mega", "binned"):
        from functools import partial as _partial

        from ..render.megarender import render_beauty_mega

        # 'binned' rides the megarender driver with its per-pass kernel
        # swapped (render/binnedrender.py); shard-local either way.
        _beauty = (
            _partial(render_beauty_mega, trace_engine="binned")
            if engine == "binned"
            else render_beauty_mega
        )
    else:
        _beauty = render_beauty

    def shard_fn(row_start, sample_start, scene_, bvh_, camera_, lights_):
        img = _beauty(
            camera_,
            scene_,
            bvh_,
            lights_,
            (width, rows_per_tile),
            samples_per_dev,
            max_depth=max_depth,
            rr_depth=rr_depth,
            nee_max_media=nee_max_media,
            rng_mode=rng_mode,
            row_offset=row_start[0] + row_offset,
            full_resolution=full_resolution,
            sample_offset=sample_start[0] + jnp.uint32(sample_offset),
            direct=direct,
        )
        # Average partial framebuffers over the sample axis.
        img = jax.lax.pmean(img, axis_name="sample")
        return img[None]  # leading 'sample'-collapsed axis for the out spec

    fn = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P("tile"), P("sample"), P(), P(), P(), P()),
        out_specs=P("sample", "tile"),
        check_vma=False,
    )
    out = fn(row_starts, sample_starts, scene, bvh, camera, lights)
    # out: (n_sample [all equal], padded_h, W, 3) -> take shard 0, crop pad.
    return out[0, :height]

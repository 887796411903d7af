"""High-level renderer: scene -> device state -> image.

The TPU-native equivalent of the reference's host runtime (main.cpp:61-411):
where the reference builds Vulkan buffers, descriptor sets and one compute
dispatch, this assembles device arrays, builds the BVH, and invokes the
jitted AOV/beauty passes — optionally tile-sharded over a device mesh
(parallel/sharding.py) and chunked over samples (which also removes the
reference's watchdog-timeout failure mode, README.md:9-10, by bounding each
device pass).
"""

from __future__ import annotations

import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .accel import build_bvh
from .config import RenderOptions
from .kernels.traverse import DeviceBVH, device_bvh
from .ops.camera import Camera, make_camera
from .ops.medium import MediaTable
from .render.aov import render_aov
from .render.hitinfo import SceneArrays
from .render.integrator import Lights, render_beauty
from .scene import Scene
from .utils.timing import PhaseTimer


# Paths traced per device pass. Bounds single-dispatch runtime (the TPU
# runtime, like the Windows GPU watchdog the reference warns about, kills
# very long dispatches) while keeping lanes wide enough to fill the VPU.
PATHS_PER_PASS = int(os.environ.get("CMR_PATHS_PER_PASS", 1 << 21))


def _auto_sample_chunk(width: int, height: int) -> int:
    return max(1, PATHS_PER_PASS // (width * height))


def _auto_row_chunk(width: int, sample_chunk: int) -> int:
    return max(1, PATHS_PER_PASS // (width * sample_chunk))


class Renderer:
    def __init__(self, scene: Scene, options: Optional[RenderOptions] = None):
        self.options = options or scene.options
        self.timer = PhaseTimer()
        backend = self.options.backend
        if backend == "auto":
            # The Pallas cluster kernel is the TPU hot path; the threaded
            # BVH is the portable/XLA path (CPU tests, odd platforms).
            backend = "cluster" if jax.default_backend() == "tpu" else "bvh"
        with self.timer.phase("accel_build"):
            if backend == "cluster":
                from .accel.clusters import build_clusters
                from .kernels.pallas_trace import device_cluster_grid

                self._host_accel = build_clusters(
                    scene.triangles, scene.mat_ids,
                    cluster_size=self.options.cluster_size,
                )
                build_fn = lambda: device_cluster_grid(self._host_accel)
            else:
                self._host_accel = build_bvh(
                    scene.triangles, leaf_size=self.options.leaf_size
                )
                build_fn = lambda: device_bvh(
                    self._host_accel, scene.triangles, leaf_size=self.options.leaf_size
                )
        with self.timer.phase("upload"):
            self.bvh = build_fn()
            tris = jnp.asarray(scene.triangles, jnp.float32)
            self.scene_arrays = SceneArrays(
                v0=tris[:, 0],
                v1=tris[:, 1],
                v2=tris[:, 2],
                mat_ids=jnp.asarray(scene.mat_ids),
                media=MediaTable(*(jnp.asarray(a) for a in scene.media)),
                scale=jnp.float32(self.options.scale),
                background=int(self.options.background),
            )
        self.camera: Camera = make_camera(
            self.options.camera_pos, self.options.camera_look_at, self.options.camera_fov
        )
        color = jnp.asarray(self.options.light_color, jnp.float32)
        self.lights = Lights(
            position=jnp.asarray(self.options.light_pos, jnp.float32),
            intensity=color * jnp.float32(self.options.light_intensity),
        )
        self.triangles = scene.triangles

    def render(self) -> np.ndarray:
        opt = self.options
        resolution = (opt.width, opt.height)
        if opt.aov != "beauty":
            with self.timer.phase("render"):
                img = render_aov(
                    self.triangles, self.camera, self.bvh, resolution, opt.aov
                )
                img = np.asarray(jax.block_until_ready(img))
            return img

        if opt.shard == "auto" and len(jax.devices()) > 1:
            from .parallel.sharding import render_beauty_sharded

            with self.timer.phase("render"):
                img = render_beauty_sharded(
                    self.camera,
                    self.scene_arrays,
                    self.bvh,
                    self.lights,
                    resolution,
                    opt.num_samples,
                    max_depth=opt.max_depth,
                    rr_depth=opt.rr_depth,
                    nee_max_media=opt.nee_max_media,
                    rng_mode=opt.rng,
                )
                img = np.asarray(jax.block_until_ready(img))
            return img

        # Single device: chunk the work into bounded device passes. The
        # reference's single giant dispatch is exactly what trips GPU
        # watchdogs (README.md:9-10); chunking rows x samples removes that
        # failure mode and enables progress reporting. Parity RNG chunks
        # carry the per-pixel PCG stream across sample chunks so the
        # result is identical to one monolithic pass.
        chunk = opt.sample_chunk or _auto_sample_chunk(opt.width, opt.height)
        chunk = max(1, min(chunk, opt.num_samples))
        rows = _auto_row_chunk(opt.width, chunk)
        acc = np.zeros((opt.height, opt.width, 3), np.float32)
        with self.timer.phase("render"):
            for row0 in range(0, opt.height, rows):
                tile_h = min(rows, opt.height - row0)
                rng_state = None
                done = 0
                while done < opt.num_samples:
                    n = min(chunk, opt.num_samples - done)
                    img, rng_state = render_beauty(
                        self.camera,
                        self.scene_arrays,
                        self.bvh,
                        self.lights,
                        (opt.width, tile_h),
                        n,
                        max_depth=opt.max_depth,
                        rr_depth=opt.rr_depth,
                        nee_max_media=opt.nee_max_media,
                        rng_mode=opt.rng,
                        row_offset=row0,
                        full_resolution=resolution,
                        sample_offset=done,
                        rng_state=rng_state,
                        return_rng=True,
                    )
                    acc[row0 : row0 + tile_h] += np.asarray(
                        jax.block_until_ready(img)
                    ) * (n / opt.num_samples)
                    done += n
        return acc

    def stats(self) -> dict:
        return dict(self.timer.items())

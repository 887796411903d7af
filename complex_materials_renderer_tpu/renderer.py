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
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .accel import build_bvh
from .config import RenderOptions
from .kernels.traverse import device_bvh
from .ops.camera import Camera, make_camera
from .render.aov import render_aov
from .render.hitinfo import make_scene_arrays
from .render.integrator import Lights, render_beauty
from .scene import Scene
from .utils.timing import PhaseTimer


# Pass shaping. LANES_PER_PASS bounds the wavefront width (empirically the
# sweet spot: bigger wavefronts stretch the bounce loop's straggler tail);
# PATHS_PER_PASS bounds lanes x samples per device pass, which bounds
# single-dispatch runtime (the TPU runtime, like the Windows GPU watchdog
# the reference warns about, kills very long dispatches) and amortizes
# per-dispatch host/tunnel latency over an in-pass sample scan.
LANES_PER_PASS = int(os.environ.get("CMR_LANES_PER_PASS", 1 << 16))
PATHS_PER_PASS = int(os.environ.get("CMR_PATHS_PER_PASS", 1 << 20))


def _mega_env_knobs() -> dict:
    """Read the megakernel tuning env vars ONCE per render and hand them
    to render_beauty_mega as explicit static args. They participate in
    the jit cache key this way; an env read at trace time would be
    invisible to a cached trace (a same-shape A/B with a changed knob
    would silently reuse the stale compilation)."""
    return dict(
        schedule_mode=os.environ.get("CMR_MEGA_DYN", "auto"),
        schedule=os.environ.get("CMR_MEGA_SCHED", ""),
        sortkey=os.environ.get("CMR_MEGA_SORTKEY", "dir"),
        debug=os.environ.get("CMR_MEGA_DEBUG", ""),
    )


def resolve_partition(partition: str, num_tris: int, width: int,
                      has_media: bool) -> bool:
    """Resolve --partition {auto,off,media} to a bool (segregate or not).

    'auto' enables opaque/media cluster segregation exactly when the
    unpartitioned grid would exceed the dynamic-schedule threshold
    (>128 clusters, render/megarender.py) AND the scene has media.
    Chip A/Bs (round 3h): on >128-cluster dense-media scenes the
    partitioned fused walk wins (cup +4-6%, stanford_dragon +8%) because
    the K-list sweep's media range excludes the opaque shell; on small
    scenes it loses 10-13% (isobox/gembox) — the split spatial orderings
    admit more main/dist visits than the range trim saves. Images are
    partition-invariant (tests/test_megakernel.py::test_mega_partitioned_grid_matches).
    """
    if partition == "media":
        return True
    if partition == "off":
        return False
    return has_media and -(-num_tris // width) > 128


def _auto_sample_chunk(width: int, height: int) -> int:
    lanes = min(LANES_PER_PASS, width * height)
    return max(1, PATHS_PER_PASS // lanes)


def _auto_row_chunk(width: int) -> int:
    return max(1, LANES_PER_PASS // width)


class Renderer:
    def __init__(self, scene: Scene, options: Optional[RenderOptions] = None):
        self.options = options or scene.options
        self.timer = PhaseTimer()
        backend = self.options.backend
        if backend == "auto":
            # The Pallas cluster kernel is the TPU hot path; the threaded
            # BVH is the portable/XLA path (CPU tests, odd platforms).
            backend = "cluster" if jax.default_backend() == "tpu" else "bvh"
        elif backend == "bvh" and jax.default_backend() == "tpu":
            import warnings

            warnings.warn(
                "--backend bvh on TPU is ~300x slower than the Pallas "
                "cluster kernel (XLA per-lane gathers); use --backend "
                "cluster or auto",
                stacklevel=2,
            )
        with self.timer.phase("accel_build"):
            if backend == "cluster":
                from .accel.clusters import build_clusters
                from .kernels.pallas_trace import device_cluster_grid

                # cluster_size 0 = auto: width 128, shrunk down the
                # {16,32,64} ladder for scenes that fit in ONE cluster.
                # The kernel statically unrolls the FULL width (pad
                # triangles fail their Moller-Trumbore NaN compares but
                # still cost the arithmetic), so a tiny scene at width
                # 128 pays ~9x the triangle tests it needs per visit
                # (host model tools/study_widthsf.py: isobox, 14 real
                # tris, models 3-5x faster at width 16). Shape-visible
                # to the jit cache; images are width-invariant
                # (tests/test_megakernel.py::test_mega_cluster_width_invariant).
                width = self.options.cluster_size
                if width == 0:
                    width = 128
                    ntris = int(scene.triangles.shape[0])
                    if ntris <= 128:
                        width = 16
                        while width < ntris:
                            width *= 2
                # Opaque/media segregation lets the NEE sweep run its
                # K-list collection over media clusters only and the
                # fused dnee walk serve dist+occlusion+K-list in one
                # pass over the partitioned ranges. Default 'auto' (see
                # resolve_partition for the A/B record).
                media_mats = (
                    set(int(m) for m in scene.media.mat_id if int(m) >= 0)
                    if scene.media is not None
                    and resolve_partition(
                        self.options.partition,
                        int(scene.triangles.shape[0]),
                        width,
                        any(int(m) >= 0 for m in scene.media.mat_id),
                    )
                    else None
                )

                def _build(sf):
                    return build_clusters(
                        scene.triangles, scene.mat_ids,
                        cluster_size=width,
                        # Oversized-triangle bisection (split_frac)
                        # measured SLOWER on the bench scenes (0.81 vs
                        # 1.07 Mpaths/s on showcase): the extra clusters
                        # cost more visits than the tighter AABBs save.
                        # Off by default; available for scenes with
                        # pathological scene-spanning fans.
                        media_mats=media_mats,
                        super_factor=sf,
                        # Quad slot merging (accel/clusters.pair_quads):
                        # near-2x fewer slots on quad-tessellated meshes
                        # (cup 92% / vessel 85% / gem_corner 81%
                        # pairable) for the same acceptance geometry;
                        # 'auto' == on. AOV passes force quads OFF: a
                        # merged slot's (u, v) live in the QUAD basis,
                        # so the topology AOV would report u+v > 1 on
                        # second-triangle hits and cyclically re-based
                        # barycentrics elsewhere, diverging from the
                        # reference topology pass (topology.comp.glsl:
                        # 95-111) and the bvh backend.
                        quads=self.options.quads != "off"
                        and self.options.aov == "beauty",
                    )

                # 0 = auto: the measured default fan-out (16), doubled
                # until huge scenes fit the megakernel's 1024-super cap
                # (trace_paths_mega) instead of rejecting them.
                sf = self.options.super_factor or 16
                self._host_accel = _build(sf)
                while (
                    self.options.super_factor == 0
                    and self._host_accel.super_bounds.shape[0] > 1024
                ):
                    sf *= 2
                    self._host_accel = _build(sf)
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
            self.scene_arrays = make_scene_arrays(
                scene.triangles,
                scene.mat_ids,
                scene.media,
                self.options.scale,
                self.options.background,
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

    def render(self, checkpoint_path: Optional[str] = None) -> np.ndarray:
        """Render the configured image.

        ``checkpoint_path``: optional .npz path for accumulate-buffer
        checkpointing — the framebuffer plus per-row-block RNG state is
        saved after every device pass, and an interrupted render resumes
        from it with identical results (the checkpoint is removed on
        completion). Not a reference capability (SURVEY §5); free here
        because the accumulation buffer is the renderer's entire state.
        """
        opt = self.options
        checkpoint_path = checkpoint_path or (opt.checkpoint or None)
        resolution = (opt.width, opt.height)
        if opt.aov != "beauty":
            with self.timer.phase("render"):
                img = render_aov(
                    self.triangles, self.camera, self.bvh, resolution, opt.aov
                )
                img = np.asarray(jax.block_until_ready(img))
            return img

        if opt.spp_mode == "adaptive":
            if checkpoint_path:
                raise ValueError(
                    "--spp-mode adaptive does not support --checkpoint "
                    "(per-pixel sample counts are not resumable state yet); "
                    "drop one of the two flags"
                )
            return self.render_adaptive()

        if opt.shard == "auto" and len(jax.devices()) > 1:
            from .parallel.sharding import make_render_mesh, render_beauty_sharded

            engine = self._resolve_engine()
            mesh = make_render_mesh()
            n_tile = mesh.shape["tile"]
            # Chunk bands x sample chunks so no sharded dispatch runs
            # unboundedly long (parity mode keeps all samples of a pixel in
            # one pass to preserve its sequential stream, so it chunks rows
            # only; counter mode chunks samples too).
            band = max(1, (LANES_PER_PASS * n_tile) // opt.width)
            band = min(band, opt.height)
            if opt.rng in ("counter", "ld"):
                chunk = opt.sample_chunk or max(
                    1, PATHS_PER_PASS // (min(LANES_PER_PASS, band * opt.width))
                )
                chunk = max(1, min(chunk, opt.num_samples))
            else:
                chunk = opt.num_samples
            acc = np.zeros((opt.height, opt.width, 3), np.float32)
            with self.timer.phase("render"):
                for row0 in range(0, opt.height, band):
                    band_h = min(band, opt.height - row0)
                    done = 0
                    while done < opt.num_samples:
                        n = min(chunk, opt.num_samples - done)
                        img = render_beauty_sharded(
                            self.camera,
                            self.scene_arrays,
                            self.bvh,
                            self.lights,
                            (opt.width, band_h),
                            n,
                            max_depth=opt.max_depth,
                            rr_depth=opt.rr_depth,
                            nee_max_media=opt.nee_max_media,
                            rng_mode=opt.rng,
                            mesh=mesh,
                            row_offset=row0,
                            full_resolution=resolution,
                            sample_offset=done,
                            engine=engine,
                            direct=opt.direct,
                        )
                        acc[row0 : row0 + band_h] += np.asarray(
                            jax.block_until_ready(img)
                        ) * (n / opt.num_samples)
                        done += n
            return acc

        # Single device: chunk the work into bounded device passes. The
        # reference's single giant dispatch is exactly what trips GPU
        # watchdogs (README.md:9-10); chunking rows x samples removes that
        # failure mode, enables progress reporting, and makes the
        # accumulation buffer a natural checkpoint (the framebuffer IS the
        # renderer's whole state). Parity RNG chunks carry the per-pixel
        # PCG stream across sample chunks so the result is identical to
        # one monolithic pass.
        # Engine choice: the fused megakernel runs the whole bounce loop in
        # one Pallas kernel per pass (kernels/megakernel.py) and needs the
        # cluster-grid accel; the wavefront XLA loop remains the portable
        # engine (and the only one for the threaded-BVH backend).
        engine = self._resolve_engine()
        if engine in ("mega", "binned", "pair"):
            from .render.megarender import render_beauty_mega

            knobs = _mega_env_knobs()
            if engine == "binned":
                # Binned traces with XLA physics: the megarender driver
                # is reused; only the per-pass kernel is swapped.
                knobs["trace_engine"] = "binned"
                knobs["binned_list"] = int(os.environ.get("CMR_BINNED_LIST", 8))
                knobs["binned_cap"] = int(os.environ.get("CMR_BINNED_CAP", 12))
            if engine == "pair":
                # Cluster-major pair sweep with XLA physics: megarender
                # driver reused, per-pass kernel swapped (pairrender).
                knobs["trace_engine"] = "pair"
            if (
                knobs["schedule_mode"] == "auto"
                and opt.width * opt.height * opt.num_samples < (1 << 18)
            ):
                # Preview-sized jobs (≈ the BASELINE 128x128@8 config):
                # the static per-width phase schedule costs one Mosaic
                # compile per width (~minutes each through a remote
                # compile service), so time-to-first-image is dominated
                # by compiles. The dynamic live_blocks mode compiles ONE
                # kernel; large renders amortize the static schedule.
                knobs["schedule_mode"] = "all"
            beauty_fn = partial(
                render_beauty_mega, tir=opt.tir, direct=opt.direct, **knobs
            )
        else:
            beauty_fn = partial(render_beauty, tir=opt.tir, direct=opt.direct)

        chunk = opt.sample_chunk or _auto_sample_chunk(opt.width, opt.height)
        chunk = max(1, min(chunk, opt.num_samples))
        rows = _auto_row_chunk(opt.width)

        acc = np.zeros((opt.height, opt.width, 3), np.float32)
        rng_rows: dict = {}
        done_rows: dict = {}
        fingerprint = self._render_fingerprint()
        if checkpoint_path and os.path.exists(checkpoint_path):
            state = np.load(checkpoint_path, allow_pickle=True)
            ck_fp = str(state["fingerprint"]) if "fingerprint" in state else ""
            if ck_fp != fingerprint:
                raise ValueError(
                    f"checkpoint {checkpoint_path} was written by a "
                    "different render (scene/options fingerprint mismatch: "
                    f"{ck_fp!r} vs {fingerprint!r}); delete it or render "
                    "with the original settings"
                )
            if (
                tuple(state["shape"]) == acc.shape
                and int(state["rows"]) == rows
                and int(state["chunk"]) == chunk
            ):
                acc = np.array(state["acc"], np.float32)
                done_rows = dict(
                    zip(state["row_ids"].tolist(), state["done"].tolist())
                )
                rng_saved = state["rng"]
                for i, row0 in enumerate(state["row_ids"].tolist()):
                    rng_rows[row0] = rng_saved[i]

        with self.timer.phase("render"):
            for row0 in range(0, opt.height, rows):
                tile_h = min(rows, opt.height - row0)
                rng_state = (
                    jnp.asarray(rng_rows[row0]) if row0 in rng_rows else None
                )
                done = done_rows.get(row0, 0)
                while done < opt.num_samples:
                    n = min(chunk, opt.num_samples - done)
                    img, rng_state = beauty_fn(
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
                    if checkpoint_path:
                        rng_rows[row0] = np.asarray(rng_state)
                        done_rows[row0] = done
                        self._save_checkpoint(
                            checkpoint_path, acc, rows, chunk, done_rows,
                            rng_rows, fingerprint,
                        )
        if checkpoint_path and os.path.exists(checkpoint_path):
            os.remove(checkpoint_path)
        return acc

    def render_adaptive(self, snapshot_cb=None, sample_base: int = 0):
        """Adaptive per-pixel sample allocation at the uniform budget
        (--spp-mode adaptive): total samples = width*height*num_samples,
        but each pixel's count tracks its measured noise.

        Same estimand as uniform — every sample is the reference
        estimator's (volpath:580-798); only WHERE the budget goes
        changes. Protocol: a uniform warmup (1/4 of the budget, capped at
        32 spp) accumulates per-pixel (sum, sumsq, n); each subsequent
        round re-targets counts toward n_p ~ sigma_p (the allocation that
        minimizes image MSE at fixed budget), with the per-pixel std map
        3x3-box-smoothed and mixed with a decaying uniform floor — the
        defense against zero-variance lockout (a pixel whose first
        samples happened to agree still keeps sampling). Measured on the
        bench protocol: ideal headroom 1.50x variance; realized 1.29x at
        a 64-spp budget, 1.35x at 256, rising toward ideal as the budget
        grows (tools/study_adaptive.py, NOTES round 5e).

        Rounds are driven through render_samples_mega with a FIXED lane
        shape, so the whole render compiles once. The per-pixel mean is
        very slightly adaptive-biased (counts depend on earlier samples);
        the 25% uniform floor + warmup bound it far below the noise at
        any practical budget, and the convergence test pins it
        (tests/test_adaptive.py).

        ``snapshot_cb(avg_spp, image_fn)``: optional progress hook after
        each round (bench.py uses it to measure the RMSE crossing
        mid-flight); image_fn() materializes the current estimate. A
        truthy return stops the render after that round (early stop —
        the bench cuts off once the crossing is confirmed rather than
        spending the rest of the budget).
        ``sample_base``: added to every per-pixel sample index —
        measurement harnesses use it to keep an adaptive run's sample
        window disjoint from an independently rendered truth's.
        """
        opt = self.options
        if opt.rng not in ("counter", "ld"):
            raise ValueError(
                "--spp-mode adaptive requires a stateless RNG "
                "(--rng counter|ld); parity's sequential per-pixel stream "
                "has no defined order under per-pixel sample counts"
            )
        engine = self._resolve_engine()
        if engine not in ("mega", "binned", "pair"):
            raise ValueError(
                "--spp-mode adaptive requires the mega-family engines "
                "(cluster backend); got engine="
                f"{engine!r} (backend {type(self.bvh).__name__})"
            )
        if opt.shard == "auto" and len(jax.devices()) > 1:
            raise ValueError(
                "--spp-mode adaptive is single-device for now; pass "
                "--shard none (tile-DP sharding of adaptive rounds is a "
                "planned extension)"
            )
        from .render.megarender import _tile_perm, render_samples_mega

        knobs = _mega_env_knobs()
        if engine == "binned":
            knobs["trace_engine"] = "binned"
            knobs["binned_list"] = int(os.environ.get("CMR_BINNED_LIST", 8))
            knobs["binned_cap"] = int(os.environ.get("CMR_BINNED_CAP", 12))
        if engine == "pair":
            knobs["trace_engine"] = "pair"

        W, H = opt.width, opt.height
        r = W * H
        n_total = r * opt.num_samples
        # One compiled shape for every round: lanes per device call.
        ch = min(LANES_PER_PASS, r)
        l_call = min(PATHS_PER_PASS, -(-n_total // ch) * ch)
        # Lanes are issued in 32x32-tile pixel order (the uniform path's
        # primary-ray coherence layout; _partition_live's stable sort
        # preserves it within equal keys).
        perm, _inv = _tile_perm(W, H)
        rank = np.empty(r, np.int64)
        rank[perm] = np.arange(r)

        n = np.zeros(r, np.int64)
        acc = np.zeros((r, 3), np.float64)
        acc2 = np.zeros((r, 3), np.float64)
        # Uniform warmup: 1/4 of the budget, but never more than 32 spp —
        # at production budgets (thousands of spp) a proportional warmup
        # is pure allocation dilution; 32 uniform samples already give the
        # std map ~18% relative error per pixel before smoothing.
        warmup = max(2 * r, min(n_total // 4, 32 * r))
        issued = 0

        def weights():
            """Per-pixel allocation targets ~ smoothed std, with a uniform
            mixture floor that DECAYS as counts grow: the floor guards
            against variance-estimate lockout, and sigma-hat's relative
            error shrinks ~ 1/sqrt(n_p), so the guard can shrink at the
            same rate (0.25 at a 64-spp average, never below 0.08)."""
            avg = max(float(issued) / r, 1.0)
            frac = float(np.clip(0.25 * np.sqrt(64.0 / avg), 0.08, 0.25))
            nn = np.maximum(n, 2)[:, None]
            var = np.maximum(acc2 / nn - (acc / nn) ** 2, 0.0).mean(-1)
            sig = np.sqrt(var * (nn[:, 0] / np.maximum(nn[:, 0] - 1, 1)))
            s = sig.reshape(H, W)
            p = np.pad(s, 1, mode="edge")
            s = (
                p[:-2, :-2] + p[:-2, 1:-1] + p[:-2, 2:]
                + p[1:-1, :-2] + p[1:-1, 1:-1] + p[1:-1, 2:]
                + p[2:, :-2] + p[2:, 1:-1] + p[2:, 2:]
            ).reshape(-1) / 9.0
            m = s.mean()
            if not np.isfinite(m) or m <= 0.0:
                return np.ones(r)
            return frac + (1.0 - frac) * (s / m)

        def apportion(budget, want):
            """Largest-remainder apportionment of ``budget`` lanes to
            pixels proportional to ``want`` (non-negative, not all 0)."""
            q = budget * (want / want.sum())
            c = np.floor(q).astype(np.int64)
            short = budget - int(c.sum())
            if short > 0:
                frac = q - c
                c[np.argpartition(-frac, short - 1)[:short]] += 1
            return c

        with self.timer.phase("render"):
            while issued < n_total:
                # Round size grows geometrically past warmup (~issued/3,
                # capped at 8 device calls): re-weighting every device
                # pass is pure host glue at production budgets, while the
                # cap keeps the snapshot (crossing-measurement) resolution
                # a few percent of the running average.
                if issued < warmup:
                    lanes = int(min(l_call, warmup - issued))
                else:
                    lanes = int(
                        min(n_total - issued, 8 * l_call,
                            max(l_call, issued // 3))
                    )
                if issued < warmup:
                    base, extra = divmod(lanes, r)
                    counts = np.full(r, base, np.int64)
                    if extra:
                        # Deterministic: first ``extra`` pixels in tile
                        # order get the remainder.
                        counts[rank < extra] += 1
                else:
                    # Catch-up toward the global target allocation so
                    # warmup samples count against each pixel's share.
                    w = weights()
                    target = n_total * (w / w.sum())
                    deficit = np.maximum(target - n, 0.0)
                    if deficit.sum() <= 0:
                        deficit = w
                    counts = apportion(lanes, deficit)
                sel = np.repeat(np.arange(r, dtype=np.int64), counts)
                sel = sel[np.argsort(rank[sel], kind="stable")]
                # Per-pixel sample indices continue each pixel's stream:
                # within this round, the k-th occurrence of pixel p gets
                # index n[p] + k (sel is sorted, so occurrences are
                # consecutive).
                first = np.r_[True, sel[1:] != sel[:-1]]
                pos = np.arange(lanes, dtype=np.int64)
                run0 = pos[first][np.cumsum(first) - 1]
                sidx_all = (
                    sample_base + n[sel] + (pos - run0)
                ).astype(np.uint32)
                rad = np.empty((lanes, 3), np.float64)
                for o in range(0, lanes, l_call):
                    m = min(l_call, lanes - o)
                    pix = np.zeros((l_call, 2), np.int32)
                    pix[:m, 0] = sel[o:o + m] % W
                    pix[:m, 1] = sel[o:o + m] // W
                    sidx = np.zeros(l_call, np.uint32)
                    sidx[:m] = sidx_all[o:o + m]
                    val = np.zeros(l_call, bool)
                    val[:m] = True
                    rad[o:o + m] = np.asarray(
                        render_samples_mega(
                            self.camera, self.scene_arrays, self.bvh,
                            self.lights,
                            jnp.asarray(pix), jnp.asarray(sidx),
                            jnp.asarray(val), (W, H),
                            max_depth=opt.max_depth, rr_depth=opt.rr_depth,
                            nee_max_media=opt.nee_max_media,
                            rng_mode=opt.rng,
                            tir=opt.tir, direct=opt.direct, **knobs,
                        ),
                        np.float64,
                    )[:m]
                # bincount, not np.add.at: unbuffered add.at is ~20x
                # slower at 1M+ lanes and was the dominant host glue.
                for c in range(3):
                    acc[:, c] += np.bincount(
                        sel, weights=rad[:, c], minlength=r
                    )
                    acc2[:, c] += np.bincount(
                        sel, weights=rad[:, c] ** 2, minlength=r
                    )
                n += np.bincount(sel, minlength=r)
                issued += lanes
                if snapshot_cb is not None:
                    stop = snapshot_cb(
                        issued / r,
                        lambda: (
                            acc / np.maximum(n, 1)[:, None]
                        ).astype(np.float32).reshape(H, W, 3),
                    )
                    if stop:
                        break
        img = (acc / np.maximum(n, 1)[:, None]).astype(np.float32)
        return img.reshape(H, W, 3)

    def _resolve_engine(self) -> str:
        """Pick the bounce-loop engine. 'auto' takes the phase-compacted
        megakernel on TPU with the cluster backend (showcase 256^2@8:
        1.07 vs 0.63 Mpaths/s, NOTES.md round-2 log); the wavefront XLA
        loop remains the portable engine and the only one for the
        threaded BVH."""
        from .kernels.pallas_trace import DeviceClusterGrid

        engine = self.options.engine
        is_cluster = isinstance(self.bvh, DeviceClusterGrid)
        if engine == "auto":
            return (
                "mega"
                if jax.default_backend() == "tpu" and is_cluster
                else "wavefront"
            )
        if engine in ("mega", "binned", "pair") and not is_cluster:
            raise ValueError(f"--engine {engine} requires --backend cluster")
        if engine in ("binned", "pair"):
            import warnings

            # Banked experiments, kept fully tested as negative results —
            # not viable production paths (NOTES.md rounds 3b/4c).
            measured = {
                "binned": "4.4x slower than mega on cup (0.025 vs 0.110 "
                "Mpaths/s; lane efficiency ~2% on incoherent wavefronts)",
                "pair": "1.6x slower than mega on cup (0.127 vs 0.205 "
                "Mpaths/s; lanes x L expansion glue eats the visit win)",
            }[engine]
            warnings.warn(
                f"--engine {engine} is a measured performance LOSER on "
                f"every shipped scene: {measured}. It renders identical "
                "images; use --engine mega (or auto) for production. "
                "See NOTES.md for the full measurements.",
                stacklevel=2,
            )
        return engine

    def _render_fingerprint(self) -> str:
        """Identity of the accumulation this checkpoint belongs to: acc is
        stored pre-scaled by n/num_samples, so resuming after changing -s
        (or swapping a same-resolution scene) would silently blend
        incompatible accumulations."""
        opt = self.options
        fields = (
            opt.obj_path, opt.width, opt.height, opt.num_samples,
            opt.max_depth, opt.rr_depth, opt.nee_max_media, opt.rng,
            opt.background, float(opt.scale), tuple(opt.camera_pos),
            tuple(opt.camera_look_at), float(opt.camera_fov),
            tuple(opt.light_pos), tuple(opt.light_color),
            float(opt.light_intensity),
        )
        import hashlib

        return hashlib.sha256(repr(fields).encode()).hexdigest()[:16]

    @staticmethod
    def _save_checkpoint(path, acc, rows, chunk, done_rows, rng_rows, fingerprint):
        row_ids = sorted(done_rows)
        tmp = path + ".tmp"
        rng_obj = np.empty(len(row_ids), dtype=object)
        for i, r in enumerate(row_ids):
            rng_obj[i] = np.asarray(rng_rows[r])
        np.savez(
            tmp,
            acc=acc,
            shape=np.asarray(acc.shape),
            rows=rows,
            chunk=chunk,
            row_ids=np.asarray(row_ids, np.int64),
            done=np.asarray([done_rows[r] for r in row_ids], np.int64),
            rng=rng_obj,
            fingerprint=fingerprint,
        )
        # np.savez appends .npz when the name lacks it.
        actual = tmp if tmp.endswith(".npz") else tmp + ".npz"
        os.replace(actual, path)

    def stats(self) -> dict:
        return dict(self.timer.items())

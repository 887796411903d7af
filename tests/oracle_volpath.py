"""Independent parity oracle: a literal scalar transcription of the
reference shader `/root/reference/source/shaders/volpath.comp.glsl`.

PURPOSE. Every engine in this repo (wavefront integrator, megakernel)
shares the `ops/` physics modules, so a common-mode misreading of the
GLSL spec would be invisible to the engine-equivalence and golden tests.
This module is transcribed FRESH from the GLSL — per-pixel Python
`while` loop, scalar math, the exact PCG32 stream — and deliberately
imports nothing from `complex_materials_renderer_tpu`. It is slow
(plain Python over pixels) and exists only as a correctness oracle for
tiny frames (tests/test_parity_oracle.py).

Transcription map (GLSL line -> here):
  stepRNG / stepAndOutputRNGFloat   volpath:233-246 -> _rng_next
  getObjectHitInfo                  volpath:119-229 -> _hit_info
  evalTransmittance                 volpath:248-253 -> _transmittance
  diffuseEval / diffuseSample       volpath:255-310 -> _diffuse_*
  getFresnelR (full branch)         volpath:312-335 -> _fresnel_r
  sampleDirectLight                 volpath:337-426 -> _sample_direct_light
  evalPhaseFunction / sample        volpath:435-479 -> _phase_*
  sampleDistance                    volpath:482-543 -> _sample_distance
  reflectRay / refractRay           volpath:545-562 -> _reflect / _refract
  main                              volpath:564-805 -> render_oracle

Defined-behavior choices (the GLSL hits IEEE-undefined territory in two
places; both match NOTES.md "deliberate divergences" so the oracle and
the engines stay comparable):
  - Total internal reflection: the GLSL's `normalize(vec3(0))` poisons
    the ray direction with NaN, so the path dies on its next traversal
    (tir='kill' semantics). The oracle kills the path explicitly after
    replaying the same RNG draws the dying lane makes (boundary Fresnel,
    free-flight, second boundary Fresnel) so per-pixel streams stay
    aligned across samples. It never takes the scatter branch after TIR
    (the GLSL's comparison against an undefined candidate-t register is
    unknowable; the engines define it as no-scatter).
  - The distance-to-boundary query uses the closest hit with a 1e4 miss
    sentinel (the GLSL reads an any-hit candidate that is
    traversal-order dependent on hardware).
"""

from __future__ import annotations

import math

import numpy as np

INV_FOURPI = 0.07957747154594767
PI = 3.14159265359
INV_PI = 0.31830988618
TWOPI = 6.28318530718
REFLECTANCE = 0.8
AIR_IOR = 1.0
T_MIN = 0.0001
T_MAX = 10000.0
MAX_DEPTH = 32
RR_DEPTH = 16


def _rng_next(state: int):
    """volpath:233-246. `state` is a Python int masked to 32 bits; the
    float conversion mirrors GLSL `float(word) / 4294967295.0f` with
    float32 rounding at each step."""
    state = (state * 747796405 + 1) & 0xFFFFFFFF
    word = (((state >> ((state >> 28) + 4)) ^ state) * 277803737) & 0xFFFFFFFF
    word = (word >> 22) ^ word
    value = float(np.float32(np.float32(word) / np.float32(4294967295.0)))
    return state, value


def _normalize(v):
    n = math.sqrt(v[0] * v[0] + v[1] * v[1] + v[2] * v[2])
    return np.asarray(v, np.float64) / n


def _cross(a, b):
    return np.array(
        [
            a[1] * b[2] - a[2] * b[1],
            a[2] * b[0] - a[0] * b[2],
            a[0] * b[1] - a[1] * b[0],
        ],
        np.float64,
    )


class _Scene:
    """Precomputed triangle soup + media table for the oracle."""

    def __init__(self, triangles, mat_ids, media_rows, scale, background):
        tris = np.asarray(triangles, np.float64)
        self.v0 = tris[:, 0]
        self.e1 = tris[:, 1] - tris[:, 0]
        self.e2 = tris[:, 2] - tris[:, 0]
        # Right-hand-rule geometric normal (volpath:184-196).
        n = np.cross(self.e1, self.e2)
        self.normal = n / np.linalg.norm(n, axis=1, keepdims=True)
        self.mat_ids = np.asarray(mat_ids, np.int64)
        # media_rows: list of (matID, sigma_s[3], sigma_a[3], g[3], ior),
        # in table order — the scan takes the FIRST match (volpath:137-145)
        # and scales sigma_s / sigma_a by pcScale (volpath:141).
        self.media = [
            (
                int(m[0]),
                np.asarray(m[1], np.float64) * scale,
                np.asarray(m[2], np.float64) * scale,
                np.asarray(m[3], np.float64),
                float(m[4]),
            )
            for m in media_rows
        ]
        self.background = int(background)

    def find_medium(self, mat_id):
        for mid, ss, sa, g, ior in self.media:
            if mat_id == mid:
                return (ss, sa, g, ior)
        return None

    def closest_hit(self, origin, direction, t_max):
        """Closest triangle hit with t in (T_MIN, t_max]; returns
        (prim, t, u, v) or (None, None, None, None). Vectorized
        Moller-Trumbore in float64 (independent of the kernels' float32
        forms). u/v are the barycentric weights of v1/v2 — the hit
        POSITION must be reconstructed barycentrically (volpath:161-181),
        not as origin + t*dir: on an axis-aligned plane the barycentric
        form is exact where the parametric form carries ~1e-16 noise that
        flips the checkerboard's floor() parity."""
        o = np.asarray(origin, np.float64)
        d = np.asarray(direction, np.float64)
        p = np.cross(d[None, :], self.e2)
        det = np.einsum("ij,ij->i", self.e1, p)
        with np.errstate(divide="ignore", invalid="ignore"):
            inv_det = 1.0 / det
            s = o[None, :] - self.v0
            u = np.einsum("ij,ij->i", s, p) * inv_det
            q = np.cross(s, self.e1)
            v = np.einsum("j,ij->i", d, q) * inv_det
            t = np.einsum("ij,ij->i", self.e2, q) * inv_det
        eps = 1e-9
        valid = (
            (np.abs(det) > 1e-14)
            & (u >= -eps)
            & (v >= -eps)
            & (u + v <= 1.0 + eps)
            & (t > T_MIN)
            & (t <= t_max)
        )
        if not np.any(valid):
            return None, None, None, None
        t = np.where(valid, t, np.inf)
        prim = int(np.argmin(t))
        return prim, float(t[prim]), float(u[prim]), float(v[prim])


def _hit_info(scene: _Scene, prim, u, v):
    """volpath:119-229: world position (barycentric, volpath:170),
    geometric normal, medium lookup, procedural base color."""
    pos = scene.v0[prim] + u * scene.e1[prim] + v * scene.e2[prim]
    normal = scene.normal[prim]
    mat = int(scene.mat_ids[prim])
    medium = scene.find_medium(mat)
    color = np.array([0.8, 0.8, 0.8])
    if scene.background == 1:
        ex = int(math.floor(pos[0])) % 2 == 0
        ey = int(math.floor(pos[1])) % 2 == 0
        color = (
            np.array([0.8, 0.8, 0.8]) if ex == ey else np.array([0.3, 0.3, 0.3])
        )
    elif scene.background == 2:
        if normal[0] > 0.99:
            color = np.array([0.8, 0.0, 0.0])
        elif normal[0] < -0.99:
            color = np.array([0.0, 0.8, 0.0])
    return pos, normal, medium, color


def _transmittance(dist, medium):
    ss, sa, _g, _ior = medium
    return np.exp(-(ss + sa) * dist)


def _fresnel_r(n1, n2, in_dir, normal):
    """volpath:320-335 (full branch). Returns (R, tir). The GLSL takes
    asin of n1/n2*sin(theta1), which is NaN under TIR; flagged here."""
    c = float(np.dot(_normalize(in_dir), _normalize(normal)))
    if c < 0.0:
        c = float(np.dot(_normalize(in_dir), _normalize(-np.asarray(normal))))
    theta1 = math.acos(max(-1.0, min(1.0, c)))
    sin_t2 = n1 / n2 * math.sin(theta1)
    if sin_t2 >= 1.0:
        return float("nan"), True
    theta2 = math.asin(sin_t2)
    c1, c2 = math.cos(theta1), math.cos(theta2)
    rs = (n1 * c1 - n2 * c2) / (n1 * c1 + n2 * c2)
    rp = (n1 * c2 - n2 * c1) / (n1 * c2 + n2 * c1)
    return (rs * rs + rp * rp) / 2.0, False


def _reflect(d, n):
    return np.asarray(d) - 2.0 * float(np.dot(d, n)) * np.asarray(n)


def _refract(d, n, n1, n2):
    """volpath:550-562; returns None on TIR (the GLSL returns vec3(0),
    which the caller's normalize turns into NaN)."""
    eta = n1 / n2
    cos_i = -float(np.dot(d, n))
    sin2_t = eta * eta * (1.0 - cos_i * cos_i)
    if sin2_t >= 1.0:
        return None
    cos_t = math.sqrt(1.0 - sin2_t)
    return eta * np.asarray(d) + (eta * cos_i - cos_t) * np.asarray(n)


def _boundary_ior(direction, normal, medium):
    """volpath:635-641/:723-729: IOR pair by ray-normal sign."""
    ior = medium[3]
    if float(np.dot(direction, normal)) > 0.0:
        return ior, AIR_IOR
    return AIR_IOR, ior


def _sample_distance(medium, dist, state):
    """volpath:482-543. Returns (state, success, t, prob_fail,
    prob_success, transmittance)."""
    state, rand = _rng_next(state)
    ss, sa, _g, _ior = medium
    ext = ss + sa
    density = float(np.min(ext))

    weight = -1.0
    for i in range(3):
        with np.errstate(divide="ignore", invalid="ignore"):
            albedo = ss[i] / ext[i] if ext[i] != 0.0 else float("nan")
        if albedo > weight:
            weight = albedo
    if weight > 0:
        weight = max(weight, 0.5)

    if rand < weight:
        sampled = -math.log(1.0 - rand / weight) / density
    else:
        sampled = 500000.0  # no interaction

    if sampled < dist:
        t = sampled
        success = True
    else:
        sampled = dist
        t = dist
        success = False

    prob_fail = math.exp(-density * sampled)
    prob_success = density * prob_fail * weight
    prob_fail = weight * prob_fail + (1.0 - weight)
    trans = np.exp(-ext * sampled)
    if float(np.max(trans)) < 0.0001:
        trans = np.zeros(3)
    return state, success, t, prob_fail, prob_success, trans


def _phase_g(medium):
    """g = channel mean (volpath:438/:446)."""
    return float(np.sum(medium[2])) / 3.0


def _phase_eval(in_dir, out_dir, medium):
    g = _phase_g(medium)
    tmp = 1.0 + g * g + 2.0 * g * float(np.dot(in_dir, out_dir))
    return INV_FOURPI * (1.0 - g * g) / (tmp * math.sqrt(tmp))


def _phase_sample(in_dir, medium, state):
    """volpath:444-479. NB: divides by 2g verbatim — isotropic media
    (g == 0) are outside the oracle's domain, exactly like the GLSL."""
    g = _phase_g(medium)
    state, x = _rng_next(state)
    state, y = _rng_next(state)
    temp = (1.0 - g * g) / (1.0 - g + 2.0 * g * x)
    cos_theta = (1.0 + g * g - temp * temp) / (2.0 * g)
    sin_theta = math.sqrt(max(0.0, 1.0 - cos_theta * cos_theta))
    phi = TWOPI * y
    local = np.array(
        [sin_theta * math.cos(phi), sin_theta * math.sin(phi), cos_theta]
    )
    normal = -np.asarray(in_dir)
    if abs(normal[0]) > abs(normal[1]):
        inv = 1.0 / math.sqrt(normal[0] ** 2 + normal[2] ** 2)
        t = np.array([normal[2] * inv, 0.0, -normal[0] * inv])
    else:
        inv = 1.0 / math.sqrt(normal[1] ** 2 + normal[2] ** 2)
        t = np.array([0.0, normal[2] * inv, -normal[1] * inv])
    s = _cross(t, normal)
    world = s * local[0] + t * local[1] + normal * local[2]
    return state, world


def _diffuse_sample(wi, normal, state):
    """volpath:265-310. Returns (state, bsdf_scalar_or_None, wo)."""
    if float(np.dot(wi, normal)) <= 0.0:
        return state, None, None  # no draws (early return, volpath:267)
    state, a = _rng_next(state)
    state, b = _rng_next(state)
    r1 = 2.0 * a - 1.0
    r2 = 2.0 * b - 1.0
    if r1 == 0.0 and r2 == 0.0:
        phi, r = 0.0, 0.0
    elif r1 * r1 > r2 * r2:
        r = r1
        phi = (PI / 4.0) * (r2 / r1)
    else:
        r = r2
        phi = (PI / 2.0) - (r1 / r2) * (PI / 4.0)
    dx, dy = r * math.cos(phi), r * math.sin(phi)
    temp = 1.0 - dx * dx - dy * dy
    wo = np.array([dx, dy, math.sqrt(temp) if temp > 0.0 else 1e-10])
    return state, REFLECTANCE, wo


def _diffuse_eval(wi, wo, normal):
    """volpath:255-263: the frame-mixing quirk — `wo` is the LOCAL disk
    vector dotted against the WORLD normal, and the cosine is local wo.z."""
    if float(np.dot(wi, normal)) <= 0.0 or float(np.dot(wo, normal)) <= 0.0:
        return 0.0
    return REFLECTANCE * INV_PI * wo[2]


def _sample_direct_light(scene, point, light_pos, light_intensity):
    """volpath:337-426 verbatim, including the quirks: no attenuation on
    the segment from `point` to the first boundary; each boundary pair's
    segment attenuated by the FIRST boundary's medium; a flat 0.9 factor
    per pair; opaque (medium-less) hit anywhere -> fully occluded; an
    enter-hit whose paired exit query misses ends the march with the
    transmittance accumulated so far. Draws no RNG."""
    origin = np.asarray(point, np.float64)
    light_dir = np.asarray(light_pos) - origin
    light_dist = float(np.linalg.norm(light_dir))
    inv = 1.0 / light_dist
    light_value = np.asarray(light_intensity) * inv * inv
    light_dir = light_dir * inv
    transmittance = np.ones(3)

    while light_dist > 0.0:
        prim, t, u, v = scene.closest_hit(origin, light_dir, light_dist * 0.999)
        if prim is None:
            break  # lightDist = 0 (volpath:421)
        pos, _n, medium, _c = _hit_info(scene, prim, u, v)
        if medium is None:
            return np.zeros(3)  # fully occluded (volpath:372-376)
        light_dist -= t
        prim2, t2, u2, v2 = scene.closest_hit(pos, light_dir, light_dist)
        if prim2 is None:
            break  # lightDist = 0 (volpath:416)
        pos2, _n2, medium2, _c2 = _hit_info(scene, prim2, u2, v2)
        if medium2 is None:
            return np.zeros(3)  # (volpath:399-403)
        transmittance = transmittance * 0.9
        transmittance = transmittance * _transmittance(
            min(t2, light_dist), medium
        )
        origin = pos2
        light_dist -= t2
    return light_value * transmittance


def render_oracle(
    triangles,
    mat_ids,
    media_rows,
    scale,
    background,
    camera_pos,
    look_at,
    fov_deg,
    light_pos,
    light_intensity,
    width,
    height,
    num_samples,
    max_depth=MAX_DEPTH,
    rr_depth=RR_DEPTH,
):
    """volpath:564-805: per-pixel sequential PCG stream, per-sample
    bounce loop. Returns (H, W, 3) float64."""
    scene = _Scene(triangles, mat_ids, media_rows, scale, background)
    cam = np.asarray(camera_pos, np.float64)
    forward = _normalize(np.asarray(look_at, np.float64) - cam)
    right = _normalize(_cross(forward, np.array([0.0, 1.0, 0.0])))
    up = _normalize(_cross(right, forward))
    fov_rad = TWOPI - math.radians(fov_deg)
    light_i = np.asarray(light_intensity, np.float64)

    img = np.zeros((height, width, 3))
    for py in range(height):
        for px in range(width):
            state = (width * py + px) & 0xFFFFFFFF  # volpath:575
            summed = np.zeros(3)
            for _s in range(num_samples):
                state, j1 = _rng_next(state)
                state, j2 = _rng_next(state)
                u = (2.0 * (px + j1) - width) / height
                v = -(2.0 * (py + j2) - height) / height
                direction = _normalize(u * right + v * up + fov_rad * forward)
                origin = cam.copy()
                state, color = _trace_path(
                    scene, origin, direction, state, light_pos, light_i,
                    max_depth, rr_depth,
                )
                summed += color
            img[py, px] = summed / num_samples
    return img


def _trace_path(scene, origin, direction, state, light_pos, light_i,
                max_depth, rr_depth):
    """One path (volpath:606-798)."""
    accumulated = np.zeros(3)
    throughput = np.ones(3)
    depth = 0
    while depth < max_depth:
        prim, t, u, v = scene.closest_hit(origin, direction, T_MAX)
        if prim is None:
            break  # miss -> black (volpath:781-785)
        pos, normal, medium, color = _hit_info(scene, prim, u, v)

        killed = False
        if medium is not None:
            # Boundary event #1 (volpath:633-670).
            n1, n2 = _boundary_ior(direction, normal, medium)
            refract_dir = _refract(direction, normal, n1, n2)
            reflect_dir = _normalize(_reflect(direction, normal))
            fresnel, tir = _fresnel_r(n1, n2, direction, normal)
            state, rand = _rng_next(state)
            if not tir and rand < fresnel:
                # Reflect: pure boundary bounce, skips RR (volpath:648-654).
                direction = reflect_dir
                origin = pos
                depth += 1
                continue
            if tir:
                killed = True  # NaN direction in the GLSL; see module doc
            else:
                direction = _normalize(refract_dir)
            depth += 1

        # Distance to the medium end (volpath:674-688); closest-hit
        # semantics with a T_MAX miss sentinel (see module doc).
        dprim, dt, _du, _dv = scene.closest_hit(pos, direction, T_MAX)
        dist = dt if dprim is not None else T_MAX

        if medium is not None:
            state, success, ms_t, p_fail, p_success, trans = (
                _sample_distance(medium, dist, state)
            )
            if success and not killed:
                # Scatter (volpath:691-710).
                ss = medium[0]
                throughput = throughput * ss * trans / p_success
                light_value = _sample_direct_light(
                    scene, pos, light_pos, light_i
                )
                phase_eval = _phase_eval(-direction, np.zeros(3), medium)
                accumulated = (
                    accumulated + throughput * light_value * phase_eval
                )
                state, out_dir = _phase_sample(-direction, medium, state)
                direction = out_dir
                origin = pos + direction * ms_t
            else:
                # Pass-through (volpath:713-756), with the STALE entry
                # normal for boundary event #2.
                throughput = throughput * trans / p_fail
                origin = pos + direction * ms_t
                n1, n2 = _boundary_ior(direction, normal, medium)
                refract_dir = _refract(direction, normal, n1, n2)
                reflect_dir = _normalize(_reflect(direction, normal))
                fresnel, tir2 = _fresnel_r(n1, n2, direction, normal)
                state, rand = _rng_next(state)
                if killed:
                    break  # path died at boundary #1 (TIR)
                if not tir2 and rand < fresnel:
                    direction = reflect_dir
                elif tir2:
                    break  # NaN direction -> next traversal misses
                else:
                    direction = _normalize(refract_dir)
                depth += 1
                continue  # skips RR (volpath:755)
        else:
            # Diffuse surface (volpath:758-779).
            if float(np.dot(direction, normal)) > 0.0:
                break  # backface (volpath:761-764)
            state, bsdf, wo = _diffuse_sample(-direction, normal, state)
            if bsdf is None:
                break
            throughput = throughput * bsdf
            light_value = _sample_direct_light(scene, pos, light_pos, light_i)
            deval = _diffuse_eval(-direction, wo, normal)
            accumulated = (
                accumulated + throughput * light_value * deval * color
            )
            direction = _normalize(wo)  # local frame used as world
            origin = pos + direction * T_MIN

        depth += 1
        if depth > rr_depth:
            # Russian roulette (volpath:787-797).
            q = min(float(np.max(throughput)), 0.95)
            state, rand = _rng_next(state)
            if rand > q:
                break
            throughput = throughput / q
    return state, accumulated

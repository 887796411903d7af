"""Measure parallelogram/planar-quad pairing rates per scene.

The cluster tester's inner loop is statically unrolled over 128 slots;
merging two triangles that form a planar convex quad into ONE slot
halves the slot count wherever meshes are quad-tessellated (boxes,
floors, surface-of-revolution shells). This study answers, per scene:

- what fraction of triangles pair up under an EXACT parallelogram test
  (v3 == v0 + e1 + e2 to float tolerance), and
- what fraction under a general planar-convex-quad test (the (a, b)
  diagonal-coefficient encoding),

so we know whether the cheap parallelogram slot or the 2-extra-scalar
general-quad slot is worth building. Usage:

    python tools/study_quads.py [scene.obj ...]
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from complex_materials_renderer_tpu.scene.obj import parse_obj  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DEFAULT = [
    os.path.join(REPO, "scenes", s + ".obj")
    for s in ("showcase", "isobox", "gembox", "vessel")
]
for name in ("cup", "gem_corner", "stanford_dragon"):
    p = os.path.join(
        os.environ.get("CMR_REF_SCENES", "/root/reference/resources/scenes"),
        name + ".obj",
    )
    if os.path.exists(p):
        DEFAULT.append(p)


def pair_stats(tris: np.ndarray, mats: np.ndarray, rel_tol: float = 1e-5):
    """Greedy shared-edge pairing. Returns (n, parallelogram%, planar%)."""
    n = len(tris)
    extent = float(np.max(tris.max(axis=(0, 1)) - tris.min(axis=(0, 1))))
    tol = rel_tol * extent

    # edge key -> list of (tri, opposite-vertex index)
    edges: dict = {}
    for i, t in enumerate(tris):
        for k in range(3):
            a = tuple(t[k])
            b = tuple(t[(k + 1) % 3])
            key = (min(a, b), max(a, b))
            edges.setdefault(key, []).append((i, (k + 2) % 3))

    used = np.zeros(n, bool)
    par = 0
    planar = 0
    for key, lst in edges.items():
        if len(lst) != 2:
            continue
        (i, oi), (j, oj) = lst
        if used[i] or used[j] or mats[i] != mats[j]:
            continue
        # Quad = tri i's vertices + tri j's opposite vertex.
        ti, tj = tris[i], tris[j]
        v_op_i = ti[oi]
        v_op_j = tj[oj]
        e_a, e_b = key  # shared edge endpoints (as tuples)
        ea = np.array(e_a)
        eb = np.array(e_b)
        # Basis at the opposite vertex of tri i: quad is (v_op_i, ea,
        # v_op_j, eb) in order around the shared edge.
        e1 = ea - v_op_i
        e2 = eb - v_op_i
        nrm = np.cross(e1, e2)
        nn = np.linalg.norm(nrm)
        if nn < 1e-20:
            continue
        # Planarity: v_op_j distance to tri i's plane.
        d = abs(np.dot(v_op_j - v_op_i, nrm / nn))
        if d > tol:
            continue
        # Solve v_op_j = v_op_i + a*e1 + b*e2 (least squares in-plane).
        A = np.stack([e1, e2], axis=1)
        ab, *_ = np.linalg.lstsq(A, v_op_j - v_op_i, rcond=None)
        a, b = float(ab[0]), float(ab[1])
        # Convexity of quad (0,0) -> (1,0) -> (a,b) -> (0,1): needs
        # a > 0, b > 0 and a + b > 1 (diagonal point beyond the uv line).
        if not (a > 1e-6 and b > 1e-6 and a + b > 1.0 + 1e-6):
            continue
        planar += 2
        if abs(a - 1.0) < 1e-4 and abs(b - 1.0) < 1e-4:
            par += 2
        used[i] = used[j] = True
    return n, par / n * 100, planar / n * 100


def main(paths):
    print(f"{'scene':>18} {'tris':>8} {'parallelogram%':>15} {'planarquad%':>12}")
    for p in paths:
        mesh = parse_obj(p)
        tris = np.asarray(mesh.vertices, np.float32)[
            np.asarray(mesh.indices, np.int32)
        ]
        mats = np.asarray(mesh.material_ids, np.int32)
        n, pp, pl = pair_stats(tris, mats)
        print(f"{os.path.basename(p):>18} {n:>8} {pp:>14.1f}% {pl:>11.1f}%")


if __name__ == "__main__":
    main(sys.argv[1:] or DEFAULT)

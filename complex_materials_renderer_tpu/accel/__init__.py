"""Acceleration structures.

TPU-native replacement for the reference's driver-built BLAS/TLAS
(reference main.cpp:176-203, model.cpp:120-154): a binned-SAH BVH built at
scene load on the host, flattened into threaded (skip-link) SoA arrays so
device traversal needs only one node pointer per ray lane.
"""

from .bvh import FlatBVH, build_bvh

__all__ = ["FlatBVH", "build_bvh"]

"""Ray-geometry kernels: the TPU-native replacement for the reference's
hardware ray queries (VK_KHR_ray_query, reference volpath.comp.glsl:612-627
and main.cpp:176-203 acceleration-structure build).

Traversal here is wavefront-vectorized over rays with uniform control flow
(threaded BVH, one node pointer per lane) rather than a per-thread stack —
the shape that keeps VPU lanes dense.
"""

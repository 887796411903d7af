"""Multi-device execution: tile + sample sharding over a jax Mesh.

The reference has exactly one axis of parallelism — a single 60x34
workgroup dispatch on one GPU (main.cpp:330-331). The TPU-native scaling
story (SURVEY §2 parallelism inventory) is data parallelism over image
tiles and samples: shard the framebuffer's rows across the mesh with
shard_map (zero communication during tracing), optionally split samples
over a second mesh axis and psum the partial framebuffers over ICI.
"""

from .sharding import make_render_mesh, render_beauty_sharded

__all__ = ["make_render_mesh", "render_beauty_sharded"]

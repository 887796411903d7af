"""Scene I/O: Wavefront .obj/.mtl geometry and the companion media .json.

Replaces the reference's scene layer (tinyobjloader + nlohmann::json +
Model class, reference main.cpp:141-148 and model.cpp:16-118) with numpy
parsers producing SoA arrays ready for device upload.
"""

from .scene import Scene, load_scene
from .media import load_media_json, pack_media_buffer

__all__ = ["Scene", "load_scene", "load_media_json", "pack_media_buffer"]

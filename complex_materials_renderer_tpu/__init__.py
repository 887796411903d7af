"""complex_materials_renderer_tpu — a TPU-native Monte-Carlo volumetric path tracer.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of the
``complex_materials_renderer`` reference (Vulkan ray-query + GLSL compute
megakernel, see reference source/main.cpp and
source/shaders/volpath.comp.glsl): .obj/.mtl/.json scene pipeline,
participating-media path tracing (Fresnel boundaries, Henyey-Greenstein
phase, analog free-flight sampling, next-event estimation through media),
debug AOVs, and Radiance .hdr output — re-architected as a wavefront
integrator over a threaded BVH, sharded across TPU meshes.
"""

__version__ = "0.1.0"

from .config import RenderOptions

__all__ = ["RenderOptions", "__version__"]

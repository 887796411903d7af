"""Rendering: hit-info derivation, AOV passes, and the wavefront
volumetric-path-tracing integrator (the TPU-native restructuring of the
reference GLSL megakernel, volpath.comp.glsl:564-805)."""

from .integrator import render_beauty
from .aov import render_aov

__all__ = ["render_beauty", "render_aov"]

"""Vectorized physics ops: the TPU-native re-derivations of the reference's
GLSL device functions (reference source/shaders/volpath.comp.glsl).

Every op is a pure function over batched lanes so it fuses into the
wavefront integrator under jit; none hold state.
"""

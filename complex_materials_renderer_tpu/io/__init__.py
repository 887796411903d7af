"""Image I/O: Radiance .hdr output (and reading, for round-trip tests).

Replaces stb_image_write's HDR path (reference main.cpp:36-37, 386-390).
"""

from .hdr import read_hdr, write_hdr

__all__ = ["read_hdr", "write_hdr"]

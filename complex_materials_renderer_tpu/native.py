"""ctypes bindings for the native host runtime (native/cmr_native.cpp).

The reference's host layer is C++ (tinyobjloader, the driver's AS builder,
stb_image_write); these bindings expose the rebuild's native equivalents —
OBJ parsing, binned-SAH BVH build, .hdr writing — with pure-Python
fallbacks everywhere, so the framework works even where the shared library
cannot be built. The library is compiled on first use (make, ~seconds) and
cached next to the source.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "native")
_SO_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "cmr_native.so"))

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-s"],
            cwd=os.path.abspath(_NATIVE_DIR),
            check=True,
            capture_output=True,
            timeout=120,
        )
        return os.path.exists(_SO_PATH)
    except Exception:
        return False


def load() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None on failure."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if os.environ.get("CMR_NO_NATIVE"):
            return None
        if not os.path.exists(_SO_PATH) and not _build():
            return None
        try:
            lib = ctypes.CDLL(_SO_PATH)
        except OSError:
            return None

        c_float_p = ctypes.POINTER(ctypes.c_float)
        c_int_p = ctypes.POINTER(ctypes.c_int)

        lib.cmr_free.argtypes = [ctypes.c_void_p]
        lib.cmr_parse_obj.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(c_float_p), c_int_p,
            ctypes.POINTER(c_int_p), c_int_p,
            ctypes.POINTER(c_int_p),
            ctypes.POINTER(ctypes.c_char_p), c_int_p,
        ]
        lib.cmr_parse_obj.restype = ctypes.c_int
        lib.cmr_build_bvh.argtypes = [
            c_float_p, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(c_float_p), ctypes.POINTER(c_float_p),
            ctypes.POINTER(c_int_p), ctypes.POINTER(c_int_p),
            ctypes.POINTER(c_int_p), ctypes.POINTER(c_int_p),
            ctypes.POINTER(c_int_p), c_int_p,
        ]
        lib.cmr_build_bvh.restype = ctypes.c_int
        lib.cmr_write_hdr.argtypes = [
            ctypes.c_char_p, c_float_p, ctypes.c_int, ctypes.c_int
        ]
        lib.cmr_write_hdr.restype = ctypes.c_int

        _lib = lib
        return _lib


def _take_array(lib, ptr, shape, dtype):
    """Copy a malloc'd buffer into numpy and free it."""
    count = int(np.prod(shape))
    ctype = ctypes.c_float if dtype == np.float32 else ctypes.c_int
    arr = np.ctypeslib.as_array(
        ctypes.cast(ptr, ctypes.POINTER(ctype)), shape=(count,)
    ).copy()
    lib.cmr_free(ptr)
    return arr.astype(dtype, copy=False).reshape(shape)


def parse_obj(path: str):
    """Native OBJ parse; returns (vertices, indices, mat_ids, names) or
    None if the native library is unavailable."""
    lib = load()
    if lib is None:
        return None
    c_float_p = ctypes.POINTER(ctypes.c_float)
    c_int_p = ctypes.POINTER(ctypes.c_int)
    verts_p = c_float_p()
    idx_p = c_int_p()
    mat_p = c_int_p()
    names_p = ctypes.c_char_p()
    nverts = ctypes.c_int()
    ntris = ctypes.c_int()
    nmats = ctypes.c_int()
    rc = lib.cmr_parse_obj(
        path.encode(),
        ctypes.byref(verts_p), ctypes.byref(nverts),
        ctypes.byref(idx_p), ctypes.byref(ntris),
        ctypes.byref(mat_p),
        ctypes.byref(names_p), ctypes.byref(nmats),
    )
    if rc != 0:
        return None
    vertices = _take_array(lib, verts_p, (nverts.value, 3), np.float32)
    indices = _take_array(lib, idx_p, (ntris.value, 3), np.int32)
    mat_ids = _take_array(lib, mat_p, (ntris.value,), np.int32)
    blob = ctypes.cast(names_p, ctypes.c_void_p)
    names: List[str] = []
    # '\0'-joined names, double-'\0' terminated — walk manually.
    offset = 0
    for _ in range(nmats.value):
        s = ctypes.string_at(ctypes.c_void_p(blob.value + offset))
        names.append(s.decode(errors="replace"))
        offset += len(s) + 1
    lib.cmr_free(blob)
    return vertices, indices, mat_ids, names


def build_bvh(triangles: np.ndarray, leaf_size: int = 4):
    """Native binned-SAH threaded-BVH build; returns the FlatBVH field
    tuple (bmin, bmax, left, count, miss, tri_order) or None."""
    lib = load()
    if lib is None:
        return None
    tris = np.ascontiguousarray(triangles, np.float32)
    num_tris = tris.shape[0]
    c_float_p = ctypes.POINTER(ctypes.c_float)
    c_int_p = ctypes.POINTER(ctypes.c_int)
    bmin_p = c_float_p()
    bmax_p = c_float_p()
    left_p = c_int_p()
    count_p = c_int_p()
    miss_p = c_int_p()
    right_p = c_int_p()
    order_p = c_int_p()
    n_nodes = ctypes.c_int()
    rc = lib.cmr_build_bvh(
        tris.ctypes.data_as(c_float_p), num_tris, leaf_size,
        ctypes.byref(bmin_p), ctypes.byref(bmax_p),
        ctypes.byref(left_p), ctypes.byref(count_p),
        ctypes.byref(miss_p), ctypes.byref(right_p),
        ctypes.byref(order_p), ctypes.byref(n_nodes),
    )
    if rc != 0:
        return None
    n = n_nodes.value
    bmin = _take_array(lib, bmin_p, (n, 3), np.float32)
    bmax = _take_array(lib, bmax_p, (n, 3), np.float32)
    left = _take_array(lib, left_p, (n,), np.int32)
    count = _take_array(lib, count_p, (n,), np.int32)
    miss = _take_array(lib, miss_p, (n,), np.int32)
    _take_array(lib, right_p, (n,), np.int32)  # right links (future use)
    order = _take_array(lib, order_p, (num_tris,), np.int32)
    return bmin, bmax, left, count, miss, order


def write_hdr(path: str, image: np.ndarray) -> bool:
    lib = load()
    if lib is None:
        return False
    img = np.ascontiguousarray(image[..., :3], np.float32)
    h, w = img.shape[:2]
    rc = lib.cmr_write_hdr(
        path.encode(), img.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), w, h
    )
    return rc == 0

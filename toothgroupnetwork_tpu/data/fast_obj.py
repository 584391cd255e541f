"""ctypes binding to the native C++ .obj parser (native/fast_obj.cpp).

The parser is the usual preprocessing bottleneck (the reference flags obj loading with
"TODO slow processing speed", inference_pipeline_tgn.py:26). The native library is
optional: ``parse_obj_fast`` returns None when it isn't built, and callers fall back to
the numpy parser.

Build: ``make -C native`` (produces native/libfast_obj.so).
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None
_TRIED = False


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    here = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    path = os.path.join(here, "native", "libfast_obj.so")
    if not os.path.exists(path):
        return None
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        return None
    lib.fast_obj_parse.restype = ctypes.c_void_p
    lib.fast_obj_parse.argtypes = [ctypes.c_char_p]
    lib.fast_obj_nverts.restype = ctypes.c_long
    lib.fast_obj_nverts.argtypes = [ctypes.c_void_p]
    lib.fast_obj_nfaces.restype = ctypes.c_long
    lib.fast_obj_nfaces.argtypes = [ctypes.c_void_p]
    lib.fast_obj_copy.restype = None
    lib.fast_obj_copy.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p]
    lib.fast_obj_free.restype = None
    lib.fast_obj_free.argtypes = [ctypes.c_void_p]
    _LIB = lib
    return lib


def parse_obj_fast(path: str):
    """Parse with the native library; returns (vertices, faces) or None."""
    lib = _load()
    if lib is None:
        return None
    handle = lib.fast_obj_parse(path.encode())
    if not handle:
        return None
    try:
        nv = lib.fast_obj_nverts(handle)
        nf = lib.fast_obj_nfaces(handle)
        verts = np.empty((nv, 3), dtype=np.float64)
        faces = np.empty((nf, 3), dtype=np.int64)
        lib.fast_obj_copy(
            handle,
            verts.ctypes.data_as(ctypes.c_void_p),
            faces.ctypes.data_as(ctypes.c_void_p),
        )
    finally:
        lib.fast_obj_free(handle)
    return verts, faces

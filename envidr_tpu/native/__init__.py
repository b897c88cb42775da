"""Native (C++) host-side runtime components, loaded via ctypes.

Counterpart of the reference's C++ extension layer (its mesh extraction runs
through PyMCubes' C++ core).  Modules build on first use with g++ and fall
back to the pure-numpy implementations when no toolchain is present.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libmtets.so")
_lib = None


class _MtResult(ctypes.Structure):
    _fields_ = [
        ("verts", ctypes.POINTER(ctypes.c_double)),
        ("faces", ctypes.POINTER(ctypes.c_int64)),
        ("n_verts", ctypes.c_int64),
        ("n_faces", ctypes.c_int64),
    ]


def _build() -> bool:
    src = os.path.join(_DIR, "mtets.cpp")
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", src, "-o", _LIB_PATH],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception as e:  # no toolchain / build failure -> numpy fallback
        print(f"[native] mtets build failed ({e}); using numpy fallback",
              file=sys.stderr)
        return False


def load_mtets():
    """Returns the ctypes lib or None (caller falls back to numpy)."""
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) and not _build():
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        lib.marching_tets.restype = ctypes.POINTER(_MtResult)
        lib.marching_tets.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_float]
        lib.free_result.argtypes = [ctypes.POINTER(_MtResult)]
        _lib = lib
        return lib
    except OSError:
        return None


def marching_tets_native(field, iso: float = 0.0):
    """field: [R, R, R] float32 numpy -> (verts [V,3] f64, faces [F,3] i64)
    or None if the native lib is unavailable."""
    import numpy as np

    lib = load_mtets()
    if lib is None:
        return None
    f = np.ascontiguousarray(field, np.float32)
    R = f.shape[0]
    res = lib.marching_tets(
        f.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), R, float(iso))
    try:
        nv, nf = res.contents.n_verts, res.contents.n_faces
        verts = np.ctypeslib.as_array(res.contents.verts, (nv, 3)).copy()
        faces = np.ctypeslib.as_array(res.contents.faces, (nf, 3)).copy()
    finally:
        lib.free_result(res)
    return verts, faces

"""Native (C++) host runtime: oriented 3D IoU for the AP evaluator.

Builds ``libiou3d_host.so`` on first use with g++ (baked into the image) and
binds it via ctypes — no pybind11 dependency. Falls back silently to the
NumPy implementation when no compiler is available; ``get_iou_func()``
returns whichever is active.
"""
import ctypes
import os
import subprocess
import tempfile

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "iou3d_host.cc")
_LIB = os.path.join(_HERE, "libiou3d_host.so")
_lib = None
_load_failed = False


def _build():
    # temp file + atomic rename: concurrent first-use from fork/spawn
    # workers (eval pool, loader processes) must not observe a half-written
    # .so.
    fd, tmp = tempfile.mkstemp(suffix=".so", dir=_HERE)
    os.close(fd)
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-o", tmp, _SRC],
            check=True, capture_output=True,
        )
        os.replace(tmp, _LIB)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def load():
    """Returns the ctypes lib, building it if needed; None if unavailable."""
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    try:
        if not os.path.exists(_LIB) or (
            os.path.getmtime(_LIB) < os.path.getmtime(_SRC)
        ):
            _build()
        lib = ctypes.CDLL(_LIB)
        lib.box3d_iou_pair.restype = ctypes.c_float
        lib.box3d_iou_pair.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.box3d_iou_matrix.restype = None
        lib.box3d_iou_matrix.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ctypes.POINTER(ctypes.c_float),
        ]
        _lib = lib
    except Exception:
        _load_failed = True
    return _lib


def _as_f32(a):
    return np.ascontiguousarray(a, dtype=np.float32)


def box3d_iou_native(corners1, corners2):
    """(8,3) x (8,3) -> (iou3d, iou_bev); None if the lib is unavailable."""
    lib = load()
    if lib is None:
        return None
    c1 = _as_f32(corners1)
    c2 = _as_f32(corners2)
    bev = ctypes.c_float(0.0)
    iou = lib.box3d_iou_pair(
        c1.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        c2.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.byref(bev),
    )
    return float(iou), float(bev.value)


def box3d_iou_matrix_native(corners_a, corners_b):
    """(na,8,3) x (nb,8,3) -> (na, nb) float32; None if lib unavailable."""
    lib = load()
    if lib is None:
        return None
    a = _as_f32(corners_a)
    b = _as_f32(corners_b)
    na, nb = a.shape[0], b.shape[0]
    out = np.empty((na, nb), dtype=np.float32)
    lib.box3d_iou_matrix(
        a.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), na,
        b.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), nb,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out

"""ctypes binding for the native coding runtime (coding/cpp/coder.cpp).

Builds the shared library on first use with g++ (pybind11 is not part
of the environment; the C ABI + ctypes keeps the binding dependency-free).
A pure-numpy rANS fallback exists for environments without a compiler
(slow; used only if the build fails).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "cpp", "coder.cpp")
_LIB_PATH = os.path.join(_HERE, "cpp", "libcoder.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None


def _build() -> None:
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-o", _LIB_PATH, _SRC]
    subprocess.run(cmd, check=True, capture_output=True)


def get_lib() -> ctypes.CDLL:
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_LIB_PATH) or os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC):
            _build()
        lib = ctypes.CDLL(_LIB_PATH)
        i32p = ctypes.POINTER(ctypes.c_int32)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.rans_encode.restype = ctypes.c_int
        lib.rans_encode.argtypes = [i32p, i32p, ctypes.c_int, i32p, ctypes.c_int,
                                    i32p, i32p, u8p, ctypes.c_int]
        lib.rans_decode.restype = ctypes.c_int
        lib.rans_decode.argtypes = [u8p, ctypes.c_int, i32p, ctypes.c_int, i32p,
                                    ctypes.c_int, i32p, i32p, i32p]
        lib.octree_encode.restype = ctypes.c_int
        lib.octree_encode.argtypes = [i32p, ctypes.c_int, ctypes.c_int, u8p, ctypes.c_int]
        lib.octree_decode.restype = ctypes.c_int
        lib.octree_decode.argtypes = [u8p, ctypes.c_int, ctypes.c_int, i32p, ctypes.c_int]
        _lib = lib
        return lib


def _i32(a: np.ndarray):
    a = np.ascontiguousarray(a, np.int32)
    return a, a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def rans_encode(values: np.ndarray, indexes: np.ndarray, tables) -> bytes:
    """Encode int32 coded values with per-element CDF contexts.

    tables: models.entropy.CodecTables. value -> symbol via
    ``value - tables.offsets[index]``; out-of-support symbols go through
    the escape+bypass path.
    """
    lib = get_lib()
    values, vp = _i32(values.ravel())
    indexes, ip = _i32(indexes.ravel())
    cdfs, cp = _i32(tables.cdfs)
    lens, lp = _i32(tables.lengths)
    offs, op = _i32(tables.offsets)
    n = values.size
    cap = max(1024, n * 8)
    out = np.empty(cap, np.uint8)
    nbytes = lib.rans_encode(vp, ip, n, cp, tables.cdfs.shape[1], lp, op,
                             out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), cap)
    if nbytes < 0:
        raise RuntimeError("rans_encode failed (buffer overflow?)")
    return out[:nbytes].tobytes()


def rans_decode(data: bytes, indexes: np.ndarray, tables) -> np.ndarray:
    lib = get_lib()
    indexes, ip = _i32(indexes.ravel())
    cdfs, cp = _i32(tables.cdfs)
    lens, lp = _i32(tables.lengths)
    offs, op = _i32(tables.offsets)
    n = indexes.size
    buf = np.frombuffer(data, np.uint8)
    out = np.empty(n, np.int32)
    rc = lib.rans_decode(buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(data),
                         ip, n, cp, tables.cdfs.shape[1], lp, op,
                         out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    if rc != 0:
        raise RuntimeError(f"rans_decode failed ({rc})")
    return out


def octree_encode(coords: np.ndarray, depth: int) -> bytes:
    """Losslessly encode unique voxel coords in [0, 2**depth)^3."""
    lib = get_lib()
    coords, cp = _i32(coords.reshape(-1, 3))
    n = coords.shape[0]
    cap = max(4096, n * 8)
    out = np.empty(cap, np.uint8)
    nbytes = lib.octree_encode(cp, n, depth,
                               out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), cap)
    if nbytes < 0:
        raise RuntimeError("octree_encode failed")
    return out[:nbytes].tobytes()


def octree_decode(data: bytes, depth: int, max_points: int) -> np.ndarray:
    lib = get_lib()
    buf = np.frombuffer(data, np.uint8)
    out = np.empty((max_points, 3), np.int32)
    n = lib.octree_decode(buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(data),
                          depth, out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                          max_points)
    if n < 0:
        raise RuntimeError("octree_decode failed (capacity?)")
    return out[:n].copy()

"""ctypes bindings for the C++ geometry kernels.

Builds origami_tpu/geometry/native/liborigami_native.so on first use
(make; g++) — the cppimport-style on-demand build of the reference's
concaveman module, without pybind11. All callers fall back to the pure
Python/numpy implementations when the toolchain is unavailable.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_DIR = Path(__file__).parent / "native"
_LIB = None
_TRIED = False


def _load():
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    so = _DIR / "liborigami_native.so"
    if not so.exists():
        try:
            subprocess.run(["make", "-C", str(_DIR)], check=True,
                           capture_output=True)
        except (subprocess.CalledProcessError, FileNotFoundError):
            return None
    try:
        lib = ctypes.CDLL(str(so))
    except OSError:
        return None
    lib.concave_hull.restype = ctypes.c_int
    lib.concave_hull.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_int,
        ctypes.POINTER(ctypes.c_int), ctypes.c_int,
        ctypes.c_double, ctypes.c_double,
        ctypes.POINTER(ctypes.c_int), ctypes.c_int]
    lib.trace_skeleton.restype = ctypes.c_int
    lib.trace_skeleton.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int]
    _LIB = lib
    return lib


def available():
    return _load() is not None


def concave_hull_native(points, concavity, length_threshold):
    """(N, 2) float64 points -> (M, 2) hull ring, or None on failure."""
    lib = _load()
    if lib is None:
        return None
    pts = np.ascontiguousarray(points, dtype=np.float64)
    import scipy.spatial
    hull = scipy.spatial.ConvexHull(pts)
    hidx = np.ascontiguousarray(hull.vertices, dtype=np.int32)
    max_out = len(pts) + 8
    out = np.zeros(max_out, dtype=np.int32)
    m = lib.concave_hull(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), len(pts),
        hidx.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), len(hidx),
        float(concavity), float(length_threshold),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), max_out)
    if m < 3:
        return None
    return pts[out[:m]]


def trace_skeleton_native(skel):
    """(H, W) bool mask -> list of (N_i,) pixel-index paths, or None."""
    lib = _load()
    if lib is None:
        return None
    sk = np.ascontiguousarray(skel, dtype=np.uint8)
    h, w = sk.shape
    n_px = int(sk.sum())
    path_cap = max(16, n_px * 8 + 64)
    off_cap = max(16, n_px + 8)
    data = np.zeros(path_cap, dtype=np.int32)
    offs = np.zeros(off_cap, dtype=np.int32)
    n = lib.trace_skeleton(
        sk.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w,
        data.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), path_cap,
        offs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), off_cap)
    if n < 0:
        return None
    return [data[offs[i]: offs[i + 1]] for i in range(n)]

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
    # run make UNCONDITIONALLY: the target is dependency-checked (a
    # no-op when fresh), and a prebuilt .so predating newly added
    # symbols (douglas_peucker, chamfer_edt, ...) would otherwise make
    # the _bind_* helpers raise AttributeError instead of the callers
    # falling back to Python (ADVICE r4)
    try:
        subprocess.run(["make", "-C", str(_DIR)], check=True,
                       capture_output=True)
    except (subprocess.CalledProcessError, FileNotFoundError):
        if not so.exists():
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


def _bind_overlay(lib):
    if getattr(lib, "_overlay_bound", False):
        return
    lib.polygon_overlay.restype = ctypes.c_int
    lib.polygon_overlay.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int), ctypes.c_int, ctypes.c_int,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_double), ctypes.c_int,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.c_int]
    lib._overlay_bound = True


_OP_CODES = {"and": 0, "or": 1, "diff": 2, "xor": 3, "any": 4}


def polygon_overlay_native(ring_groups, op):
    """ring_groups: list of ring-lists ((N,2) float arrays); op in
    {"and","or","diff","xor","any"}. Returns [(shell, holes), ...] as
    float64 arrays, or None when the native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    _bind_overlay(lib)
    rings = []
    groups = []
    for gi, rg in enumerate(ring_groups):
        for r in rg:
            c = np.asarray(r, np.float64)
            if len(c) >= 2:
                # drop an explicit closing point (cheap scalar compare;
                # np.allclose here was ~0.1 ms/ring of pure overhead)
                d0 = c[0, 0] - c[-1, 0]
                d1 = c[0, 1] - c[-1, 1]
                if -1e-8 < d0 < 1e-8 and -1e-8 < d1 < 1e-8:
                    c = c[:-1]
            if len(c) >= 3:
                rings.append(c)
                groups.append(gi)
    if not rings:
        return []
    coords = np.concatenate(rings, axis=0).reshape(-1)
    if not coords.flags.c_contiguous:
        coords = np.ascontiguousarray(coords)
    sizes = np.asarray([len(r) for r in rings], np.int32)
    garr = np.asarray(groups, np.int32)
    n_pts = int(sizes.sum())

    cap_c = max(8 * 2 * n_pts, 4096)
    cap_r = max(8 * len(rings) + 64, 256)
    for _ in range(4):
        out_c = np.empty(cap_c, np.float64)
        out_s = np.empty(cap_r, np.int32)
        out_p = np.empty(cap_r, np.int32)
        m = lib.polygon_overlay(
            coords.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            sizes.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            garr.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            len(rings), len(ring_groups), _OP_CODES[op],
            out_c.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            cap_c,
            out_s.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            out_p.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            cap_r)
        if m >= 0:
            break
        cap_c *= 4
        cap_r *= 4
    else:
        return None
    polys = {}
    off = 0
    for i in range(m):
        n = int(out_s[i])
        ring = out_c[2 * off: 2 * (off + n)].reshape(n, 2).copy()
        off += n
        pid = int(out_p[i])
        if pid not in polys:
            polys[pid] = (ring, [])
        else:
            polys[pid][1].append(ring)
    return [polys[k] for k in sorted(polys)]


def _bind(binder, lib):
    """Run a _bind_* helper; False when the loaded .so predates the
    symbol (stale build) so callers fall back to Python (ADVICE r4)."""
    try:
        binder(lib)
        return True
    except AttributeError:
        return False


def _bind_dist(lib):
    if getattr(lib, "_dist_bound", False):
        return
    lib.min_seg_dist.restype = ctypes.c_double
    lib.min_seg_dist.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_int,
        ctypes.POINTER(ctypes.c_double), ctypes.c_int,
        ctypes.c_double]
    lib._dist_bound = True


def min_seg_dist_native(segs_a, segs_b, cutoff=0.0):
    """Minimum distance between two (N,4) segment sets, or None when
    the native library is unavailable. `cutoff` allows early exit as
    soon as any pair is at most that close."""
    lib = _load()
    if lib is None:
        return None
    if not _bind(_bind_dist, lib):
        return None
    sa = np.ascontiguousarray(segs_a, np.float64)
    sb = np.ascontiguousarray(segs_b, np.float64)
    return float(lib.min_seg_dist(
        sa.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), len(sa),
        sb.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), len(sb),
        float(cutoff)))


def _bind_thin(lib):
    if getattr(lib, "_thin_bound", False):
        return
    lib.thin_mask.restype = ctypes.c_int
    lib.thin_mask.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
        ctypes.c_int]
    lib.chamfer_edt.restype = None
    lib.chamfer_edt.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float)]
    lib._thin_bound = True


def thin_mask_native(mask, max_iter=128):
    """Zhang-Suen thin a bool mask on host; None when the native
    library is unavailable. Matches ops/morphology.skeletonize."""
    lib = _load()
    if lib is None:
        return None
    if not _bind(_bind_thin, lib):
        return None
    img = np.ascontiguousarray(mask, np.uint8)
    img = (img > 0).astype(np.uint8)
    h, w = img.shape
    lib.thin_mask(img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                  h, w, int(max_iter))
    return img > 0


def chamfer_edt_native(mask):
    """City-block distance to the nearest set pixel of `mask`; None
    when the native library is unavailable. Matches
    ops/morphology.label_edt."""
    lib = _load()
    if lib is None:
        return None
    if not _bind(_bind_thin, lib):
        return None
    src = (np.ascontiguousarray(mask, np.uint8) > 0).astype(np.uint8)
    h, w = src.shape
    out = np.empty((h, w), np.float32)
    lib.chamfer_edt(src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                    h, w, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out


def _bind_dp(lib):
    if getattr(lib, "_dp_bound", False):
        return
    lib.douglas_peucker.restype = None
    lib.douglas_peucker.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_int, ctypes.c_double,
        ctypes.POINTER(ctypes.c_uint8)]
    lib._dp_bound = True


def douglas_peucker_native(coords, tol):
    """Keep-mask of Douglas-Peucker simplification over an open chain
    (N, 2); None when the native library is unavailable. Matches
    geometry/poly._douglas_peucker."""
    lib = _load()
    if lib is None:
        return None
    if not _bind(_bind_dp, lib):
        return None
    c = np.ascontiguousarray(coords, np.float64)
    n = len(c)
    keep = np.empty(n, np.uint8)
    lib.douglas_peucker(
        c.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), n,
        float(tol), keep.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return keep > 0

"""C++ native kernel tests (build with make on demand)."""

import numpy as np
import pytest

from origami_tpu.geometry import native_bindings as nb


requires_native = pytest.mark.skipif(
    not nb.available(), reason="native toolchain unavailable")


@requires_native
def test_native_concave_hull_matches_python_shape():
    pts = []
    for x in np.linspace(0, 10, 30):
        for y in np.linspace(0, 10, 30):
            if not (x > 4 and 2 < y < 8):
                pts.append((x, y))
    pts = np.unique(np.array(pts), axis=0)
    ring = nb.concave_hull_native(pts, 1.0, 0.5)
    assert ring is not None and len(ring) >= 4
    from origami_tpu import geometry as G
    poly = G.Polygon(ring)
    assert poly.area < 90.0   # dug into the notch
    assert poly.area > 30.0


@requires_native
def test_native_concave_hull_large_set_fast():
    # performance class: the k-d tree + FIFO dig must stay near-linear;
    # the old O(rounds * E * n) scan took minutes on this input
    import time
    rng = np.random.default_rng(7)
    pts = rng.uniform(0, 1000, size=(30000, 2))
    pts = pts[~(((pts[:, 0] % 200) < 100) & (pts[:, 1] > 300))]
    t0 = time.perf_counter()
    ring = nb.concave_hull_native(pts, 2.0, 0.0)
    dt = time.perf_counter() - t0
    assert ring is not None and len(ring) >= 100
    assert dt < 5.0, dt
    from origami_tpu import geometry as G
    poly = G.Polygon(ring)
    assert poly.is_valid
    # hull digs the 100-px-wide slots: well under the convex area
    assert poly.area < 0.93 * 1000 * 1000


@requires_native
def test_native_trace_skeleton():
    sk = np.zeros((20, 40), np.uint8)
    sk[10, 2:38] = 1                     # straight line
    paths = nb.trace_skeleton_native(sk)
    assert paths is not None
    assert len(paths) == 1
    path = paths[0]
    assert len(path) == 36
    ys, xs = path // 40, path % 40
    assert set(ys) == {10}
    assert xs[0] in (2, 37) and xs[-1] in (2, 37)


@requires_native
def test_native_trace_junction():
    sk = np.zeros((21, 21), np.uint8)
    sk[10, 2:19] = 1
    sk[2:19, 10] = 1                     # cross
    paths = nb.trace_skeleton_native(sk)
    assert paths is not None
    # four long arms plus short edges inside the 8-connected junction
    # cluster (pixels next to the crossing all have degree != 2)
    arms = [p for p in paths if len(p) >= 7]
    assert len(arms) == 4
    assert all(len(p) <= 10 for p in arms)


@requires_native
def test_native_used_by_estimate_polyline():
    from origami_tpu.core.polyline import estimate_polyline
    from origami_tpu.core.math import Orientation
    mask = np.zeros((40, 120), np.uint8)
    mask[18:22, 5:115] = 1
    pl = estimate_polyline(mask, Orientation.H)
    assert pl is not None
    c = pl.np_coords
    assert c[0, 0] < c[-1, 0]
    assert abs(c[0, 0] - 5) < 6 and abs(c[-1, 0] - 114) < 6

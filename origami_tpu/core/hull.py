"""Concave hulls (concaveman-style) with a pure-Python default and an
optional C++ fast path.

The reference ships a pybind11 C++ concaveman (Mapbox algorithm) used by
layout concave dilation (origami/concaveman/, layout.py:688-710). The
same contract is provided here: `concave_hull(points, concavity,
length_threshold)` starting from the convex hull and digging in edges
whose nearest interior point is closer than edge_length / concavity.
`origami_tpu.geometry.native` provides the C++ implementation (built
with make); this module falls back to numpy if the shared library is
absent.
"""

from __future__ import annotations

import numpy as np


def _try_native():
    try:
        from origami_tpu.geometry.native_bindings import (
            available, concave_hull_native)
        return concave_hull_native if available() else None
    except Exception:
        return None


def concave_hull(points, concavity=2.0, length_threshold=0.0):
    """Concave hull of a 2-D point set. Returns (M, 2) hull coordinates
    in order."""
    points = np.asarray(points, dtype=np.float64).reshape(-1, 2)
    points = np.unique(points, axis=0)
    if len(points) < 4:
        return points
    native = _try_native()
    if native is not None:
        ring = native(points, concavity, length_threshold)
        if ring is not None:
            return ring
    return _concave_hull_py(points, concavity, length_threshold)


def _concave_hull_py(points, concavity, length_threshold):
    import scipy.spatial
    hull = scipy.spatial.ConvexHull(points)
    hull_idx = list(hull.vertices)
    in_hull = set(hull_idx)
    interior = np.array([i for i in range(len(points))
                         if i not in in_hull])

    # edge queue: process longest edges first
    edges = [(hull_idx[i], hull_idx[(i + 1) % len(hull_idx)])
             for i in range(len(hull_idx))]
    result = list(edges)
    used = set(hull_idx)

    def seg_dists(p, segs_a, segs_b):
        ab = segs_b - segs_a
        L2 = np.maximum(np.sum(ab * ab, axis=1), 1e-12)
        t = np.clip(np.sum((p - segs_a) * ab, axis=1) / L2, 0, 1)
        proj = segs_a + t[:, None] * ab
        return np.linalg.norm(p - proj, axis=1)

    changed = True
    max_rounds = 256
    while changed and max_rounds > 0 and len(interior):
        max_rounds -= 1
        changed = False
        new_result = []
        edges_a = np.array([points[a] for a, _ in result])
        edges_b = np.array([points[b] for _, b in result])
        for ei, (a, b) in enumerate(result):
            pa, pb = points[a], points[b]
            elen = np.linalg.norm(pb - pa)
            if elen < length_threshold:
                new_result.append((a, b))
                continue
            cand = interior[[i not in used for i in interior]]
            if len(cand) == 0:
                new_result.append((a, b))
                continue
            # distance from candidates to this edge
            ab = pb - pa
            L2 = max(float(ab @ ab), 1e-12)
            t = np.clip((points[cand] - pa) @ ab / L2, 0, 1)
            proj = pa + t[:, None] * ab
            d = np.linalg.norm(points[cand] - proj, axis=1)
            k = int(np.argmin(d))
            dd = d[k]
            # concaveman criteria: edge long relative to the candidate's
            # distance AND the candidate is closer to this edge than to
            # every other hull edge (prevents spiraling digs); dd ~ 0
            # inserts collinear boundary points to refine the edge
            if elen / max(dd, 1e-9) > concavity:
                c = int(cand[k])
                others = seg_dists(points[c], edges_a, edges_b)
                others[ei] = np.inf
                if dd <= others.min() + 1e-9:
                    new_result.append((a, c))
                    new_result.append((c, b))
                    used.add(c)
                    changed = True
                    continue
            new_result.append((a, b))
        result = new_result

    # `result` stays in ring order through in-place edge splitting, so
    # the hull is simply the sequence of edge start points
    ring = [a for a, _ in result]
    return points[ring]


def concave_hull_polygon(geom, concavity=2.0, length_threshold=0.0):
    """Concave hull of a geometry's vertices, unioned with the original
    shape so the hull never loses area (reference layout.py:688-710)."""
    from origami_tpu import geometry as G
    pts = geom._all_coords()
    if len(pts) < 4:
        return geom.convex_hull
    ring = concave_hull(pts, concavity, length_threshold)
    if len(ring) < 3:
        return geom.convex_hull
    hull = G.Polygon(ring)
    if not hull.is_valid:
        hull = G.make_valid(hull)
    out = hull.union(geom)
    if out.geom_type == "MultiPolygon":
        out = out.convex_hull
    return out

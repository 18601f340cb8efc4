"""GT separator segments: robust polyline fitting + merge strategies.

Counterpart of the reference's gen/segments.py + gen/merger.py (robust
polyline fit over PSD separator layers; merging fragments by_distance /
parallel / by_length). Input here is a GT separator label mask; output
is clean merged polylines per separator class, used to build master
annotations and stopper geometry for region generation.
"""

from __future__ import annotations

import math

import numpy as np

from origami_tpu import geometry as G
from origami_tpu.core.math import Orientation


def extract_segments(mask, orientation, min_px=12):
    """Fit one polyline per connected component of a GT separator mask."""
    import cv2
    from origami_tpu.core.polyline import (
        estimate_polyline, polyline_from_polygon)
    from origami_tpu.core.contours import find_contour_polygons
    m = (np.asarray(mask) > 0).astype(np.uint8)
    n, labels, stats, _ = cv2.connectedComponentsWithStats(m, 8)
    out = []
    for i in range(1, n):
        if stats[i, 4] < min_px:
            continue
        x0, y0, w, h = stats[i, 0], stats[i, 1], stats[i, 2], stats[i, 3]
        comp = np.pad(labels[y0:y0 + h, x0:x0 + w] == i, 2)
        pl = estimate_polyline(comp, orientation, simplify_tol=2.0)
        if pl is None:
            polys = find_contour_polygons(comp)
            if polys:
                pl = polyline_from_polygon(polys[0], orientation, 2.0)
        if pl is not None and not pl.is_empty:
            from origami_tpu.core.polyline import Polyline
            out.append(Polyline(
                pl.np_coords + np.array([x0 - 2, y0 - 2]), pl.width))
    return out


def _endpoints(pl):
    c = pl.np_coords
    return c[0], c[-1]


def _direction(pl):
    a, b = _endpoints(pl)
    d = b - a
    n = np.linalg.norm(d)
    return d / n if n > 1e-9 else np.array([1.0, 0.0])


def merge_by_distance(polylines, max_gap=20.0, max_angle=0.2):
    """Chain fragments whose endpoints nearly touch and whose directions
    agree (reference merger strategy 'by_distance')."""
    polylines = list(polylines)
    merged = True
    while merged and len(polylines) > 1:
        merged = False
        for i in range(len(polylines)):
            for j in range(i + 1, len(polylines)):
                a, b = polylines[i], polylines[j]
                da, db = _direction(a), _direction(b)
                cross = da[0] * db[1] - da[1] * db[0]
                if abs(float(cross)) > max_angle:
                    continue
                # try all endpoint pairings
                ae = _endpoints(a)
                be = _endpoints(b)
                best = None
                for ai, ap in enumerate(ae):
                    for bi, bp in enumerate(be):
                        d = float(np.linalg.norm(ap - bp))
                        if d <= max_gap and (best is None or d < best[0]):
                            best = (d, ai, bi)
                if best is None:
                    continue
                _, ai, bi = best
                ca = a.np_coords if ai == 1 else a.np_coords[::-1]
                cb = b.np_coords if bi == 0 else b.np_coords[::-1]
                from origami_tpu.core.polyline import Polyline
                w = (a.width * a.line_string.length
                     + b.width * b.line_string.length) / max(
                    a.line_string.length + b.line_string.length, 1e-9)
                polylines[i] = Polyline(np.vstack([ca, cb]), w)
                del polylines[j]
                merged = True
                break
            if merged:
                break
    return polylines


def merge_parallel(polylines, max_offset=8.0, overlap_frac=0.5):
    """Collapse near-duplicate parallel strokes (double-drawn GT lines)
    into the longer one (reference strategy 'parallel')."""
    out = []
    used = [False] * len(polylines)
    order = np.argsort([-p.line_string.length for p in polylines])
    for oi in order:
        if used[oi]:
            continue
        keeper = polylines[oi]
        used[oi] = True
        kl = keeper.line_string
        for j in range(len(polylines)):
            if used[j]:
                continue
            other = polylines[j]
            mid = other.line_string.interpolate(0.5, normalized=True)
            if kl.is_empty:
                continue
            d = kl.distance(mid)
            if d <= max_offset and other.line_string.length \
                    <= kl.length / max(overlap_frac, 1e-9):
                used[j] = True
        out.append(keeper)
    return out


def filter_by_length(polylines, min_length=25.0):
    """Drop specks (reference strategy 'by_length')."""
    return [p for p in polylines if p.line_string.length >= min_length]


def clean_separators(mask, orientation, max_gap=20.0, min_length=25.0):
    """Full GT cleanup pipeline: fit -> chain -> dedupe -> filter."""
    segs = extract_segments(mask, orientation)
    segs = merge_by_distance(segs, max_gap=max_gap)
    segs = merge_parallel(segs)
    return filter_by_length(segs, min_length)

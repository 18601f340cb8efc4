"""Raster bridge: polygons <-> masks via cv2.

Area booleans (union/intersection/difference) and buffers are evaluated on
rasters at adaptive resolution and re-vectorized; for a pixel-space document
pipeline this is both robust (no degenerate-intersection failure modes) and
accurate to a sub-pixel at the default scales.
"""

from __future__ import annotations

import numpy as np
import cv2

from .poly import Polygon, MultiPolygon, GEOMETRY_EMPTY

# raster side-length budget for boolean ops
_MAX_SIDE = 4096.0
_MIN_SIDE = 256.0


def _offset_ring(c, d=0.5):
    """Offset a traced pixel-center ring outward (away from the filled
    region) by d pixels — cancels the half-pixel inward bias of contour
    tracing. Orientation-aware, so it also works for hole rings."""
    if len(c) < 3:
        return c
    seg = np.diff(np.vstack([c, c[:1]]), axis=0)
    ln = np.linalg.norm(seg, axis=1)
    ln[ln == 0] = 1.0
    n = np.c_[seg[:, 1], -seg[:, 0]] / ln[:, None]
    vn = (n + np.roll(n, 1, axis=0)) * 0.5
    vl = np.linalg.norm(vn, axis=1)
    vl[vl == 0] = 1.0
    vn = vn / vl[:, None]
    x, y = c[:, 0], c[:, 1]
    area2 = np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y)
    s = 1.0 if area2 > 0 else -1.0
    return c + s * vn * d


def _pick_scale(w, h):
    side = max(w, h, 1e-6)
    scale = 1.0
    if side * scale > _MAX_SIDE:
        scale = _MAX_SIDE / side
    elif side * scale < _MIN_SIDE:
        scale = min(_MIN_SIDE / side, 32.0)
    return scale


class RasterFrame:
    """Maps a world bbox to an integer raster with some scale and margin."""

    def __init__(self, bounds, scale=None, margin=2):
        minx, miny, maxx, maxy = bounds
        w = maxx - minx
        h = maxy - miny
        if scale is None:
            scale = _pick_scale(w, h)
        self.scale = float(scale)
        self.origin = np.array([minx, miny], dtype=np.float64)
        self.margin = int(margin)
        self.width = int(np.ceil(w * self.scale)) + 2 * self.margin + 1
        self.height = int(np.ceil(h * self.scale)) + 2 * self.margin + 1

    def to_px(self, coords):
        return (np.asarray(coords, dtype=np.float64) - self.origin) \
            * self.scale + self.margin

    def to_world(self, coords):
        return (np.asarray(coords, dtype=np.float64) - self.margin) \
            / self.scale + self.origin

    def zeros(self):
        return np.zeros((self.height, self.width), dtype=np.uint8)


def _fill_rings(mask, frame, shell, holes, value=1):
    pts = [np.round(frame.to_px(shell)).astype(np.int32)]
    if not holes:
        if len(pts[0]) >= 3:
            cv2.fillPoly(mask, pts, int(value))
        return mask
    # holed polygon: compose shell-minus-holes in a scratch mask and
    # merge, so a hole never erases area another polygon already drew
    # into the shared mask (raster_union_all of overlapping geometries)
    tmp = np.zeros_like(mask)
    if len(pts[0]) >= 3:
        cv2.fillPoly(tmp, pts, 1)
    for h in holes:
        hp = np.round(frame.to_px(h)).astype(np.int32)
        if len(hp) >= 3:
            cv2.fillPoly(tmp, [hp], 0)
    mask[tmp > 0] = value
    return mask


def rasterize(geom, frame, mask=None, value=1, thickness=None):
    """Draw a geometry into a uint8 mask in the given frame."""
    if mask is None:
        mask = frame.zeros()
    if geom.is_empty:
        return mask
    t = geom.geom_type
    if t == "Polygon":
        _fill_rings(mask, frame, geom.np_shell, geom.np_holes, value)
    elif t == "MultiPolygon" or t == "GeometryCollection":
        for g in geom.geoms:
            rasterize(g, frame, mask, value, thickness)
    elif t in ("LineString", "LinearRing"):
        pts = np.round(frame.to_px(geom.np_coords)).astype(np.int32)
        th = max(1, int(round((thickness or 1.0) * frame.scale)))
        cv2.polylines(mask, [pts], False, int(value), thickness=th)
    elif t == "Point":
        p = np.round(frame.to_px([[geom.x, geom.y]])).astype(np.int32)[0]
        if 0 <= p[1] < mask.shape[0] and 0 <= p[0] < mask.shape[1]:
            mask[p[1], p[0]] = value
    elif t == "MultiPoint":
        for g in geom.geoms:
            rasterize(g, frame, mask, value, thickness)
    return mask


def vectorize(mask, frame, simplify=None, min_area_px=2.0):
    """Extract polygons (with holes) from a binary mask, in world coords."""
    contours, hierarchy = cv2.findContours(
        (mask > 0).astype(np.uint8), cv2.RETR_CCOMP, cv2.CHAIN_APPROX_SIMPLE)
    if not contours:
        return GEOMETRY_EMPTY
    hierarchy = hierarchy[0]
    polys = []
    for i, cnt in enumerate(contours):
        if hierarchy[i][3] != -1:
            continue  # hole; attached below
        if cv2.contourArea(cnt) < min_area_px:
            continue
        shell = frame.to_world(
            _offset_ring(cnt.reshape(-1, 2).astype(np.float64)))
        holes = []
        child = hierarchy[i][2]
        while child != -1:
            hc = contours[child]
            if cv2.contourArea(hc) >= min_area_px:
                holes.append(frame.to_world(
                    _offset_ring(hc.reshape(-1, 2).astype(np.float64))))
            child = hierarchy[child][0]
        if len(shell) >= 3:
            p = Polygon(shell, holes)
            if simplify:
                p = p.simplify(simplify)
            polys.append(p)
    if not polys:
        return GEOMETRY_EMPTY
    if len(polys) == 1:
        return polys[0]
    return MultiPolygon(polys)


def raster_overlay(a, b, op, scale=None):
    """Boolean overlay of two areal geometries on a shared raster."""
    ab_bounds = _join_bounds(a.bounds, b.bounds)
    frame = RasterFrame(ab_bounds, scale=scale)
    ma = rasterize(a, frame)
    mb = rasterize(b, frame)
    if op == "and":
        m = ma & mb
    elif op == "or":
        m = ma | mb
    elif op == "diff":
        m = ma & (1 - mb)
    elif op == "xor":
        m = ma ^ mb
    else:
        raise ValueError(op)
    return vectorize(m, frame, simplify=0.5 / frame.scale)


def raster_union_all(geoms, scale=None):
    bounds = None
    for g in geoms:
        if g.is_empty:
            continue
        bounds = g.bounds if bounds is None else _join_bounds(bounds, g.bounds)
    if bounds is None:
        return GEOMETRY_EMPTY
    frame = RasterFrame(bounds, scale=scale)
    m = frame.zeros()
    for g in geoms:
        rasterize(g, frame, m)
    return vectorize(m, frame, simplify=0.5 / frame.scale)


def raster_buffer(geom, distance, scale=None):
    minx, miny, maxx, maxy = geom.bounds
    pad = abs(distance) + 2
    frame = RasterFrame((minx - pad, miny - pad, maxx + pad, maxy + pad),
                        scale=scale)
    m = frame.zeros()
    if geom.geom_type in ("LineString", "LinearRing", "MultiLineString",
                          "Point", "MultiPoint"):
        # positive buffer of linework: draw with stroke width 2*distance
        if distance <= 0:
            return GEOMETRY_EMPTY
        rasterize(geom, frame, m, thickness=2.0 * distance)
        # stroke the endpoints round by dilating with an ellipse of radius d
        r = max(1, int(round(distance * frame.scale)))
        k = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (2 * r + 1, 2 * r + 1))
        m0 = frame.zeros()
        rasterize(geom, frame, m0, thickness=1.0 / frame.scale)
        m |= cv2.dilate(m0, k)
    else:
        rasterize(geom, frame, m)
        r = max(1, int(round(abs(distance) * frame.scale)))
        k = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (2 * r + 1, 2 * r + 1))
        if distance > 0:
            m = cv2.dilate(m, k)
        elif distance < 0:
            m = cv2.erode(m, k)
    return vectorize(m, frame, simplify=0.5 / frame.scale)


def interior_point(poly):
    """A point guaranteed inside the polygon (max distance transform)."""
    frame = RasterFrame(poly.bounds)
    m = rasterize(poly, frame)
    if not m.any():
        return None
    dist = cv2.distanceTransform(m, cv2.DIST_L2, 3)
    iy, ix = np.unravel_index(np.argmax(dist), dist.shape)
    return tuple(frame.to_world([[ix, iy]])[0])


def _join_bounds(a, b):
    return (min(a[0], b[0]), min(a[1], b[1]), max(a[2], b[2]), max(a[3], b[3]))

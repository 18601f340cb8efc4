"""Separator store + separator-aware XY-cut gap scoring.

Counterpart of the reference origami/core/separate.py: a typed store of
H/V/T separator polylines with spatial queries, obstacle checks within
bounds, per-separator widths, and the `ObstacleSampler` that scores
XY-cut gaps by how much separator length flows *along* the cut (good)
vs. stands *across* it (bad).
"""

from __future__ import annotations

import numpy as np

from origami_tpu import geometry as G
from origami_tpu.core.segment import PredictorType


def extract_segments(geom):
    t = geom.geom_type
    if t in ("LineString", "LinearRing"):
        return [geom]
    if t == "MultiLineString":
        return list(geom.geoms)
    if t in ("Point", "MultiPoint"):
        return []
    if t == "GeometryCollection":
        out = []
        for g in geom.geoms:
            out.extend(extract_segments(g))
        return out
    if t in ("Polygon", "MultiPolygon"):
        # treat thin polygons as their exterior
        out = []
        for p in (geom.geoms if t == "MultiPolygon" else [geom]):
            out.append(p.exterior)
        return out
    return []


class Separators:
    def __init__(self, segmentation, separators, widths=None):
        self._predictions = {}
        for p in segmentation.predictions:
            if p.type == PredictorType.SEPARATOR:
                self._predictions[p.name] = p
        self._by_path = dict(separators)
        self._names = {}
        self._by_label = {}
        geoms = []
        for parts, geom in self._by_path.items():
            pred = self._predictions[parts[0]]
            label = pred.classes[parts[1]]
            self._by_label.setdefault(label, []).append(geom)
            self._names[id(geom)] = "/".join(parts)
            geoms.append(geom)
        self._geoms = geoms
        self._widths = widths or {}
        self._tree = G.STRtree(geoms)

    @property
    def by_path(self):
        return self._by_path

    @property
    def geoms(self):
        return self._geoms

    def name(self, geom):
        return self._names[id(geom)]

    def query(self, shape):
        return self._tree.query(shape)

    def label(self, name):
        pname, plabel = name.split("/")[:2]
        return self._predictions[pname].classes[plabel]

    def for_label(self, name):
        return self._by_label.get(self.label(name), [])

    def width(self, name):
        return self._widths.get(tuple(name.split("/")), 1)

    def check_obstacles(self, bounds, obstacles, fringe=0):
        minx, miny, maxx, maxy = bounds
        cx, cy = (minx + maxx) / 2, (miny + maxy) / 2
        minx = min(minx + fringe, cx)
        maxx = max(maxx - fringe, cx)
        miny = min(miny + fringe, cy)
        maxy = max(maxy - fringe, cy)
        labels = set(self.label(o) for o in obstacles)
        bx = G.box(minx, miny, maxx, maxy)
        for sep in self.query(bx):
            if self.label(self.name(sep)) in labels and bx.intersects(sep):
                return True
        return False


class ObstacleSampler:
    """Scores an XY-cut gap: whitespace area, boosted by separators
    running parallel to the cut (reading-flow evidence), penalized by
    separators crossing it; optionally biased by separator thickness."""

    def __init__(self, separators, thickness_delta=None,
                 label_directions=None):
        self._seps = separators
        self._thickness_delta = thickness_delta
        if label_directions is None:
            label_directions = {"H": 0, "V": 1, "T": 1}
        self._direction = {}
        for name, axis in label_directions.items():
            try:
                self._direction[separators.label("separators/" + name)] = axis
            except KeyError:
                pass

    def __call__(self, gap):
        if gap.du < 0.5 or gap.dv < 0.5:
            return 0.0
        pad = 5.0
        minx, miny, maxx, maxy = gap.bounds
        bx = G.box(minx - pad, miny - pad, maxx + pad, maxy + pad)

        flow = G.IntervalTree()
        obst = G.IntervalTree()
        flow_widths = []
        flow_weights = []

        for sep in self._seps.query(bx):
            inter = sep.intersection(bx)
            if inter.is_empty:
                continue
            label = self._seps.label(self._seps.name(sep))
            sep_axis = self._direction.get(label)
            if sep_axis is None:
                continue
            for seg in extract_segments(inter):
                sminx, sminy, smaxx, smaxy = seg.bounds
                smin = (sminx, sminy)
                smax = (smaxx, smaxy)
                if sep_axis == gap.axis:
                    # runs across the gap: obstacle along the u axis
                    u = gap.axis
                    obst.add(smin[u], smax[u] + 1)
                else:
                    v = 1 - gap.axis
                    flow.add(smin[v], smax[v] + 1)
                    flow_widths.append(
                        self._seps.width(self._seps.name(sep)))
                    flow_weights.append(smax[v] - smin[v])

        flow_score = flow.coverage(-np.inf, np.inf) / gap.dv
        obst_score = obst.coverage(-np.inf, np.inf) / gap.du

        if self._thickness_delta and flow_widths:
            w = float(np.average(flow_widths, weights=flow_weights))
            dt = self._thickness_delta(w)
            obst_score -= dt
            flow_score += dt

        score = gap.du * gap.dv
        return (score * (1 - obst_score)) * (1 + flow_score)

"""Recursive XY-cut reading order.

Implements the recursive XY-cut family (Ha, Haralick & Phillips 1995, as
used by the reference origami/core/xycut.py:187-319): sweep the sorted
interval endpoints on each axis, score candidate cut gaps (whitespace
area / width / cut length, or a caller-supplied scorer such as the
separator-aware ObstacleSampler), resolve overlapping boxes by splitting
them to the closer side, and recurse. `flat` mode yields a total order;
`grouped` mode keeps ambiguous overlap sets together so callers can
re-cut them at line level.

Pure NumPy on host — the candidate generation is vectorized over
endpoints rather than per-pair Python loops.
"""

from __future__ import annotations

import numpy as np


class _Item:
    __slots__ = ("name", "bounds")

    def __init__(self, name, bounds):
        self.name = name
        self.bounds = np.asarray(bounds, dtype=np.float64)  # minx,miny,maxx,maxy


class GapInfo:
    """A candidate cut gap handed to scorers.

    axis: 0 = vertical cut line sweeping x, 1 = horizontal sweeping y.
    (minu, maxu) = gap extent along the swept axis; (minv, maxv) = the
    perpendicular extent of the group being cut.
    """

    __slots__ = ("axis", "minu", "maxu", "minv", "maxv")

    def __init__(self, axis, minu, maxu, minv, maxv):
        self.axis = axis
        self.minu = minu
        self.maxu = maxu
        self.minv = minv
        self.maxv = maxv

    @property
    def du(self):
        return self.maxu - self.minu

    @property
    def dv(self):
        return self.maxv - self.minv

    @property
    def bounds(self):
        if self.axis == 0:
            return (self.minu, self.minv, self.maxu, self.maxv)
        return (self.minv, self.minu, self.maxv, self.maxu)


SCORES = dict(
    largest_area=lambda gap: gap.du * gap.dv,
    widest_gap=lambda gap: gap.du,
    longest_cut=lambda gap: gap.dv,
)


def _axis_candidates(items, axis, score, eps, min_extent=0.1):
    """All candidate cuts on one axis: (score, cut_x, axis, is_overlap)."""
    lo = np.array([it.bounds[axis] for it in items])
    hi = np.array([it.bounds[axis + 2] for it in items])
    hi = np.where(hi <= lo, lo + min_extent, hi)
    vlo = np.array([it.bounds[1 - axis] for it in items])
    vhi = np.array([it.bounds[3 - axis] for it in items])
    vext = np.maximum(vhi - vlo, min_extent)
    vmin, vmax = float(vlo.min()), float(vhi.max())

    # endpoint sweep
    xs = np.concatenate([lo, hi])
    labels = np.concatenate([np.arange(len(items)), np.arange(len(items))])
    starts = np.concatenate([np.ones(len(items), bool),
                             np.zeros(len(items), bool)])
    order = np.argsort(xs, kind="stable")
    xs, labels, starts = xs[order], labels[order], starts[order]

    out = []
    active = 0
    open_set = set()
    x0_sweep = xs[0]
    for i in range(len(xs) - 1):
        if starts[i]:
            active += 1
            open_set.add(labels[i])
        else:
            active -= 1
            open_set.discard(labels[i])
        x0, x1 = xs[i], xs[i + 1]
        if x0 <= x0_sweep + eps:
            continue
        if active == 0:
            if x1 > x0:
                gap = GapInfo(axis, x0, x1, vmin, vmax)
                out.append((score(gap), x0, axis, False))
        else:
            err = 0.0
            for j in open_set:
                err += vext[j] * min(abs(x0 - lo[j]), abs(x0 - hi[j]))
            out.append((-err, x0, axis, True))
    return out


def _split(items, axis, cut, min_extent=0.1):
    lo = np.array([it.bounds[axis] for it in items])
    hi = np.array([it.bounds[axis + 2] for it in items])
    hi = np.where(hi <= lo, lo + min_extent, hi)
    a, b = [], []
    for i, it in enumerate(items):
        if hi[i] <= cut:
            a.append(i)
        elif lo[i] > cut:
            b.append(i)
        else:
            # straddles the cut: attach to the closer side
            if abs(cut - lo[i]) < abs(cut - hi[i]):
                b.append(i)
            else:
                a.append(i)
    if not a:
        k = int(np.argmin([lo[i] for i in b]))
        a.append(b.pop(k))
    elif not b:
        k = int(np.argmax([hi[i] for i in a]))
        b.append(a.pop(k))
    return [items[i] for i in a], [items[i] for i in b]


class _Node:
    __slots__ = ("a", "b", "overlap", "leaves")

    def __init__(self, a=None, b=None, overlap=False, leaves=None):
        self.a = a
        self.b = b
        self.overlap = overlap
        self.leaves = leaves


def _cut(items, score, eps, min_extent):
    if len(items) <= 1:
        return _Node(leaves=list(items))
    cands = (_axis_candidates(items, 0, score, eps, min_extent)
             + _axis_candidates(items, 1, score, eps, min_extent))
    if not cands:
        return _Node(leaves=list(items), overlap=len(items) > 1)
    s, x, axis, is_overlap = max(cands, key=lambda c: c[0])
    a, b = _split(items, axis, x, min_extent)
    if max(len(a), len(b)) >= len(items):
        return _Node(leaves=list(items), overlap=is_overlap)
    # order the two sides: lower coordinate first (top/left first)
    return _Node(a=_cut(a, score, eps, min_extent),
                 b=_cut(b, score, eps, min_extent),
                 overlap=is_overlap)


def _flatten(node, out):
    if node.leaves is not None:
        out.extend(it.name for it in node.leaves)
    else:
        _flatten(node.a, out)
        _flatten(node.b, out)


def _groups(node, out):
    if node.leaves is not None:
        if node.leaves:
            out.append([it.name for it in node.leaves])
    elif node.overlap:
        flat = []
        _flatten(node, flat)
        out.append(flat)
    else:
        _groups(node.a, out)
        _groups(node.b, out)


def reading_order(named_bounds, mode="flat", score="widest_gap", eps=0.0,
                  min_extent=0.1):
    """Order (name, bounds) items. Returns a flat name list or, in
    'grouped' mode, a list of name groups (ambiguous overlaps together)."""
    if isinstance(score, str):
        score = SCORES[score]
    items = [_Item(n, b) for n, b in named_bounds]
    if not items:
        return []
    root = _cut(items, score, eps, min_extent)
    out = []
    if mode == "flat":
        _flatten(root, out)
    elif mode == "grouped":
        _groups(root, out)
    else:
        raise ValueError(mode)
    return out


def polygon_order(named_polygons, fringe=0.0, **kwargs):
    """Order (name, polygon) pairs by recursive XY-cut of their bounds,
    inset by `fringe` (reference origami/core/xycut.py:311-319)."""
    nb = []
    for name, poly in named_polygons:
        minx, miny, maxx, maxy = poly.bounds
        cx, cy = (minx + maxx) / 2, (miny + maxy) / 2
        minx = min(minx + fringe, cx)
        maxx = max(maxx - fringe, cx)
        miny = min(miny + fringe, cy)
        maxy = max(maxy - fringe, cy)
        nb.append((name, (minx, miny, maxx, maxy)))
    return reading_order(nb, **kwargs)

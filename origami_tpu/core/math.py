"""Math helpers shared across stages.

Counterpart of the reference's origami/core/math.py: the page `Geometry`
helper that converts diameter-relative parameters into absolute pixels
(used by nearly every detect stage), affine matrix builders, orientation
enum, and polyline division utilities.
"""

from __future__ import annotations

import enum
import math

import numpy as np


class Orientation(enum.Enum):
    H = 0
    V = 1

    @property
    def direction(self):
        return np.array([1.0, 0.0]) if self == Orientation.H \
            else np.array([0.0, 1.0])

    @property
    def flipped(self):
        return Orientation.V if self == Orientation.H else Orientation.H


class Geometry:
    """Page geometry: converts relative lengths/areas (fractions of the
    page diagonal / its square) to absolute pixel quantities."""

    def __init__(self, width, height):
        self._w = float(width)
        self._h = float(height)
        self._diameter = math.hypot(self._w, self._h)

    @property
    def size(self):
        return self._w, self._h

    @property
    def area(self):
        return self._w * self._h

    @property
    def diameter(self):
        return self._diameter

    def rel_length(self, length):
        return length * self._diameter

    def rel_area(self, area):
        # (a * diameter)^2, NOT a * diameter^2 — matches the reference
        # (origami/core/math.py:90-91): region_area=0.0025 is meant to
        # drop "a single word"-sized specks (~47 px^2 on a full page).
        # The squared-diameter reading is 1/a = 400x larger and was
        # silently deleting whole headline regions (8% of GT lines on
        # the synth val set, scripts/diagnose_pipeline.py).
        return (area * self._diameter) ** 2


def resize_matrix(src_size, dst_size):
    """(2, 3) affine scaling from a (w, h) canvas to another."""
    sx = dst_size[0] / src_size[0]
    sy = dst_size[1] / src_size[1]
    return np.array([[sx, 0.0, 0.0], [0.0, sy, 0.0]])


def to_affine_coeffs(m):
    """(2, 3) matrix -> shapely-style [a, b, d, e, xoff, yoff]."""
    return [m[0, 0], m[0, 1], m[1, 0], m[1, 1], m[0, 2], m[1, 2]]


def rotation_matrix(angle, center=(0.0, 0.0)):
    """(2, 3) rotation by `angle` radians about `center`."""
    c, s = math.cos(angle), math.sin(angle)
    cx, cy = center
    return np.array([
        [c, -s, cx - c * cx + s * cy],
        [s, c, cy - s * cx - c * cy]])


def apply_affine(m, points):
    pts = np.asarray(points, dtype=np.float64).reshape(-1, 2)
    return pts @ np.asarray(m)[:, :2].T + np.asarray(m)[:, 2]


def divide_path(coords, n_parts):
    """Split a polyline into n_parts arc-length-equal segments; returns the
    n_parts+1 division points."""
    c = np.asarray(coords, dtype=np.float64)
    seg = np.diff(c, axis=0)
    lens = np.linalg.norm(seg, axis=1)
    total = lens.sum()
    if total <= 0:
        return np.repeat(c[:1], n_parts + 1, axis=0)
    cum = np.concatenate([[0.0], np.cumsum(lens)])
    targets = np.linspace(0.0, total, n_parts + 1)
    idx = np.clip(np.searchsorted(cum, targets, side="right") - 1,
                  0, len(lens) - 1)
    denom = np.where(lens[idx] <= 0, 1.0, lens[idx])
    t = (targets - cum[idx]) / denom
    return c[idx] + t[:, None] * seg[idx]


def poly_line_angle(coords):
    """Dominant angle of a polyline via PCA of its vertices (radians)."""
    c = np.asarray(coords, dtype=np.float64)
    c = c - c.mean(axis=0)
    cov = c.T @ c
    w, v = np.linalg.eigh(cov)
    d = v[:, int(np.argmax(w))]
    return math.atan2(d[1], d[0])

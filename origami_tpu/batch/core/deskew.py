"""Page deskewing from detected line angles.

Reference counterpart: origami/batch/core/deskew.py (length-weighted
median of line angles, rotation applied to both pixels and geometries).
The image rotation runs on device (ops.remap.affine_warp).
"""

from __future__ import annotations

import math

import numpy as np

from origami_tpu import geometry as G
from origami_tpu.core.math import rotation_matrix, to_affine_coeffs


def weighted_median(values, weights):
    order = np.argsort(values)
    v = np.asarray(values, dtype=np.float64)[order]
    w = np.asarray(weights, dtype=np.float64)[order]
    cum = np.cumsum(w)
    if cum[-1] <= 0:
        return float(np.median(v))
    idx = int(np.searchsorted(cum, cum[-1] / 2.0))
    return float(v[min(idx, len(v) - 1)])


class Deskewer:
    def __init__(self, lines, max_angle=math.radians(15)):
        angles = []
        weights = []
        for line in (lines.values() if isinstance(lines, dict)
                     else lines):
            a = line.angle
            if abs(a) <= max_angle:
                angles.append(a)
                weights.append(max(line.length, 1.0))
        self._angle = weighted_median(angles, weights) if angles else 0.0

    @property
    def angle(self):
        return self._angle

    def matrix(self, size):
        """(2, 3) inverse-map rotation about the page center."""
        w, h = size
        return rotation_matrix(self._angle, center=(w / 2.0, h / 2.0))

    def image(self, pixels, background=255.0):
        import jax.numpy as jnp
        from origami_tpu.ops.remap import affine_warp
        h, w = np.asarray(pixels).shape[:2]
        m = self.matrix((w, h))
        out = affine_warp(jnp.asarray(np.asarray(pixels, np.float32)),
                          jnp.asarray(m), (h, w), fill=background)
        return np.clip(np.asarray(out), 0, 255).astype(np.uint8)

    def geometry(self, geom, size):
        """Rotate a geometry into the deskewed frame (the forward map,
        i.e. the inverse of the image sampling matrix)."""
        w, h = size
        forward = rotation_matrix(-self._angle, center=(w / 2.0, h / 2.0))
        return G.affinity.affine_transform(
            geom, to_affine_coeffs(forward))

"""Polygon masks and cutouts.

Counterpart of origami/core/mask.py + canvas.py (cairo rasterization);
rasterization here goes through the geometry raster bridge (cv2).
"""

from __future__ import annotations

import numpy as np

from origami_tpu import geometry as G


class Mask:
    def __init__(self, geometry, bounds=None):
        self._geom = geometry
        if bounds is None:
            minx, miny, maxx, maxy = geometry.bounds
            self._origin = (int(np.floor(minx)), int(np.floor(miny)))
            self._size = (int(np.ceil(maxx)) - self._origin[0] + 1,
                          int(np.ceil(maxy)) - self._origin[1] + 1)
        else:
            minx, miny, maxx, maxy = bounds
            self._origin = (int(minx), int(miny))
            self._size = (int(maxx - minx), int(maxy - miny))

    @property
    def bounds(self):
        x0, y0 = self._origin
        w, h = self._size
        return (x0, y0, x0 + w, y0 + h)

    @property
    def binary(self):
        """(H, W) bool mask of the geometry within its bounds."""
        w, h = self._size
        frame = G.raster.RasterFrame(self.bounds, scale=1.0, margin=0)
        m = G.raster.rasterize(self._geom, frame)
        return (m[:h, :w] > 0)

    def extract_image(self, pixels, background=255):
        """Cut the masked region out of the page; returns (crop, origin).
        Pixels outside the geometry become `background` (pass None to
        keep them)."""
        x0, y0 = self._origin
        w, h = self._size
        H, W = pixels.shape[:2]
        x1 = min(x0 + w, W)
        y1 = min(y0 + h, H)
        x0c, y0c = max(x0, 0), max(y0, 0)
        crop = np.array(pixels[y0c:y1, x0c:x1])
        if background is not None:
            m = self.binary[y0c - y0: y1 - y0, x0c - x0: x1 - x0]
            crop = np.where(m, crop, background).astype(crop.dtype)
        return crop, (x0c, y0c)

    def cutout(self, pixels, background=255):
        """Apply the mask to an already-cropped array of mask size."""
        m = self.binary
        h = min(m.shape[0], pixels.shape[0])
        w = min(m.shape[1], pixels.shape[1])
        out = np.array(pixels[:h, :w])
        return np.where(m[:h, :w], out, background).astype(out.dtype)

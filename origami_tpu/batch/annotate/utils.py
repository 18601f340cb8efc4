"""Shared rendering helpers for the annotate debug stages.

The reference renders with Qt (PySide2/6, forcing single-process runs,
origami/batch/annotate/utils.py); here overlays are drawn with cv2/PIL —
fork-safe and dependency-free.
"""

from __future__ import annotations

import numpy as np
import cv2
import PIL.Image

# distinct, print-friendly overlay colors (BGR for cv2)
LABEL_COLORS = {
    "TEXT": (180, 119, 31),
    "TABULAR": (14, 127, 255),
    "ILLUSTRATION": (44, 160, 44),
    "H": (40, 39, 214),
    "V": (189, 103, 148),
    "T": (75, 86, 140),
}
DEFAULT_COLOR = (127, 127, 127)


def color_for(label):
    return LABEL_COLORS.get(label, DEFAULT_COLOR)


def to_canvas(page_pixels):
    """Grayscale page -> BGR canvas, lightened for overlay contrast."""
    px = np.asarray(page_pixels)
    px = (px.astype(np.float32) * 0.6 + 255 * 0.4).clip(0, 255) \
        .astype(np.uint8)
    return cv2.cvtColor(px, cv2.COLOR_GRAY2BGR)


def draw_geometry(canvas, geom, color, thickness=2, fill_alpha=0.15,
                  label=None):
    t = geom.geom_type
    if t == "Polygon":
        pts = np.round(geom.np_shell).astype(np.int32)
        if fill_alpha > 0:
            overlay = canvas.copy()
            cv2.fillPoly(overlay, [pts], color)
            cv2.addWeighted(overlay, fill_alpha, canvas, 1 - fill_alpha,
                            0, canvas)
        cv2.polylines(canvas, [pts], True, color, thickness)
        if label:
            c = pts.mean(axis=0).astype(int)
            cv2.putText(canvas, str(label), tuple(c),
                        cv2.FONT_HERSHEY_SIMPLEX, 0.6, color, 2)
    elif t == "MultiPolygon":
        for g in geom.geoms:
            draw_geometry(canvas, g, color, thickness, fill_alpha, label)
            label = None
    elif t in ("LineString", "LinearRing"):
        pts = np.round(geom.np_coords).astype(np.int32)
        cv2.polylines(canvas, [pts], False, color, thickness)
    elif t == "MultiLineString":
        for g in geom.geoms:
            draw_geometry(canvas, g, color, thickness)
    elif t == "Point":
        cv2.circle(canvas, (int(geom.x), int(geom.y)), 3, color, -1)


def draw_arrow(canvas, p0, p1, color, thickness=2):
    cv2.arrowedLine(canvas, tuple(map(int, p0)), tuple(map(int, p1)),
                    color, thickness, tipLength=0.05)


def save_jpeg(canvas, path, quality=85):
    PIL.Image.fromarray(
        cv2.cvtColor(canvas, cv2.COLOR_BGR2RGB)).save(
        str(path), "JPEG", quality=quality)


class AnnotateWriter:
    """Bridges a canvas to the Writer.annotation contract."""

    def __init__(self, canvas):
        self._canvas = canvas

    def save(self, path):
        save_jpeg(self._canvas, path)

"""Blocks and text lines: geometry containers + line image extraction.

Counterpart of the reference's origami/core/block.py (Block, Line with
its p/right/up frame, Tesseract baseline data, deskewed/dewarped image
extraction) with two deliberate changes:

  * line *detection* is Tesseract-free (see origami_tpu.core.baselines):
    projection-profile baselines on device-binarized crops;
  * line *image extraction* builds affine/inverse-grid sample frames that
    the batched device gather in ops.remap consumes — per-line cv2 calls
    (reference origami/core/block.py:129-143, 223-259) become one jit op
    over all lines of a page.

The Line JSON contract (p/right/up/wkt/confidence/tesseract_data) is kept
byte-compatible with docs/formats.md#lineszip; the detection payload is
still stored under the "tesseract_data" key for interop.
"""

from __future__ import annotations

import json
import math
import zipfile
from functools import cached_property

import numpy as np

from origami_tpu import geometry as G


class Block:
    """A region polygon bound to a page at some stage."""

    def __init__(self, page, polygon, stage):
        self._page = page
        self._polygon = polygon
        self._stage = stage

    @property
    def page(self):
        return self._page

    @property
    def stage(self):
        return self._stage

    @property
    def image_space_polygon(self):
        return self._polygon

    @property
    def polygon(self):
        return self._polygon

    @property
    def bounds(self):
        return self._polygon.bounds

    @property
    def page_pixels(self):
        from origami_tpu.batch.core.io import Stage
        dewarped = self._stage is not None and self._stage.is_dewarped
        return self._page.pixels(dewarped)

    @cached_property
    def background(self):
        """Background intensity estimate: high quantile of the block crop."""
        x0, y0, x1, y1 = [int(v) for v in self.bounds]
        px = self.page_pixels
        x0 = max(0, x0); y0 = max(0, y0)
        x1 = min(px.shape[1], x1 + 1); y1 = min(px.shape[0], y1 + 1)
        if x1 <= x0 or y1 <= y0:
            return 255
        crop = px[y0:y1, x0:x1]
        return float(np.quantile(crop, 0.8))

    def extract_image(self, buffer=0):
        """Crop the block bbox (+buffer) from the page; returns (pixels,
        (x0, y0) origin)."""
        x0, y0, x1, y1 = self.bounds
        x0 = int(max(0, math.floor(x0 - buffer)))
        y0 = int(max(0, math.floor(y0 - buffer)))
        px = self.page_pixels
        x1 = int(min(px.shape[1], math.ceil(x1 + buffer)))
        y1 = int(min(px.shape[0], math.ceil(y1 + buffer)))
        return px[y0:y1, x0:x1], np.array([x0, y0])


# Canonical recognizer framing: the detected band is the INK extent
# (tallest ascender -> descender bottom). Mapping it straight onto the
# strip puts glyphs at the extreme top of the recognizer's trained
# size range (train.synth.render_line frames lines with margin above
# the cap height and below the descenders) and clips i-dots/ascenders
# whenever the band threshold runs tight — measured pipeline CER was
# 0.09 from exactly this while isolated-line CER was 0.0. Padding the
# band by these fractions of its height before the scale-to-height
# puts serving strips dead-center of the training distribution.
BAND_PAD = (0.28, 0.12)


class Line:
    """A text line: rectangle frame (p + right + up), detailed polygon,
    confidence scores, and detection metadata."""

    def __init__(self, block, p, right, up, tesseract_data=None,
                 wkt=None, text_area=None, confidence=1):
        self._block = block
        self._p = np.asarray(p, dtype=np.float64)
        self._right = np.asarray(right, dtype=np.float64)
        self._up = np.asarray(up, dtype=np.float64)
        self._data = tesseract_data or {}
        if wkt:
            self._polygon = G.wkt.loads(wkt)
        elif text_area is not None:
            rect = G.Polygon([
                self._p, self._p + self._right,
                self._p + self._right + self._up, self._p + self._up])
            rect._convex_memo = True
            # hull(text_area ∩ rect) without the exact overlay: one SH
            # pass per shell + hull (see ops.clip_hull) — this runs
            # once per detected line and dominated detect_block_lines
            from origami_tpu.geometry.ops import clip_hull
            inter = clip_hull(text_area, rect)
            if inter is None:                  # unsupported input type
                inter = text_area.intersection(rect)
                inter = inter.convex_hull if not inter.is_empty else rect
            self._polygon = inter if inter.geom_type == "Polygon" \
                and not inter.is_empty else rect
        else:
            self._polygon = G.Polygon([
                self._p, self._p + self._right,
                self._p + self._right + self._up, self._p + self._up])
        self._confidence = confidence

    # -- basic accessors ---------------------------------------------------
    @property
    def block(self):
        return self._block

    @property
    def p(self):
        return self._p

    @property
    def right(self):
        return self._right

    @property
    def up(self):
        return self._up

    @property
    def image_space_polygon(self):
        return self._polygon

    @property
    def baseline(self):
        bl = self._data.get("baseline")
        if bl is None:
            return [list(self._p), list(self._p + self._right)]
        return bl

    @property
    def center(self):
        p1, p2 = self.baseline
        return (np.asarray(p1) + np.asarray(p2)) / 2.0

    @property
    def angle(self):
        return math.atan2(self._right[1], self._right[0])

    @property
    def length(self):
        return float(np.linalg.norm(self._right))

    @property
    def height(self):
        return float(np.linalg.norm(self._up))

    def dewarped_height(self, grid):
        """Line height after dewarping: transform the up-vector endpoints
        through the grid's forward map."""
        if grid is None:
            return self.height
        pts = grid.transformer_points(
            np.stack([self._p, self._p + self._up]))
        return float(np.linalg.norm(pts[1] - pts[0]))

    # -- confidence --------------------------------------------------------
    @property
    def confidence(self):
        if isinstance(self._confidence, dict):
            vals = [v for k, v in self._confidence.items()
                    if not k.endswith("/BACKGROUND")]
            return max(vals) if vals else 0.0
        return float(self._confidence)

    def update_confidence(self, confidence):
        self._confidence = confidence

    @property
    def predicted_path(self):
        if not isinstance(self._confidence, dict):
            return None
        items = [(k, v) for k, v in self._confidence.items()
                 if not k.endswith("/BACKGROUND")]
        if not items:
            return None
        best = max(items, key=lambda kv: kv[1])
        return tuple(best[0].split("/"))

    def predicted_path_error(self, path):
        if not isinstance(self._confidence, dict):
            return 0.0
        items = [(k, v) for k, v in self._confidence.items()
                 if not k.endswith("/BACKGROUND")]
        if not items:
            return 0.0
        best = max(items, key=lambda kv: kv[1])
        if tuple(best[0].split("/")) == tuple(path):
            return 0.0
        return best[1] - (self._confidence.get("/".join(path), 0.0)
                          if isinstance(self._confidence, dict) else 0.0)

    # -- serialization (docs/formats.md#lineszip) --------------------------
    @property
    def info(self):
        return dict(
            p=[float(v) for v in self._p],
            right=[float(v) for v in self._right],
            up=[float(v) for v in self._up],
            wkt=self._polygon.wkt,
            confidence=self._confidence
            if isinstance(self._confidence, (int, float))
            else self._confidence,
            tesseract_data=_jsonable(self._data))

    # -- extraction frames (consumed by the batched device gather) --------
    def deskewed_frame(self, target_height):
        """(2, 3) affine mapping strip (x, y) -> page coords: x spans
        `right`, y runs top(0) -> bottom(target_height-1) down `up`."""
        width = max(2, int(math.ceil(self.length)))
        h = max(target_height - 1, 1)
        ex = self._right / max(width - 1, 1)
        ey = -self._up / h          # strip y grows downward; up points up
        origin = self._p + self._up  # strip (0, 0) is the top-left corner
        return np.array([
            [ex[0], ey[0], origin[0]],
            [ex[1], ey[1], origin[1]]]), width

    def _column_extent(self, column):
        """(p0, right) clipped to a table column's x range."""
        p0, right = self._p, self._right
        if column is None:
            return p0, right
        x0, x1 = column
        bx0 = min(p0[0], (p0 + right)[0])
        bx1 = max(p0[0], (p0 + right)[0])
        if x0 is None:
            x0 = bx0
        if x1 is None:
            x1 = bx1
        denom = max(bx1 - bx0, 1e-6)
        t0 = (x0 - bx0) / denom
        t1 = (x1 - bx0) / denom
        return p0 + right * t0, right * max(t1 - t0, 1e-6)

    def dewarped_frame(self, target_height, xres=1.0, column=None,
                       pad=None):
        """((2, 3) affine, width): strip pixel (x, y, 1) -> dewarped
        page coords; the device twin of dewarped_grid_coords, consumed
        by ops.remap.extract_dewarped_strips.

        pad=(top_frac, bottom_frac) extends the sampled band beyond
        the detected ink band by those fractions of its height (see
        BAND_PAD)."""
        p0, right = self._column_extent(column)
        up = self._up
        if pad:
            pt, pb = pad
            p0 = p0 - up * pb
            up = up * (1.0 + pt + pb)
        width = max(2, int(math.ceil(np.linalg.norm(right) * xres)))
        dx = right / (width - 1)
        dy = -up / max(target_height - 1, 1)
        origin = p0 + up
        frame = np.array([[dx[0], dy[0], origin[0]],
                          [dx[1], dy[1], origin[1]]], np.float32)
        return frame, width

    def dewarped_grid_coords(self, target_height, xres=1.0, column=None,
                             pad=None):
        """Dewarped-space sample grid (target_height, W, 2) for this line,
        to be pushed through the inverse dewarping grid then sampled from
        the warped page — one fused device op for all lines."""
        p0, right = self._column_extent(column)
        up = self._up
        if pad:
            pt, pb = pad
            p0 = p0 - up * pb
            up = up * (1.0 + pt + pb)
        width = max(2, int(math.ceil(np.linalg.norm(right) * xres)))
        xs = np.linspace(0.0, 1.0, width)
        ys = np.linspace(1.0, 0.0, target_height)   # top row = up
        grid = (p0[None, None, :]
                + ys[:, None, None] * up[None, None, :]
                + xs[None, :, None] * right[None, None, :])
        return grid

    def image(self, target_height=48, column=None, dewarped=True,
              deskewed=True, binarizer=None):
        """Single-line extraction (host convenience; batch path is
        LineExtractor). Returns a numpy uint8 strip."""
        import jax.numpy as jnp
        from origami_tpu.ops import remap as _remap
        page = self._block.page
        if dewarped and page.grid is not None:
            # aspect-preserving: x sampled at the same magnification
            # the (padded) band -> target_height scaling applies in y
            pt, pb = BAND_PAD
            band_h = float(np.linalg.norm(self._up)) * (1.0 + pt + pb)
            xres = target_height / max(band_h, 1.0)
            coords = self.dewarped_grid_coords(target_height,
                                               xres=xres, column=column,
                                               pad=BAND_PAD)
            warped_coords = page.grid.inverse_points(
                coords.reshape(-1, 2)).reshape(coords.shape)
            out = np.asarray(_remap.bilinear_sample(
                jnp.asarray(page.warped), jnp.asarray(warped_coords),
                fill=float(self._block.background)))
        else:
            frame, width = self.deskewed_frame(target_height)
            out = np.asarray(_remap.affine_warp(
                jnp.asarray(self._block.page_pixels), jnp.asarray(frame),
                (target_height, width), fill=float(self._block.background)))
        out = np.clip(out, 0, 255).astype(np.uint8)
        if binarizer is not None:
            out = binarizer(out)
        return out

    @cached_property
    def ink(self):
        """Per-column ink density of the deskewed binarized strip."""
        import jax.numpy as jnp
        from origami_tpu.ops import remap as _remap
        height = max(2, int(math.ceil(self.height)))
        frame, width = self.deskewed_frame(height)
        binar = self._block.page.binarized.astype(np.float32) * 255.0
        strip = np.asarray(_remap.affine_warp(
            jnp.asarray(binar), jnp.asarray(frame),
            (height, width), fill=255.0))
        return 1.0 - np.mean(strip / 255.0, axis=0)


def _jsonable(d):
    out = {}
    for k, v in d.items():
        if isinstance(v, np.ndarray):
            out[k] = v.tolist()
        elif isinstance(v, (np.floating, np.integer)):
            out[k] = float(v)
        elif isinstance(v, (list, tuple)):
            out[k] = [_jsonable({"": x})[""] if isinstance(x, dict)
                      else (x.tolist() if isinstance(x, np.ndarray) else x)
                      for x in v]
        else:
            out[k] = v
    return out


class Regions:
    """Regions keyed by artifact path tuple ("regions", "TEXT", "0")."""

    def __init__(self, blocks):
        self._blocks = dict(blocks)

    @property
    def by_path(self):
        return self._blocks

    @cached_property
    def by_predictors(self):
        out = {}
        for k, b in self._blocks.items():
            out.setdefault(k[:2], []).append(b)
        return out

    def __len__(self):
        return len(self._blocks)


# (path, mtime_ns, size) -> (meta, [(parts, info, polygon)]): stages
# downstream of flow/lines each re-open the same lines zip (layout,
# order, ocr, compose); the JSON + WKT parsing was ~0.5 s/stage over
# 6 bench pages. Polygons are immutable repo-wide (same convention as
# io._CONTOURS_PARSE_CACHE), so sharing them across Line instances is
# safe; Line objects themselves are rebuilt per call (they bind the
# caller's Block and carry mutable confidence).
_LINES_PARSE_CACHE = {}


class Lines:
    """Lines keyed by path tuple ("regions", "TEXT", "0", "3")."""

    def __init__(self, lines, meta=None):
        self._lines = dict(lines)
        self._meta = meta or dict(version=1)

    @staticmethod
    def _parse_zip(path, open=open):
        import builtins
        import os
        key = None
        if open is builtins.open:
            try:
                st = os.stat(path)
                key = (str(path), st.st_mtime_ns, st.st_size)
            except OSError:
                key = None
            hit = _LINES_PARSE_CACHE.get(key)
            if hit is not None:
                return hit
        meta = dict(version=1)
        entries = []
        with open(path, "rb") as f:
            with zipfile.ZipFile(f, "r") as zf:
                for name in zf.namelist():
                    if name == "meta.json":
                        meta = json.loads(zf.read(name))
                        continue
                    if not name.endswith(".json"):
                        continue
                    parts = tuple(name[:-5].split("/"))
                    info = json.loads(zf.read(name))
                    poly = G.wkt.loads(info["wkt"]) \
                        if info.get("wkt") else None
                    entries.append((parts, info, poly))
        if key is not None:
            if len(_LINES_PARSE_CACHE) > 64:
                _LINES_PARSE_CACHE.clear()
            _LINES_PARSE_CACHE[key] = (meta, entries)
        return meta, entries

    @staticmethod
    def open(path, regions, open=open):
        blocks = regions.by_path
        meta, entries = Lines._parse_zip(path, open=open)
        lines = {}
        for parts, info, poly in entries:
            block = blocks.get(tuple(parts[:3]))
            if block is None:
                continue
            if poly is not None:
                info = dict(info, wkt=None)
                line = Line(block, **info)
                line._polygon = poly
            else:
                line = Line(block, **info)
            lines[parts] = line
        return Lines(lines, meta)

    def save(self, zf, min_confidence=None):
        meta = dict(self._meta)
        if min_confidence is not None:
            meta["min_confidence"] = min_confidence
        zf.writestr("meta.json", json.dumps(meta))
        for parts, line in self._lines.items():
            zf.writestr("/".join(parts) + ".json", json.dumps(line.info))

    @property
    def meta(self):
        return self._meta

    @property
    def min_confidence(self):
        return self._meta.get("min_confidence", 0.5)

    @property
    def by_path(self):
        return self._lines

    def __len__(self):
        return len(self._lines)


class TextAreaFactory:
    """Text area of a block = its polygon minus buffered neighbour blocks
    (reference origami/core/block.py TextAreaFactory)."""

    def __init__(self, blocks=(), buffer=10, obstacles=()):
        self._blocks = list(blocks)
        self._buffer = buffer
        self._tree = G.STRtree([b.image_space_polygon for b in self._blocks])
        self._index = {id(b): i for i, b in enumerate(self._blocks)}
        self._overlaps = {}
        # obstacles: pre-buffered AREAL geometries (e.g. page
        # separators) that text must not extend across; subtracted
        # per block unless the caller opts out (table dividers are V
        # separators too — shaving them would truncate row lines to
        # one column)
        self._obstacles = [o for o in obstacles
                           if o is not None and not o.is_empty]
        self._obstacle_tree = (G.STRtree(self._obstacles)
                               if self._obstacles else None)

    def _interiors_overlap(self, i, j, pi, pj):
        # every candidate pair is probed twice across the per-block
        # loop (text_area(i) vs j and text_area(j) vs i) — memoize the
        # symmetric answer; the polygon intersection behind it was
        # ~20% of the flow stage's host time
        from origami_tpu.geometry.ops import interiors_overlap
        if i < 0:
            return interiors_overlap(pi, pj)
        key = (i, j) if i < j else (j, i)
        hit = self._overlaps.get(key)
        if hit is None:
            hit = interiors_overlap(pi, pj)
            self._overlaps[key] = hit
        return hit

    def __call__(self, block, avoid_obstacles=True):
        poly = block.image_space_polygon
        area = poly
        bi = self._index.get(id(block), -1)
        for idx in self._tree.query_indices(poly):
            other = self._blocks[idx]
            if other is block:
                continue
            if other.image_space_polygon.equals(poly):
                continue
            if self._interiors_overlap(bi, int(idx), poly,
                                       other.image_space_polygon):
                area = area.difference(
                    other.image_space_polygon.buffer(self._buffer))
        if avoid_obstacles and self._obstacle_tree is not None:
            for idx in self._obstacle_tree.query_indices(poly):
                area = area.difference(self._obstacles[int(idx)])
        return area if not area.is_empty else poly

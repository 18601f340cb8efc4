"""Line extraction service shared by the ocr/export stages.

Reference counterpart: origami/batch/core/lines.py. Differences:

  * `LineExtractor` batches all line strips of a page into ONE device
    gather (inverse-grid sample + bilinear remap over a padded
    (N, H, Wmax) batch) instead of the reference's 8-thread pool of
    per-line cv2.remap calls (lines.py:148, block.py:250-259);
  * `LineRewriter` splits table lines into per-column cells exactly as
    the reference does (the inverse of layout's subdivide_table_blocks).
"""

from __future__ import annotations

import collections
import functools
import logging

import click
import numpy as np

from origami_tpu import geometry as G
from origami_tpu.batch.core.utils import TableRegionCombinator


def reliable_contours(all_blocks, free_lines, detected_lines):
    """Shrink aggregate contours to the hull of their detected lines;
    promote reclassified ("free") lines to new regions of their predicted
    label (reference origami/batch/core/lines.py:15-48)."""
    contours = {k: b.image_space_polygon for k, b in all_blocks.items()}

    combinator = TableRegionCombinator(all_blocks.keys())
    combined_lines = combinator.lines(detected_lines)
    mapping = combinator.mapping

    max_ids = collections.defaultdict(int)
    for k in contours:
        try:
            max_ids[k[:2]] = max(max_ids[k[:2]],
                                 int(str(k[2]).split(".")[0]))
        except ValueError:
            pass

    for pred_path, line in free_lines:
        new_id = max_ids[tuple(pred_path)] + 1
        max_ids[tuple(pred_path)] = new_id
        new_path = tuple(pred_path) + (str(new_id),)
        contours[new_path] = line.image_space_polygon
        detected_lines[new_path + (0,)] = line

    by_block = collections.defaultdict(list)
    for path, line in combined_lines.items():
        by_block[tuple(path[:3])].append(line)

    for path, lines in by_block.items():
        hull = G.unary_union(
            [l.image_space_polygon for l in lines]).convex_hull
        for k in mapping.get(path, [path]):
            if k not in contours:
                continue
            shape = contours[k].intersection(hull)
            if shape.geom_type != "Polygon":
                shape = shape.convex_hull
            contours[k] = shape

    return contours


class LineRewriter:
    """Split table lines into per-column cell lines using tables.json."""

    def __init__(self, tables):
        self._columns = {tuple(k.split("/")): xs
                         for k, xs in tables.get("columns", {}).items()}

    def _column_path(self, path, column):
        predictor, label = path[:2]
        parts = str(path[2]).split(".")
        if len(parts) != 4:
            raise ValueError("%s is not a table path" % str(path))
        block, division, _, _ = parts
        line = 1 + int(path[-1])
        grid = ".".join(map(str, (block, division, line, column)))
        return (predictor, label, grid, str(0))

    def __call__(self, lines):
        parts = []
        for path, line in lines.items():
            cols = self._columns.get(tuple(map(str, path[:3])))
            if cols is None:
                parts.append((path, line, None))
            else:
                edges = [None] + list(cols) + [None]
                for i, (x0, x1) in enumerate(zip(edges, edges[1:])):
                    parts.append(
                        (self._column_path(path, 1 + i), line, (x0, x1)))
        return parts


class LineExtractor:
    def __init__(self, tables, line_height, options, min_confidence=0.5):
        self._line_height = int(line_height)
        self._options = options
        self._min_confidence = min_confidence
        self._rewriter = LineRewriter(tables)
        spec = options.get("binarize", "").strip()
        if spec:
            from origami_tpu.core.binarize import from_string
            self._binarizer = from_string(spec)
        else:
            self._binarizer = None

    @staticmethod
    def options(f):
        opts = [
            click.option("--binarize", type=str, default="",
                         help="line binarization (e.g. otsu, sauvola)"),
            click.option("--do-not-dewarp", is_flag=True, default=False),
            click.option("--do-not-deskew", is_flag=True, default=False),
        ]
        for o in opts:
            f = o(f)
        return f

    def __call__(self, lines, ignored=None):
        if ignored is not None:
            lines = {k: v for k, v in lines.items()
                     if not ignored(tuple(k[:2]))}
        kept = {}
        for path, line in lines.items():
            if line.confidence < self._min_confidence:
                logging.info("skipping line %s (confidence %.2f)",
                             path, line.confidence)
                continue
            kept[path] = line
        parts = self._rewriter(kept)
        return self.extract(parts)

    def extract(self, parts):
        """parts: [(path, line, column)] -> [(path, strip_uint8)].

        All dewarped strips of the page are gathered in one device
        dispatch; width is padded to the max and cropped after."""
        if not parts:
            return []
        dewarp = not self._options.get("do_not_dewarp", False)
        th = self._line_height

        jobs = []
        for path, line, column in parts:
            page = line.block.page
            # preserve the glyph aspect ratio: the band (ascent +
            # descent high) is scaled to th rows, so sample x at the
            # same magnification (Calamari's line normalization does
            # the same; a recognizer trained on aspect-true strips
            # can't read vertically stretched ones)
            band_h = float(np.linalg.norm(line._up))
            xres = th / max(band_h, 1.0)
            coords = line.dewarped_grid_coords(th, xres=xres,
                                               column=column)
            if dewarp and page.grid is not None:
                coords = page.grid.inverse_points(
                    coords.reshape(-1, 2)).reshape(coords.shape)
            jobs.append((path, line, coords))

        import jax.numpy as jnp
        from origami_tpu.ops.remap import bilinear_sample

        # group jobs by source page object (normally one)
        out = []
        by_page = collections.defaultdict(list)
        for j in jobs:
            by_page[id(j[1].block.page)].append(j)
        for group in by_page.values():
            page = group[0][1].block.page
            widths = [g[2].shape[1] for g in group]
            wmax = max(widths)
            batch = np.zeros((len(group), th, wmax, 2), np.float32)
            batch[..., 0] = -1e6
            for i, (_, _, coords) in enumerate(group):
                batch[i, :, : coords.shape[1]] = coords
            img = jnp.asarray(np.asarray(page.warped), jnp.float32)
            strips = np.asarray(bilinear_sample(
                img, jnp.asarray(batch), fill=255.0))
            for i, (path, line, _) in enumerate(group):
                strip = np.clip(strips[i, :, : widths[i]], 0,
                                255).astype(np.uint8)
                if self._binarizer is not None:
                    strip = self._binarizer(strip)
                out.append((path, strip))
        return out

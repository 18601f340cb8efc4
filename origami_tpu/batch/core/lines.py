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
                # inset interior edges: the column x-values are divider
                # CENTERS, so a divider-to-divider cell strip includes
                # the stroke itself at both ends — the recognizer reads
                # it as a stray 'l'/'J' glyph
                up_h = float(np.linalg.norm(line._up))
                inset = min(6.0, max(2.0, 0.12 * up_h))
                edges = [None] + list(cols) + [None]
                for i, (x0, x1) in enumerate(zip(edges, edges[1:])):
                    ix0 = None if x0 is None else x0 + inset
                    ix1 = None if x1 is None else x1 - inset
                    if ix0 is not None and ix1 is not None \
                            and ix1 - ix0 < 4:
                        ix0, ix1 = x0, x1
                    parts.append(
                        (self._column_path(path, 1 + i), line,
                         (ix0, ix1)))
        return parts


class LineExtractor:
    def __init__(self, tables, line_height, options, min_confidence=0.5,
                 max_width=None):
        self._line_height = int(line_height)
        self._options = options
        self._min_confidence = min_confidence
        self._max_width = max_width
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
            click.option("--extract-mode",
                         type=click.Choice(["banded", "gather"]),
                         default="banded",
                         help="strip extraction: gather-free banded "
                              "slices off the dewarped page (default) "
                              "vs the warped-page inverse-grid gather"),
        ]
        for o in opts:
            f = o(f)
        return f

    def parts(self, lines, ignored=None):
        """Filter + table-split lines into extraction parts."""
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
        return self._rewriter(kept)

    def __call__(self, lines, ignored=None):
        return self.extract(self.parts(lines, ignored=ignored))

    def device_groups(self, parts):
        """parts: [(path, line, column)] -> yield per source page
        (paths, device strips (nb, th, wmax) uint8, widths (n,), wmax).

        All strips of a page are gathered in ONE fused device dispatch
        (affine strip grid -> inverse dewarp grid -> page gather -> u8;
        ops.remap.extract_dewarped_strips). Host work per line is just
        the (2, 3) frame. N (powers of two) and the padded width
        (512-ladder) are bucketed so jit graphs are reused across
        pages; rows past len(paths) are padding. The strips stay on
        device — consumers that batch further (OCR) feed them straight
        into the recognizer without a host round trip (the padded
        batch was ~10x the useful bytes through the tunnel)."""
        if not parts:
            return
        dewarp = not self._options.get("do_not_dewarp", False)
        th = self._line_height

        import jax.numpy as jnp
        from origami_tpu.ops.remap import (extract_dewarped_strips,
                                           identity_grid)

        from origami_tpu.batch.core.prof import span

        by_page = collections.defaultdict(list)
        for path, line, column in parts:
            by_page[id(line.block.page)].append((path, line, column))
        # NOTE on x margins: adding white/paper margins around the
        # extent (fill or sampled, via extract_dewarped_strips'
        # x_margin) was A/B'd against the trained recognizer and HURT
        # (bad_text 25 -> 41, CER 0.0070 -> 0.0113 on the eval
        # corpus) — the recognizer wants the tight ink extent it was
        # effectively trained on. Keep extents tight.
        for group in by_page.values():
            page = group[0][1].block.page
            frames, widths = [], []
            for lpath, line, column in group:
                # preserve the glyph aspect ratio: the PADDED band
                # (core.block.BAND_PAD margins around the detected ink
                # band — the recognizer's canonical framing) is scaled
                # to th rows, so sample x at the same magnification
                # (Calamari-style line normalization; a recognizer
                # trained on aspect-true strips can't read vertically
                # stretched or over-magnified ones)
                from origami_tpu.core.block import BAND_PAD
                pt, pb = BAND_PAD
                band_h = float(np.linalg.norm(line._up)) * (1 + pt + pb)
                xres = th / max(band_h, 1.0)
                frame, width = line.dewarped_frame(th, xres=xres,
                                                   column=column,
                                                   pad=BAND_PAD)
                if self._max_width and width > self._max_width:
                    # sample-time squeeze: very wide lines (full-width
                    # newspaper rules/tables) are extracted at reduced
                    # x magnification so they fit the recognizer's
                    # largest width bucket (the host path's cv2
                    # INTER_AREA downscale, folded into the gather)
                    logging.warning(
                        "line %s wider than %d px (%d): sampling "
                        "squeezed", "/".join(map(str, lpath)),
                        self._max_width, width)
                    frame, width = line.dewarped_frame(
                        th, xres=xres * self._max_width / width,
                        column=column, pad=BAND_PAD)
                    width = min(width, self._max_width)
                frames.append(frame)
                widths.append(width)
            with span("lines.grid_points"):
                if dewarp and page.grid is not None:
                    hv = page.grid.points("sample")
                    res = float(page.grid.resolution)
                else:
                    hv, res = identity_grid(*page.size())
            # sub-group by width bucket: one page-max width would run
            # every short line at the longest line's sequence length
            # (4x the LSTM time for a page with one full-width rule).
            # The ladder is the recognizer's own (256-px pitch) so the
            # dispatch pads nothing further.
            from origami_tpu.models.recognizer import strip_width_bucket
            buckets = collections.defaultdict(list)
            cap = self.bucket_cap
            for i, wid in enumerate(widths):
                buckets[strip_width_bucket(wid, cap)].append(i)
            # extraction route: "banded" slices strips off the
            # device-resident DEWARPED page with zero gathers
            # (ops.remap.extract_strips_banded — the page gather runs
            # at ~6 M samples/s on v5e, ~0.8 s/page of strips);
            # "gather" keeps the warped-page inverse-grid gather.
            mode = self._options.get("extract_mode", "banded")
            dew_dev = None
            if mode == "banded":
                with span("lines.page_upload"):
                    dew_dev = page.dewarped_dev \
                        if dewarp and page.grid is not None \
                        else page.device_pixels
            img_dev = hv_dev = None
            if mode != "banded" or dew_dev is None:
                with span("lines.page_upload"):
                    img_dev = page.device_pixels
                    hv_dev = jnp.asarray(hv)
            for wmax, idxs in sorted(buckets.items()):
                # partition by banded eligibility: profile statics
                # (slab K, slab W) must cover each strip's source
                # footprint, and the shear pass is a static 6-tap band
                parts_out = {"p1": [], "p2": [], "gather": []}
                for i in idxs:
                    parts_out[self._extract_profile(
                        frames[i], widths[i], th, dew_dev)].append(i)
                for prof, sub in parts_out.items():
                    if not sub:
                        continue
                    nb = 32
                    while nb < len(sub):
                        nb *= 2
                    fr = np.zeros((nb, 2, 3), np.float32)
                    fr[: len(sub)] = np.stack([frames[i] for i in sub])
                    wd = np.zeros(nb, np.int32)
                    wd[: len(sub)] = [widths[i] for i in sub]
                    with span("lines.extract_dispatch"):
                        if prof == "gather":
                            if img_dev is None:
                                img_dev = page.device_pixels
                                hv_dev = jnp.asarray(hv)
                            strips = extract_dewarped_strips(
                                img_dev, hv_dev, res, jnp.asarray(fr),
                                jnp.asarray(wd), th, wmax, 255.0, 0)
                        else:
                            from origami_tpu.ops.remap import \
                                extract_strips_banded
                            k, sw = ((64, wmax + 8) if prof == "p1"
                                     else (128, 2 * wmax + 8))
                            strips = extract_strips_banded(
                                dew_dev, jnp.asarray(fr),
                                jnp.asarray(wd), th, wmax, k, sw,
                                6, 255.0)
                    yield ([group[i][0] for i in sub], strips,
                           wd[: len(sub)].copy(), wmax)

    @staticmethod
    def _extract_profile(frame, width, th, dew_dev):
        """Which extraction dispatch a line belongs to: "p1"
        (body-text banded statics), "p2" (large-text banded statics)
        or "gather" (footprint exceeds the banded profiles, or no
        device source page)."""
        if dew_dev is None:
            return "gather"
        a0, a1 = float(frame[0, 0]), float(frame[0, 1])
        b0, b1 = float(frame[1, 0]), float(frame[1, 1])
        if abs(a1) * max(th - 1, 1) / 2.0 > 2.0:
            return "gather"   # shear exceeds the static 6-tap band
        vspan = abs(b0) * max(width - 1, 1) + abs(b1) * (th - 1) + 4
        hspan = a0 * max(width - 1, 1) + abs(a1) * (th - 1) + 4
        if a0 <= 1.0 and vspan <= 62 and hspan <= width + 6:
            return "p1"
        if a0 <= 2.0 and vspan <= 126:
            return "p2"
        return "gather"

    @property
    def bucket_cap(self):
        """Ladder ceiling of max_width: the largest width bucket
        device_groups will emit (None = unbounded)."""
        if not self._max_width:
            return None
        from origami_tpu.models.recognizer import strip_width_bucket
        cap = strip_width_bucket(self._max_width, cap=None)
        return cap

    @property
    def binarizer(self):
        return self._binarizer

    def extract(self, parts):
        """parts: [(path, line, column)] -> [(path, strip_uint8)]."""
        out = []
        for paths, dev, widths, _ in self.device_groups(parts):
            strips = np.asarray(dev)
            for i, path in enumerate(paths):
                strip = strips[i, :, : widths[i]]
                if self._binarizer is not None:
                    strip = self._binarizer(strip)
                out.append((path, strip))
        return out

"""detect.lines — reliable baseline detection on refined regions
(CLI stage 6).

Reference contract: origami/batch/detect/lines.py (segmentation +
contours.2/tables -> contours.3.zip + lines.3.zip). Lines are detected
per aggregate block with the projection-profile detector (forced lines on
empty blocks), scored by sampling the pixel segmentation under each
line's warped sample grid, reclassified when the evidence contradicts the
block's label, and the aggregate contours are shrunk to the hull of
their reliable lines.
"""

from __future__ import annotations

import collections
import logging
from pathlib import Path

import click
import numpy as np

from origami_tpu.batch.core.processor import Processor
from origami_tpu.batch.core.io import Artifact, Input, Output, Stage
from origami_tpu.batch.core.lines import reliable_contours
from origami_tpu.batch.core.utils import RegionsFilter
from origami_tpu.batch.detect.flow import detect_block_lines
from origami_tpu.core.block import TextAreaFactory


class ConfidenceSampler:
    """Evidence per prediction class under a line's area, computed by
    nearest-sampling the label maps on the warped page (reference
    origami/batch/detect/lines.py:25-54)."""

    def __init__(self, blocks, segmentation, grid):
        self._predictions = {p.name: p
                             for p in segmentation.predictions}
        self._grid = grid
        first = next(iter(blocks.values()))
        self._page_size = first.page.size(False)   # warped (w, h)

    def __call__(self, path, line, res=0.5):
        return self.batch([(path, line)], res=res)[0]

    def batch(self, items, res=0.5):
        """Evidence dicts for [(path, line), ...] — ONE batched grid
        inversion and one label gather per predictor (a per-line
        inverse_points call was ~0.06 s/page of the lines stage)."""
        coords, spans = [], []
        off = 0
        for path, line in items:
            c = line.dewarped_grid_coords(
                max(2, int(line.height * res)), xres=res).reshape(-1, 2)
            coords.append(c)
            spans.append((off, off + len(c)))
            off += len(c)
        if not coords:
            return []
        pts = np.concatenate(coords, axis=0)
        if self._grid is not None:
            pts = self._grid.inverse_points(pts)
        pw, ph = self._page_size
        labels_by_pred = {}
        out = []
        for (path, line), (a, b) in zip(items, spans):
            pred = self._predictions[path[0]]
            labels = labels_by_pred.get(path[0])
            if labels is None:
                lw, lh = pred.size
                xs = np.clip((pts[:, 0] * lw / pw).astype(int), 0, lw - 1)
                ys = np.clip((pts[:, 1] * lh / ph).astype(int), 0, lh - 1)
                labels = pred.labels[ys, xs]
                labels_by_pred[path[0]] = labels
            counts = np.bincount(labels[a:b],
                                 minlength=len(pred.classes))
            total = counts.sum()
            evidence = {}
            if total > 0:
                for c in pred.classes:
                    evidence["%s/%s" % (path[0], c.name)] = \
                        counts[c.value] / total
            out.append(evidence)
        return out


class LineDetectionProcessor(Processor):
    def __init__(self, options):
        super().__init__(options)
        self._opt = options
        self._text_regions = RegionsFilter(
            options.get("text_regions", "regions/TEXT, regions/TABULAR"))
        self._reclassify_threshold = options.get(
            "reclassify_lines_threshold", 0.5)
        self._min_confidence = 0

    @property
    def processor_name(self):
        return "origami_tpu.batch.detect.lines"

    def artifacts(self):
        return [
            ("warped", Input(Artifact.SEGMENTATION, stage=Stage.WARPED)),
            ("dewarped", Input(Artifact.CONTOURS, Artifact.SEGMENTATION,
                               stage=Stage.DEWARPED)),
            ("aggregate", Input(Artifact.CONTOURS, Artifact.TABLES,
                                stage=Stage.AGGREGATE)),
            ("output", Output(Artifact.CONTOURS, Artifact.LINES,
                              stage=Stage.RELIABLE)),
        ]

    def process(self, page_path, warped, dewarped, aggregate, output):
        blocks = aggregate.regions.by_path
        if not blocks:
            return

        page = aggregate.page
        grid = aggregate.grid
        sampler = ConfidenceSampler(blocks, warped.segmentation, grid)

        text_blocks = {p: b for p, b in blocks.items()
                       if self._text_regions(p)}

        # separators come from the DEWARPED contours (same coordinate
        # space as the aggregate regions): the layout stage's
        # contours.2.zip carries regions only, as in the reference
        try:
            separators = dewarped.separators
        except Exception:
            separators = None
        detected_by_block = detect_block_lines(
            page, aggregate.regions, force_lines=True,
            region_filter=lambda p: p in text_blocks,
            separators=separators)

        flat = [(block_path, line)
                for block_path, lines in detected_by_block.items()
                for line in lines]
        for (block_path, line), ev in zip(flat, sampler.batch(flat)):
            line.update_confidence(ev)

        table_columns = aggregate.tables.get("columns", {})
        c_tables = set(tuple(x.split("/")) for x in table_columns.keys())

        detected_lines = {}
        free_lines = []
        for parts, lines in detected_by_block.items():
            pred_name, class_name, block_id = parts[:3]
            for line_id, line in enumerate(lines):
                error = line.predicted_path_error((pred_name, class_name))
                if (pred_name, class_name) == ("regions", "TABULAR"):
                    if (pred_name, class_name, block_id) not in c_tables:
                        # never reclassify lines of a columnless table
                        error = 0
                if error > self._reclassify_threshold:
                    free_lines.append((line.predicted_path, line))
                else:
                    detected_lines[
                        (pred_name, class_name, block_id, line_id)] = line

        reliable = reliable_contours(blocks, free_lines, detected_lines)

        import json
        with output.lines() as zf:
            zf.writestr("meta.json", json.dumps(dict(
                version=1, min_confidence=self._min_confidence)))
            for line_path, line in detected_lines.items():
                zf.writestr("/".join(map(str, line_path)) + ".json",
                            json.dumps(line.info))

        with output.contours(copy_meta_from=aggregate) as zf:
            for k, contour in reliable.items():
                if contour.is_empty:
                    continue
                zf.writestr("/".join(map(str, k)) + ".wkt", contour.wkt)
        return dict(n_lines=len(detected_lines),
                    n_reclassified=len(free_lines))


@click.command()
@click.option("--text-regions", type=str,
              default="regions/TEXT, regions/TABULAR")
@click.option("--reclassify-lines-threshold", type=float, default=0.5)
@click.argument("data_path", type=click.Path(exists=True), required=True)
@Processor.options
def detect_lines(data_path, **kwargs):
    """Detect reliable lines for documents in DATA_PATH."""
    LineDetectionProcessor(kwargs).traverse(data_path)


if __name__ == "__main__":
    detect_lines()

"""detect.dewarp — build the dewarping grid, transform contours
(CLI stage 4).

Reference contract: origami/batch/detect/dewarp.py (contours.0 + flow ->
dewarp.zip + contours.1.zip). The grid itself is built on device in one
jit graph (origami_tpu.core.dewarp); contour transformation into the
dewarped frame happens on host through the grid's scattered forward
interpolator.
"""

from __future__ import annotations

import logging
from pathlib import Path

import click

from origami_tpu import geometry as G
from origami_tpu.batch.core.processor import Processor
from origami_tpu.batch.core.io import Artifact, Input, Output, Stage
from origami_tpu.core.dewarp import Grid


class DewarpProcessor(Processor):
    def __init__(self, options):
        super().__init__(options)
        self._opt = options

    @property
    def processor_name(self):
        return "origami_tpu.batch.detect.dewarp"

    @staticmethod
    def options(f):
        opts = [
            click.option("--grid-cell-size", type=int, default=25,
                         help="Dewarp grid cell size in pixels."),
            click.option("--region-area", type=float, default=0,
                         help="Drop dewarped regions below this relative "
                              "area."),
        ]
        for o in opts:
            f = o(f)
        return f

    def artifacts(self):
        return [
            ("warped", Input(Artifact.CONTOURS, Artifact.FLOW,
                             stage=Stage.WARPED)),
            ("output", Output(Artifact.DEWARPING_TRANSFORM,
                              Artifact.CONTOURS, stage=Stage.DEWARPED)),
        ]

    def process(self, page_path, warped, output):
        if not warped.regions.by_path and not warped.separators.by_path:
            return

        page = warped.page
        flow = warped.flow
        grid = Grid.create(
            page.size(), flow["h"], flow["v"],
            grid_res=self._opt.get("grid_cell_size", 25))

        min_area = grid.geometry.rel_area(self._opt.get("region_area", 0))
        transformer = grid.transformer

        lost = 0
        with output.contours(copy_meta_from=warped) as zf:
            for parts, geom in warped.contours:
                dew = G.transform(transformer, geom)
                if dew.is_empty or (dew.geom_type == "Polygon"
                                    and dew.area < min_area):
                    lost += 1
                    continue
                if dew.geom_type == "Polygon" and not dew.is_valid:
                    dew = G.make_valid(dew)
                zf.writestr("/".join(parts) + ".wkt", dew.wkt)
        if lost:
            logging.warning("lost %d contours during dewarping", lost)

        with output.dewarping_transform() as f:
            grid.save(f)
        # prefetch the dewarped page + its Sauvola mask into the
        # process-wide LRUs (keys fingerprint the grid VALUES, so the
        # save/load float32 roundtrip hits the same slots): this stage
        # is device-bound, so layout/lines (the host consumers) skip
        # the remap + binarize + tunnel transfer on their critical path
        try:
            from origami_tpu.core.page import Page as _Page
            _Page(page.path, grid).dewarped_binarized
        except Exception:
            pass
        return dict(grid_shape=list(grid.points("sample").shape[:2]),
                    warping=grid.warping)


@click.command()
@click.argument("data_path", type=click.Path(exists=True), required=True)
@Processor.options
@DewarpProcessor.options
def dewarp(data_path, **kwargs):
    """Dewarp documents in DATA_PATH."""
    DewarpProcessor(kwargs).traverse(data_path)


if __name__ == "__main__":
    dewarp()

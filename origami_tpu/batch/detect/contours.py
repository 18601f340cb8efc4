"""detect.contours — vectorize label masks into region polygons and
separator polylines (CLI stage 2).

Reference contract: origami/batch/detect/contours.py (segment.zip ->
contours.0.zip). Region masks run through the polygon pipeline
(Decompose -> area filter -> frame noise filter); separator masks through
device thinning + skeleton polyline estimation. Label-space shapes are
scaled to page coordinates before writing.
"""

from __future__ import annotations

import json
from pathlib import Path

import click
import numpy as np

from origami_tpu import geometry as G
from origami_tpu.batch.core.processor import Processor
from origami_tpu.batch.core.io import Artifact, Input, Output, Stage
from origami_tpu.core.page import Page
from origami_tpu.core.segment import PredictorType
from origami_tpu.core import contours as C
from origami_tpu.core.math import Geometry


class ContoursProcessor(Processor):
    def __init__(self, options):
        super().__init__(options)
        self._opt = options

    @property
    def processor_name(self):
        return "origami_tpu.batch.detect.contours"

    @staticmethod
    def options(f):
        opts = [
            click.option("--export-images", is_flag=True, default=False,
                         help="Also store region crops in the zip."),
            click.option("--region-area", type=float, default=0.0025,
                         help="Ignore regions below this relative area."),
            click.option("--margin-distance", type=float, default=0.01,
                         help="Border distance for margin-noise removal."),
            click.option("--separator-threshold", type=float,
                         default=4 / 1000,
                         help="Relative separator simplification."),
        ]
        for o in opts:
            f = o(f)
        return f

    def artifacts(self):
        return [
            ("input", Input(Artifact.SEGMENTATION)),
            ("output", Output(Artifact.CONTOURS, stage=Stage.WARPED)),
        ]

    def _scale(self, label_size, page_size):
        sx = page_size[0] / label_size[0]
        sy = page_size[1] / label_size[1]
        return lambda geom: G.ops.transform(
            lambda x, y: (x * sx, y * sy), geom)

    def process(self, p, input, output):
        seg = input.segmentation
        page = Page(p)
        page_size = page.size()

        opt = self._opt
        with output.contours() as zf:
            predictions = []
            for pred in seg.predictions:
                label_geom = Geometry(*pred.size)
                to_page = self._scale(pred.size, page_size)
                if pred.type == PredictorType.REGION:
                    pipe = C.pipeline(
                        C.Contours(),
                        C.Decompose(),
                        C.FilterByArea(label_geom.rel_area(
                            opt.get("region_area", 0.0025))),
                        C.HeuristicFrameDetector(
                            pred.size, opt.get("margin_distance", 0.01)),
                    )
                    build = C.multi_class_constructor(
                        lambda label: pipe, list(pred.classes))
                    for cls, shapes in build(pred.labels).items():
                        for i, poly in enumerate(shapes):
                            page_poly = to_page(poly)
                            zf.writestr(
                                "%s/%s/%d.wkt" % (pred.name, cls.name, i),
                                page_poly.wkt)
                            if opt.get("export_images"):
                                import io as _io
                                import PIL.Image
                                from origami_tpu.core.mask import Mask
                                crop, _pos = Mask(page_poly) \
                                    .extract_image(page.warped)
                                with _io.BytesIO() as buf:
                                    PIL.Image.fromarray(crop).save(
                                        buf, "png")
                                    zf.writestr(
                                        "%s/%s/%d.png"
                                        % (pred.name, cls.name, i),
                                        buf.getvalue())
                else:
                    tol = label_geom.rel_length(
                        opt.get("separator_threshold", 4 / 1000))
                    build = C.multi_class_constructor(
                        lambda label: C.pipeline(
                            C.EstimatePolyline(label.orientation,
                                               simplify_tol=tol)),
                        list(pred.classes))
                    for cls, polylines in build(pred.labels).items():
                        widths = []
                        for i, pl in enumerate(polylines):
                            zf.writestr(
                                "%s/%s/%d.wkt" % (pred.name, cls.name, i),
                                to_page(pl.line_string).wkt)
                            widths.append(pl.width)
                        zf.writestr(
                            "%s/%s/meta.json" % (pred.name, cls.name),
                            json.dumps(dict(width=widths)))
                predictions.append(dict(name=pred.name,
                                        type=pred.type.name))
            zf.writestr("meta.json", json.dumps(dict(
                version=2, predictions=predictions)))


@click.command()
@click.argument("data_path", type=click.Path(exists=True), required=True)
@Processor.options
@ContoursProcessor.options
def extract_contours(data_path, **kwargs):
    """Extract contours for all pages in DATA_PATH."""
    ContoursProcessor(kwargs).traverse(data_path)


if __name__ == "__main__":
    extract_contours()

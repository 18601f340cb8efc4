"""annotate.contours — render contour overlays for a chosen stage
(reference: origami/batch/annotate/contours.py -> annotation.*.jpg)."""

from __future__ import annotations

from pathlib import Path

import click

from origami_tpu.batch.core.processor import Processor
from origami_tpu.batch.core.io import (
    Annotation, Artifact, Input, Output, Stage)
from origami_tpu.batch.annotate.utils import (
    AnnotateWriter, color_for, draw_geometry, to_canvas)


class AnnotateContoursProcessor(Processor):
    def __init__(self, options):
        super().__init__(options)
        self._stage = Stage[options.get("stage", "RELIABLE").upper()]

    @property
    def processor_name(self):
        return "origami_tpu.batch.annotate.contours"

    def artifacts(self):
        extra = [Artifact.DEWARPING_TRANSFORM] \
            if self._stage.is_dewarped else []
        return [
            ("input", Input(Artifact.CONTOURS, *extra,
                            stage=self._stage)),
            ("output", Output(
                Annotation("contours.%d" % self._stage.value))),
        ]

    def process(self, page_path, input, output):
        page = input.page
        canvas = to_canvas(page.pixels(self._stage.is_dewarped))
        for parts, geom in input.contours:
            label = parts[1]
            draw_geometry(canvas, geom, color_for(label),
                          label="/".join(parts[1:]))
        output.annotation(AnnotateWriter(canvas))


@click.command()
@click.argument("data_path", type=click.Path(exists=True), required=True)
@click.option("--stage", type=str, default="reliable",
              help="warped | dewarped | aggregate | reliable")
@Processor.options
def annotate_contours(data_path, **kwargs):
    """Render contour overlays for pages in DATA_PATH."""
    AnnotateContoursProcessor(kwargs).traverse(data_path)


if __name__ == "__main__":
    annotate_contours()

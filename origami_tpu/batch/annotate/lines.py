"""annotate.lines — render line polygons with confidence shading
(reference: origami/batch/annotate/lines.py)."""

from __future__ import annotations

from pathlib import Path

import click
import numpy as np

from origami_tpu import geometry as G

from origami_tpu.batch.core.processor import Processor
from origami_tpu.batch.core.io import (
    Annotation, Artifact, Input, Output, Stage)
from origami_tpu.batch.annotate.utils import (
    AnnotateWriter, draw_geometry, to_canvas)


def _confidence_color(conf):
    # red (low) -> green (high), BGR
    c = float(np.clip(conf, 0, 1))
    return (0, int(200 * c + 30), int(200 * (1 - c) + 30))


class AnnotateLinesProcessor(Processor):
    def __init__(self, options):
        super().__init__(options)
        self._stage = Stage[options.get("stage", "RELIABLE").upper()]

    @property
    def processor_name(self):
        return "origami_tpu.batch.annotate.lines"

    def artifacts(self):
        return [
            ("input", Input(Artifact.CONTOURS, Artifact.LINES,
                            stage=self._stage)),
            ("output", Output(Annotation("lines"))),
        ]

    def process(self, page_path, input, output):
        page = input.page
        canvas = to_canvas(page.pixels(self._stage.is_dewarped))
        for path, line in input.lines.by_path.items():
            color = _confidence_color(line.confidence)
            draw_geometry(canvas, line.image_space_polygon, color,
                          thickness=1, fill_alpha=0.25)
            draw_geometry(canvas, G.LineString(line.baseline),
                          (255, 100, 0), thickness=1)
        output.annotation(AnnotateWriter(canvas))


@click.command()
@click.argument("data_path", type=click.Path(exists=True), required=True)
@click.option("--stage", type=str, default="reliable")
@Processor.options
def annotate_lines(data_path, **kwargs):
    """Render line overlays for pages in DATA_PATH."""
    AnnotateLinesProcessor(kwargs).traverse(data_path)


if __name__ == "__main__":
    annotate_lines()

"""annotate.flow — render flow samples and separators (reference:
origami/batch/annotate/flow.py)."""

from __future__ import annotations

import math
from pathlib import Path

import click
import numpy as np

from origami_tpu.batch.core.processor import Processor
from origami_tpu.batch.core.io import (
    Annotation, Artifact, Input, Output, Stage)
from origami_tpu.batch.annotate.utils import (
    AnnotateWriter, color_for, draw_arrow, draw_geometry, to_canvas)


class AnnotateFlowProcessor(Processor):
    @property
    def processor_name(self):
        return "origami_tpu.batch.annotate.flow"

    def artifacts(self):
        return [
            ("warped", Input(Artifact.CONTOURS, Artifact.FLOW,
                             stage=Stage.WARPED)),
            ("output", Output(Annotation("flow"))),
        ]

    def process(self, page_path, warped, output):
        canvas = to_canvas(warped.page.pixels(False))
        for parts, geom in warped.separators.by_path.items():
            draw_geometry(canvas, geom, color_for(parts[1]), thickness=3)
        flow = warped.flow
        for kind, color in (("h", (0, 64, 255)), ("v", (255, 64, 0))):
            samples = flow[kind]
            L = 30.0
            for (x, y), phi in zip(samples.points, samples.values):
                dx, dy = math.cos(phi) * L, math.sin(phi) * L
                draw_arrow(canvas, (x - dx / 2, y - dy / 2),
                           (x + dx / 2, y + dy / 2), color)
        output.annotation(AnnotateWriter(canvas))


@click.command()
@click.argument("data_path", type=click.Path(exists=True), required=True)
@Processor.options
def annotate_flow(data_path, **kwargs):
    """Render flow overlays for pages in DATA_PATH."""
    AnnotateFlowProcessor(kwargs).traverse(data_path)


if __name__ == "__main__":
    annotate_flow()

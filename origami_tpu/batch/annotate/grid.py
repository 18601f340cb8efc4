"""annotate.grid — render the dewarping grid over the warped page
(reference: origami/batch/annotate/grid.py)."""

from __future__ import annotations

from pathlib import Path

import click
import cv2
import numpy as np

from origami_tpu.batch.core.processor import Processor
from origami_tpu.batch.core.io import (
    Annotation, Artifact, Input, Output)
from origami_tpu.batch.annotate.utils import AnnotateWriter, to_canvas


class AnnotateGridProcessor(Processor):
    @property
    def processor_name(self):
        return "origami_tpu.batch.annotate.grid"

    def artifacts(self):
        return [
            ("input", Input(Artifact.DEWARPING_TRANSFORM)),
            ("output", Output(Annotation("dewarp"))),
        ]

    def process(self, page_path, input, output):
        from origami_tpu.core.page import Page
        page = Page(page_path)
        canvas = to_canvas(page.pixels(False))
        grid = input.grid.points("sample")
        h, w = grid.shape[:2]
        for gy in range(h):
            pts = np.round(grid[gy]).astype(np.int32)
            cv2.polylines(canvas, [pts], False, (0, 0, 200), 1)
        for gx in range(w):
            pts = np.round(grid[:, gx]).astype(np.int32)
            cv2.polylines(canvas, [pts], False, (160, 0, 0), 1)
        output.annotation(AnnotateWriter(canvas))


@click.command()
@click.argument("data_path", type=click.Path(exists=True), required=True)
@Processor.options
def annotate_grid(data_path, **kwargs):
    """Render dewarp grid overlays for pages in DATA_PATH."""
    AnnotateGridProcessor(kwargs).traverse(data_path)


if __name__ == "__main__":
    annotate_grid()

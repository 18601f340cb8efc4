"""annotate.layout — render aggregate regions + reading order arrows
(reference: origami/batch/annotate/layout.py)."""

from __future__ import annotations

from pathlib import Path

import click
import numpy as np

from origami_tpu.batch.core.processor import Processor
from origami_tpu.batch.core.io import (
    Annotation, Artifact, Input, Output, Stage)
from origami_tpu.batch.annotate.utils import (
    AnnotateWriter, color_for, draw_arrow, draw_geometry, to_canvas)


class AnnotateLayoutProcessor(Processor):
    @property
    def processor_name(self):
        return "origami_tpu.batch.annotate.layout"

    def artifacts(self):
        return [
            ("aggregate", Input(Artifact.CONTOURS, stage=Stage.AGGREGATE)),
            ("reliable", Input(Artifact.ORDER, stage=Stage.RELIABLE,
                               take_any=True)),
            ("output", Output(Annotation("layout"))),
        ]

    def process(self, page_path, aggregate, reliable, output):
        page = aggregate.page
        canvas = to_canvas(page.pixels(True))
        centers = {}
        for parts, geom in aggregate.contours:
            draw_geometry(canvas, geom, color_for(parts[1]),
                          label="/".join(parts[1:]))
            c = geom.centroid
            centers["/".join(parts)] = (c.x, c.y)
        try:
            order = reliable.order["orders"].get("*", [])
        except FileNotFoundError:
            order = []
        prev = None
        for name in order:
            c = centers.get(name)
            if c is None:
                # order paths may be combined table paths
                base = name.split("/")
                for k, v in centers.items():
                    if k.startswith("/".join(base[:2])) and \
                            k.split("/")[2].split(".")[0] == base[-1]:
                        c = v
                        break
            if c is None:
                continue
            if prev is not None:
                draw_arrow(canvas, prev, c, (0, 0, 255), 3)
            prev = c
        output.annotation(AnnotateWriter(canvas))


@click.command()
@click.argument("data_path", type=click.Path(exists=True), required=True)
@Processor.options
def annotate_layout(data_path, **kwargs):
    """Render layout + reading order overlays for DATA_PATH."""
    AnnotateLayoutProcessor(kwargs).traverse(data_path)


if __name__ == "__main__":
    annotate_layout()

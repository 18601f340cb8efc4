"""utils.dewarp — dump dewarped page images (reference:
origami/batch/utils/dewarp.py)."""

from __future__ import annotations

from pathlib import Path

import click
import numpy as np
import PIL.Image

from origami_tpu.batch.core.processor import Processor
from origami_tpu.batch.core.io import Artifact, Input, Stage


class DewarpImageProcessor(Processor):
    def __init__(self, options):
        super().__init__(options)
        self._out = Path(options["output"]) if options.get("output") \
            else None

    @property
    def processor_name(self):
        return "origami_tpu.batch.utils.dewarp"

    def artifacts(self):
        return [("input", Input(Artifact.DEWARPING_TRANSFORM))]

    def process(self, page_path, input):
        from origami_tpu.core.page import Page
        page = Page(page_path, input.grid)
        im = PIL.Image.fromarray(page.dewarped)
        if self._out:
            self._out.mkdir(parents=True, exist_ok=True)
            dst = self._out / (Path(page_path).stem + ".dewarped.jpg")
        else:
            dst = input.data_path / "dewarped.jpg"
        im.save(str(dst), "JPEG", quality=90)


@click.command()
@click.argument("data_path", type=click.Path(exists=True), required=True)
@click.option("-o", "--output", type=click.Path(), default=None)
@Processor.options
def dewarp_images(data_path, **kwargs):
    """Write dewarped page images for DATA_PATH."""
    DewarpImageProcessor(kwargs).traverse(data_path)


if __name__ == "__main__":
    dewarp_images()

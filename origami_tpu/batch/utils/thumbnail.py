"""utils.thumbnail — JPEG page thumbnails (reference:
origami/batch/utils/thumbnail.py)."""

from __future__ import annotations

from pathlib import Path

import click
import numpy as np
import PIL.Image

from origami_tpu.batch.core.processor import Processor
from origami_tpu.batch.core.io import Artifact, Output


class ThumbnailProcessor(Processor):
    def __init__(self, options):
        super().__init__(options)
        self._max_size = options.get("max_size", 1024)

    @property
    def processor_name(self):
        return "origami_tpu.batch.utils.thumbnail"

    def artifacts(self):
        return [("output", Output(Artifact.THUMBNAIL))]

    def process(self, page_path, output):
        im = PIL.Image.open(str(page_path)).convert("L")
        im.thumbnail((self._max_size, self._max_size))
        im.save(str(output.path(Artifact.THUMBNAIL)), "JPEG", quality=85)


@click.command()
@click.argument("data_path", type=click.Path(exists=True), required=True)
@click.option("--max-size", type=int, default=1024)
@Processor.options
def thumbnail(data_path, **kwargs):
    """Write thumbnails for all pages in DATA_PATH."""
    ThumbnailProcessor(kwargs).traverse(data_path)


if __name__ == "__main__":
    thumbnail()

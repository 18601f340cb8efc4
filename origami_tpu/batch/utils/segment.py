"""utils.segment — convert legacy segmentation artifacts to segment.zip
(reference: origami/batch/utils/segment.py)."""

from __future__ import annotations

from pathlib import Path

import click

from origami_tpu.batch.core.processor import Processor
from origami_tpu.batch.core.io import find_data_path
from origami_tpu.tool.migrate import convert_legacy_segmentation


class SegmentConverterProcessor(Processor):
    def __init__(self, options):
        options = dict(options)
        options.setdefault("lock_strategy", "NONE")
        super().__init__(options)
        self._n = 0

    @property
    def processor_name(self):
        return "origami_tpu.batch.utils.segment"

    def artifacts(self):
        return []

    def prepare_process(self, page_path):
        return {}

    def process(self, page_path, **kwargs):
        data_path = find_data_path(page_path)
        legacy = data_path / "segmentation.pickle"
        target = data_path / "segment.zip"
        if legacy.exists() and (self._overwrite or not target.exists()):
            convert_legacy_segmentation(legacy, target)
            self._n += 1


@click.command()
@click.argument("data_path", type=click.Path(exists=True), required=True)
@Processor.options
def convert_segmentation(data_path, **kwargs):
    """Convert legacy segmentation artifacts in DATA_PATH."""
    p = SegmentConverterProcessor(kwargs)
    p.traverse(data_path)
    print("converted %d pages." % p._n)


if __name__ == "__main__":
    convert_segmentation()

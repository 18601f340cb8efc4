"""export.lines — dump detected line images (reference:
origami/batch/export/lines.py), named by extraction options, with
optional ground-truth texts from the annotation DB."""

from __future__ import annotations

from pathlib import Path

import click
import PIL.Image

from origami_tpu.batch.core.processor import Processor
from origami_tpu.batch.core.io import Artifact, Input, Stage
from origami_tpu.batch.core.lines import LineExtractor


class LineExportProcessor(Processor):
    def __init__(self, options):
        super().__init__(options)
        self._opt = options
        self._out = Path(options["output"])
        self._line_height = options.get("line_height", 48)

    @property
    def processor_name(self):
        return "origami_tpu.batch.export.lines"

    def artifacts(self):
        return [
            ("reliable", Input(Artifact.LINES, Artifact.TABLES,
                               stage=Stage.RELIABLE)),
        ]

    def process(self, page_path, reliable):
        extractor = LineExtractor(
            reliable.tables, self._line_height, self._opt,
            min_confidence=reliable.lines.min_confidence)
        strips = extractor(reliable.lines.by_path)
        tag = "dw%d-ds%d-h%d" % (
            0 if self._opt.get("do_not_dewarp") else 1,
            0 if self._opt.get("do_not_deskew") else 1,
            self._line_height)
        out_dir = self._out / Path(page_path).stem / tag
        out_dir.mkdir(parents=True, exist_ok=True)
        for path, strip in strips:
            name = "-".join(map(str, path)).replace("/", "-")
            PIL.Image.fromarray(strip).save(
                str(out_dir / (name + ".png")))
        return dict(n_lines=len(strips))


@click.command()
@click.argument("data_path", type=click.Path(exists=True), required=True)
@click.option("-o", "--output", type=click.Path(), required=True)
@click.option("--line-height", type=int, default=48)
@Processor.options
@LineExtractor.options
def export_lines(data_path, **kwargs):
    """Export line images for pages in DATA_PATH."""
    LineExportProcessor(kwargs).traverse(data_path)


if __name__ == "__main__":
    export_lines()

"""export.pagexml — minimal Page-XML from warped lines only (reference:
origami/batch/export/pagexml.py), useful before layout/order exist."""

from __future__ import annotations

from pathlib import Path

import click

from origami_tpu.batch.core.processor import Processor
from origami_tpu.batch.core.io import Artifact, Input, Stage


class PageXMLExportProcessor(Processor):
    def __init__(self, options):
        super().__init__(options)
        self._out = Path(options["output"])

    @property
    def processor_name(self):
        return "origami_tpu.batch.export.pagexml"

    def artifacts(self):
        return [
            ("warped", Input(Artifact.LINES, stage=Stage.WARPED)),
        ]

    def process(self, page_path, warped):
        from origami_tpu.pagexml.pagexml import Page as XmlPage
        page = warped.page
        doc = XmlPage(Path(page_path).name, page.size(False))
        region_ids = []
        by_block = {}
        for path, line in warped.lines.by_path.items():
            by_block.setdefault(tuple(path[:3]), []).append((path, line))
        for block_path, lines in sorted(by_block.items()):
            rid = "r_" + "_".join(map(str, block_path))
            reg = doc.append_region("TextRegion", rid)
            block = lines[0][1].block
            reg.append_coords(
                block.image_space_polygon._all_coords())
            for path, line in sorted(lines):
                tl = reg.append_text_line("l_" + "_".join(map(str, path)))
                tl.append_coords(line.image_space_polygon._all_coords())
                tl.append_baseline(line.baseline)
            region_ids.append(rid)
        doc.append_reading_order(region_ids)
        self._out.mkdir(parents=True, exist_ok=True)
        doc.write(self._out / (Path(page_path).stem + ".xml"))


@click.command()
@click.argument("data_path", type=click.Path(exists=True), required=True)
@click.option("-o", "--output", type=click.Path(), required=True)
@Processor.options
def export_pagexml(data_path, **kwargs):
    """Export minimal Page-XML (warped lines) for DATA_PATH."""
    PageXMLExportProcessor(kwargs).traverse(data_path)


if __name__ == "__main__":
    export_pagexml()

"""utils.rtext — export per-region text files from composed Page-XML
(reference: origami/batch/utils/rtext.py)."""

from __future__ import annotations

import zipfile
from pathlib import Path

import click

from origami_tpu.batch.core.processor import Processor
from origami_tpu.batch.core.io import Artifact, Input


class RegionTextProcessor(Processor):
    def __init__(self, options):
        super().__init__(options)
        self._out = Path(options["output"])

    @property
    def processor_name(self):
        return "origami_tpu.batch.utils.rtext"

    def artifacts(self):
        return [("input", Input(Artifact.COMPOSE))]

    def process(self, page_path, input):
        from lxml import etree
        with zipfile.ZipFile(input.path(Artifact.COMPOSE)) as zf:
            if "page.xml" not in zf.namelist():
                return
            root = etree.fromstring(zf.read("page.xml"))
        out_dir = self._out / Path(page_path).stem
        out_dir.mkdir(parents=True, exist_ok=True)
        for i, reg in enumerate(root.iter("{*}TextRegion")):
            uni = reg.findall("./{*}TextEquiv/{*}Unicode")
            text = uni[-1].text if uni and uni[-1].text else ""
            rid = reg.get("id", "r%d" % i)
            (out_dir / ("%s.txt" % rid)).write_text(text)


@click.command()
@click.argument("data_path", type=click.Path(exists=True), required=True)
@click.option("-o", "--output", type=click.Path(), required=True)
@Processor.options
def rtext(data_path, **kwargs):
    """Export per-region texts for pages in DATA_PATH."""
    RegionTextProcessor(kwargs).traverse(data_path)


if __name__ == "__main__":
    rtext()

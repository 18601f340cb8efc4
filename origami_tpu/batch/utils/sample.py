"""utils.sample — copy artifacts of chosen pages for corpus QA.

Reference contract: origami/batch/utils/sample.py (copy/unpack selected
artifacts of random or named pages into a directory or zip).
"""

from __future__ import annotations

import random
import shutil
import zipfile
from pathlib import Path

import click

from origami_tpu.batch.core.processor import Processor
from origami_tpu.batch.core.io import find_data_path, parse_artifact


class SampleProcessor(Processor):
    def __init__(self, options):
        options = dict(options)
        options.setdefault("lock_strategy", "NONE")
        super().__init__(options)
        self._specs = [parse_artifact(s.strip())
                       for s in options["artifacts"].split(",")
                       if s.strip()]
        self._out = Path(options["output"])
        self._n = options.get("n", 0)
        self._unpack = options.get("unpack", False)
        self._pages = []

    def artifacts(self):
        return []

    def prepare_process(self, page_path):
        return {}

    def process(self, page_path, **kwargs):
        self._pages.append(Path(page_path))

    def export(self):
        pages = self._pages
        if self._n and len(pages) > self._n:
            pages = random.Random(0).sample(pages, self._n)
        to_zip = self._out.suffix == ".zip"
        if to_zip:
            zf = zipfile.ZipFile(self._out, "w", zipfile.ZIP_DEFLATED)
        else:
            self._out.mkdir(parents=True, exist_ok=True)
        n = 0
        for page in pages:
            data_path = find_data_path(page)
            files = [page]
            for artifact, stage in self._specs:
                p = data_path / artifact.filename(stage)
                if p.exists():
                    files.append(p)
            for f in files:
                rel = "%s/%s" % (page.stem, f.name)
                if to_zip:
                    zf.write(f, rel)
                elif self._unpack and f.suffix == ".zip":
                    with zipfile.ZipFile(f) as inner:
                        inner.extractall(
                            self._out / page.stem / f.stem)
                else:
                    dst = self._out / page.stem
                    dst.mkdir(parents=True, exist_ok=True)
                    shutil.copy2(f, dst / f.name)
                n += 1
        if to_zip:
            zf.close()
        print("exported %d files from %d pages." % (n, len(pages)))


@click.command()
@click.argument("data_path", type=click.Path(exists=True), required=True)
@click.option("-a", "--artifacts", type=str, required=True)
@click.option("-o", "--output", type=click.Path(), required=True,
              help="output directory or .zip")
@click.option("-n", type=int, default=0,
              help="sample this many random pages (0 = all)")
@click.option("--unpack", is_flag=True, default=False)
@Processor.options
def sample(data_path, **kwargs):
    """Export artifact samples from DATA_PATH."""
    p = SampleProcessor(kwargs)
    p.traverse(data_path)
    p.export()


if __name__ == "__main__":
    sample()

"""GT sampling: pick random lines per region type into the annotation DB,
optionally importing existing Page-XML transcriptions.

Reference counterpart: origami/tool/sample.py."""

from __future__ import annotations

import random
from pathlib import Path

import click

from origami_tpu.batch.core.processor import Processor
from origami_tpu.batch.core.io import Artifact, Input, Stage
from origami_tpu.tool.lineload import AnnotationDB


class SampleLinesProcessor(Processor):
    def __init__(self, options):
        options = dict(options)
        options.setdefault("lock_strategy", "NONE")
        super().__init__(options)
        self._db = AnnotationDB(options["db_path"])
        self._per_type = options.get("per_type", 5)
        self._rng = random.Random(options.get("seed", 0))
        self._import_gt = options.get("import_transcriptions", False)

    @property
    def processor_name(self):
        return "origami_tpu.tool.sample"

    def artifacts(self):
        return [("reliable", Input(Artifact.LINES, stage=Stage.RELIABLE))]

    def process(self, page_path, reliable):
        by_type = {}
        for path, line in reliable.lines.by_path.items():
            by_type.setdefault(path[:2], []).append(path)
        gt = None
        if self._import_gt:
            from origami_tpu.pagexml.transcriptions import (
                TranscriptionReader)
            gt_path = Path(page_path).with_suffix(".gt.page.xml")
            if gt_path.exists():
                gt = TranscriptionReader(
                    gt_path, reliable.lines.by_path)
        for t, paths in by_type.items():
            chosen = self._rng.sample(
                paths, min(self._per_type, len(paths)))
            for p in chosen:
                text = gt.text_for("/".join(map(str, p))) if gt else None
                self._db.add_line(page_path, "/".join(map(str, p)),
                                  annotation=text)


@click.command()
@click.argument("data_path", type=click.Path(exists=True), required=True)
@click.option("--db-path", type=click.Path(), required=True)
@click.option("--per-type", type=int, default=5)
@click.option("--seed", type=int, default=0)
@click.option("--import-transcriptions", is_flag=True, default=False)
@Processor.options
def sample_lines(data_path, **kwargs):
    """Sample GT candidate lines from DATA_PATH into the annotation DB."""
    SampleLinesProcessor(kwargs).traverse(data_path)


if __name__ == "__main__":
    sample_lines()

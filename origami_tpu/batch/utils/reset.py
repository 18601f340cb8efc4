"""utils.reset — delete selected artifacts to roll a corpus back.

Reference contract: origami/batch/utils/reset.py (parse artifact specs
like "contours/warped" or "ocr" and remove those files per page).
"""

from __future__ import annotations

import os
from pathlib import Path

import click

from origami_tpu.batch.core.processor import Processor
from origami_tpu.batch.core.io import find_data_path, parse_artifact


class ResetProcessor(Processor):
    def __init__(self, options):
        options = dict(options)
        options.setdefault("lock_strategy", "NONE")
        super().__init__(options)
        self._specs = [parse_artifact(s.strip())
                       for s in options["artifacts"].split(",")
                       if s.strip()]
        self._dry = options.get("dry_run", False)
        self._n_removed = 0

    def artifacts(self):
        return []

    def prepare_process(self, page_path):
        return {}

    def process(self, page_path, **kwargs):
        data_path = find_data_path(page_path)
        if not data_path.exists():
            return
        for artifact, stage in self._specs:
            name = artifact.filename(stage)
            p = data_path / name
            if p.exists():
                if self._dry:
                    print("would remove %s" % p)
                else:
                    os.remove(p)
                self._n_removed += 1


@click.command()
@click.argument("data_path", type=click.Path(exists=True), required=True)
@click.option("-a", "--artifacts", type=str, required=True,
              help="comma-separated artifact specs, e.g. "
                   "'contours/warped, ocr'")
@click.option("--dry-run", is_flag=True, default=False)
@Processor.options
def reset(data_path, **kwargs):
    """Delete selected artifacts for all pages in DATA_PATH."""
    p = ResetProcessor(kwargs)
    p.traverse(data_path)
    print("%s %d artifacts." % (
        "would remove" if kwargs.get("dry_run") else "removed",
        p._n_removed))


if __name__ == "__main__":
    reset()

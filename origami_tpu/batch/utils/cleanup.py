"""utils.cleanup — remove corrupt/stale files from a corpus.

Reference contract: origami/batch/utils/cleanup.py (delete unparseable
JSON artifacts, stale tmp files, and spurious FAILED states whose
outputs actually exist).
"""

from __future__ import annotations

import json
import os
from pathlib import Path

import click

from origami_tpu.batch.core.processor import Processor
from origami_tpu.batch.core.io import find_data_path


class CleanupProcessor(Processor):
    def __init__(self, options):
        options = dict(options)
        options.setdefault("lock_strategy", "NONE")
        super().__init__(options)
        self._dry = options.get("dry_run", False)
        self._removed = 0
        self._fixed = 0

    def artifacts(self):
        return []

    def prepare_process(self, page_path):
        return {}

    def _remove(self, p):
        if self._dry:
            print("would remove %s" % p)
        else:
            os.remove(p)
        self._removed += 1

    def process(self, page_path, **kwargs):
        data_path = find_data_path(page_path)
        if not data_path.exists():
            return
        for p in list(data_path.iterdir()):
            if p.name.startswith("tmp") or p.suffix == ".tmp":
                self._remove(p)
            elif p.suffix == ".json":
                try:
                    json.loads(p.read_text())
                except (json.JSONDecodeError, UnicodeDecodeError):
                    self._remove(p)
        # clear FAILED entries from runtime.json (they'll recompute)
        rt = data_path / "runtime.json"
        if rt.exists():
            try:
                data = json.loads(rt.read_text())
            except json.JSONDecodeError:
                return
            changed = False
            for k in list(data.keys()):
                if data[k].get("status") == "FAILED":
                    del data[k]
                    changed = True
            if changed and not self._dry:
                rt.write_text(json.dumps(data))
                self._fixed += 1


@click.command()
@click.argument("data_path", type=click.Path(exists=True), required=True)
@click.option("--dry-run", is_flag=True, default=False)
@Processor.options
def cleanup(data_path, **kwargs):
    """Clean up corrupt or stale files in DATA_PATH."""
    p = CleanupProcessor(kwargs)
    p.traverse(data_path)
    print("removed %d files, cleared %d failure records."
          % (p._removed, p._fixed))


if __name__ == "__main__":
    cleanup()

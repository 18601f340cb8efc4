"""Legacy artifact migration.

Counterpart of origami/tool/migrate.py + batch/utils/segment.py: convert
legacy pickled segmentation artifacts into the current segment.zip
format, and rename old-style artifact files to current names.
"""

from __future__ import annotations

import pickle
import zipfile
from pathlib import Path

import click
import numpy as np

from origami_tpu.core.segment import Prediction, Segmentation


def convert_legacy_segmentation(pickle_path, out_path):
    """Legacy pickle: list of (key, (enum_name, classes_dict, npz_bytes))
    tuples -> segment.zip."""
    import io as _io
    with open(pickle_path, "rb") as f:
        data = pickle.load(f)
    predictions = []
    for _k, (enum_name, enum_dict, labels_data) in data:
        kind = "REGION" if "Region" in enum_name else "SEPARATOR"
        with _io.BytesIO(labels_data) as buf:
            labels = np.load(buf)["arr_0"]
        predictions.append(Prediction(
            kind, kind.lower() + "s", labels, enum_dict))
    Segmentation(predictions).save(out_path)


_RENAMES = {
    "segmentation.zip": "segment.zip",
    "contours.zip": "contours.0.zip",
    "lines.zip": "lines.0.zip",
}


@click.command()
@click.argument("data_path", type=click.Path(exists=True), required=True)
@click.option("--dry-run", is_flag=True, default=False)
def migrate(data_path, dry_run):
    """Migrate legacy artifact layouts under DATA_PATH."""
    n = 0
    for out_dir in Path(data_path).glob("**/*.out"):
        if not out_dir.is_dir():
            continue
        for old, new in _RENAMES.items():
            src = out_dir / old
            dst = out_dir / new
            if src.exists() and not dst.exists():
                if dry_run:
                    print("would rename %s -> %s" % (src, dst))
                else:
                    src.rename(dst)
                n += 1
        legacy = out_dir / "segmentation.pickle"
        if legacy.exists():
            if dry_run:
                print("would convert %s" % legacy)
            else:
                convert_legacy_segmentation(
                    legacy, out_dir / "segment.zip")
            n += 1
    print("migrated %d artifacts." % n)


if __name__ == "__main__":
    migrate()

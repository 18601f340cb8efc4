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


def import_model_meta(network_path, out_path, width=1.0, s2d=4,
                      seed=0):
    """Import a reference model directory's meta.json contract
    (classes/type/full_size/tile_size/tile_beta, the keys
    origami/core/predict.py:171-228 reads) into a native model dir.

    The reference's Keras .h5 WEIGHTS are architecturally incompatible
    (segmentation_models backbones on a dead TF-2.1 stack; see
    docs/migration.md) — the imported directory gets freshly
    initialized native parameters and must be retrained; the .h5 is
    inspected (h5py) and summarized so the operator can verify what
    the source model was."""
    import json as _json
    network_path = Path(network_path)
    with open(network_path / "meta.json") as f:
        src = _json.loads(f.read())
    h5_info = None
    h5 = network_path / "model.h5"
    if h5.exists():
        try:
            import h5py
            with h5py.File(str(h5), "r") as f:
                n_params = 0

                def count(name, obj):
                    nonlocal n_params
                    if hasattr(obj, "shape") and obj.shape is not None:
                        n_params += int(np.prod(obj.shape))
                f.visititems(count)
                h5_info = dict(
                    keras_version=(f.attrs.get("keras_version", b"")
                                   or b"").decode("utf8", "ignore")
                    if isinstance(f.attrs.get("keras_version", ""),
                                  bytes)
                    else str(f.attrs.get("keras_version", "")),
                    n_params=n_params)
        except Exception as e:
            h5_info = dict(error=str(e))
    from origami_tpu.models import registry
    meta = dict(
        kind="unet",
        type=src["type"].lower(),
        classes=list(src["classes"]),
        full_size=list(src.get("full_size", [1280, 2400])),
        tile_size=list(src.get("tile_size",
                                src.get("full_size", [1280, 896]))),
        tile_beta=src.get("tile_beta", 50),
        width=width, s2d=s2d, channels=1, version=1,
        imported_from=dict(
            meta=str(network_path / "meta.json"),
            model=src.get("model"), backbone=src.get("backbone"),
            h5=h5_info,
            note="reference Keras weights are not convertible; "
                 "parameters are freshly initialized - retrain "
                 "(train.segment) or distill onto this meta"))
    registry.init_and_save(Path(out_path), meta, seed=seed)
    return meta


@click.command()
@click.argument("data_path", type=click.Path(), required=True)
@click.option("--dry-run", is_flag=True, default=False)
@click.option("--import-model", type=click.Path(exists=True),
              default=None,
              help="treat DATA_PATH as the OUTPUT model dir and import "
                   "the reference model directory given here "
                   "(meta.json contract; weights need retraining)")
def migrate(data_path, dry_run, import_model):
    """Migrate legacy artifact layouts under DATA_PATH."""
    if import_model:
        meta = import_model_meta(import_model, data_path)
        print("imported %s -> %s (%s/%s)" % (
            import_model, data_path, meta["type"],
            ",".join(meta["classes"])))
        return
    if not Path(data_path).exists():
        raise click.BadParameter("no such path: %s" % data_path)
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

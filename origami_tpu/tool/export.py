"""GT export: annotation DB -> recognizer training files.

Reference counterpart: origami/tool/export.py (line PNGs at model height,
one .gt.txt per harmonization channel, train/valid sets.json)."""

from __future__ import annotations

import json
import random
from pathlib import Path

import click
import PIL.Image

from origami_tpu.tool.lineload import AnnotationDB, load_line_image


def export_training_data(db_path, out_dir, line_height=48,
                         schema_name="default", channels=("default",),
                         valid_ratio=0.2, seed=0, binarize=""):
    from origami_tpu.tool.harmonize import Schema
    schema = Schema.load(schema_name)
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    db = AnnotationDB(db_path)
    records = db.all_lines(annotated_only=True)

    binarizer = None
    if binarize.strip():
        from origami_tpu.core.binarize import from_string
        binarizer = from_string(binarize)

    names = []
    skipped = 0
    for rec in records:
        name = (Path(rec["page_path"]).stem + "-"
                + rec["line_path"].replace("/", "-"))
        try:
            strip = load_line_image(rec["page_path"], rec["line_path"],
                                    line_height)
        except (FileNotFoundError, KeyError):
            skipped += 1
            continue
        if binarizer is not None:
            strip = binarizer(strip)
        PIL.Image.fromarray(strip).save(str(out_dir / (name + ".png")))
        for channel in channels:
            text = schema.channels[channel].transform(rec["annotation"])
            suffix = ".gt.txt" if channel == "default" \
                else ".%s.gt.txt" % channel
            (out_dir / (name + suffix)).write_text(text)
        names.append((name, rec))

    # train/valid split honoring explicit flags, randomizing the rest
    rng = random.Random(seed)
    train, valid = [], []
    undecided = []
    for name, rec in names:
        if rec.get("validation"):
            valid.append(name)
        elif rec.get("training"):
            train.append(name)
        else:
            undecided.append(name)
    rng.shuffle(undecided)
    n_valid = max(0, int(len(undecided) * valid_ratio))
    valid += undecided[:n_valid]
    train += undecided[n_valid:]
    (out_dir / "sets.json").write_text(json.dumps(dict(
        train=sorted(train), valid=sorted(valid))))
    return len(names), skipped


@click.command()
@click.option("--db-path", type=click.Path(exists=True), required=True)
@click.option("-o", "--output", type=click.Path(), required=True)
@click.option("--line-height", type=int, default=48)
@click.option("--schema", type=str, default="default")
@click.option("--channel", "channels", type=str, multiple=True,
              default=("default",))
@click.option("--valid-ratio", type=float, default=0.2)
@click.option("--binarize", type=str, default="")
def export(db_path, output, line_height, schema, channels, valid_ratio,
           binarize):
    """Export annotated lines as recognizer training data."""
    n, skipped = export_training_data(
        db_path, output, line_height, schema, channels, valid_ratio,
        binarize=binarize)
    print("exported %d lines (%d skipped)." % (n, skipped))


if __name__ == "__main__":
    export()

"""GT annotation CLI (DB-compatible with the reference's Tk GUI app,
origami/tool/annotate.py — the interactive GUI itself is out of scope
for a headless TPU environment; this CLI covers browse/search/annotate
against the same annotations.db schema)."""

from __future__ import annotations

from pathlib import Path

import click

from origami_tpu.tool.lineload import AnnotationDB


@click.group()
def annotate():
    """Browse and edit the GT annotation database."""


@annotate.command("list")
@click.option("--db-path", type=click.Path(exists=True), required=True)
@click.option("--unannotated", is_flag=True, default=False)
@click.option("--search", type=str, default=None)
def list_lines(db_path, unannotated, search):
    db = AnnotationDB(db_path)
    for rec in db.all_lines():
        if unannotated and rec["annotation"]:
            continue
        if search and search not in (rec["annotation"] or ""):
            continue
        print("%s\t%s\t%s" % (rec["page_path"], rec["line_path"],
                              rec["annotation"] or ""))


@annotate.command("set")
@click.option("--db-path", type=click.Path(exists=True), required=True)
@click.option("--page", type=str, required=True)
@click.option("--line", type=str, required=True)
@click.option("--text", type=str, required=True)
@click.option("--author", type=str, default=None)
def set_annotation(db_path, page, line, text, author):
    db = AnnotationDB(db_path)
    db.add_line(page, line)
    db.update_annotation(page, line, text, author)
    print("annotated %s %s" % (page, line))


@annotate.command("export-image")
@click.option("--db-path", type=click.Path(exists=True), required=True)
@click.option("--page", type=str, required=True)
@click.option("--line", type=str, required=True)
@click.option("-o", "--output", type=click.Path(), required=True)
@click.option("--line-height", type=int, default=48)
def export_image(db_path, page, line, output, line_height):
    """Write one line's image so it can be viewed while transcribing."""
    import PIL.Image
    from origami_tpu.tool.lineload import load_line_image
    strip = load_line_image(page, line, line_height)
    PIL.Image.fromarray(strip).save(output)
    print("wrote %s" % output)


@annotate.command("stats")
@click.option("--db-path", type=click.Path(exists=True), required=True)
def db_stats(db_path):
    db = AnnotationDB(db_path)
    recs = db.all_lines()
    annotated = [r for r in recs if r["annotation"]]
    print("lines: %d, annotated: %d, training: %d, validation: %d" % (
        len(recs), len(annotated),
        sum(1 for r in recs if r["training"]),
        sum(1 for r in recs if r["validation"])))


if __name__ == "__main__":
    annotate()

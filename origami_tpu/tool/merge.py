"""Merge annotation databases (reference: origami/tool/merge.py —
completed here: rows from the source DB are upserted into the target,
preferring non-empty annotations)."""

from __future__ import annotations

import click

from origami_tpu.tool.lineload import AnnotationDB


def merge_dbs(dst_path, src_path, prefer="src"):
    dst = AnnotationDB(dst_path)
    src = AnnotationDB(src_path)
    n = 0
    for rec in src.all_lines():
        existing = [r for r in dst.lines_for_page(rec["page_path"])
                    if r["line_path"] == rec["line_path"]]
        if not existing:
            dst.add_line(rec["page_path"], rec["line_path"],
                         rec["annotation"], rec["author"],
                         rec["training"], rec["validation"])
            n += 1
        elif rec["annotation"] and (
                prefer == "src" or not existing[0]["annotation"]):
            dst.update_annotation(rec["page_path"], rec["line_path"],
                                  rec["annotation"], rec["author"])
            n += 1
    return n


@click.command()
@click.argument("db_path", type=click.Path(exists=True))
@click.option("--with-db", type=click.Path(exists=True), required=True)
@click.option("--prefer", type=click.Choice(["src", "dst"]),
              default="src")
def merge_db(db_path, with_db, prefer):
    """Merge WITH_DB into DB_PATH."""
    n = merge_dbs(db_path, with_db, prefer)
    print("merged %d lines." % n)


if __name__ == "__main__":
    merge_db()

"""Single-line GT picking CLI (DB-compatible stand-in for the reference's
Tk picking GUI, origami/tool/pick.py)."""

from __future__ import annotations

import click

from origami_tpu.tool.lineload import AnnotationDB


@click.group()
def pick():
    """Add or remove individual GT lines."""


@pick.command("add")
@click.option("--db-path", type=click.Path(), required=True)
@click.option("--page", type=str, required=True)
@click.option("--line", type=str, required=True)
def add(db_path, page, line):
    AnnotationDB(db_path).add_line(page, line)
    print("added %s %s" % (page, line))


@pick.command("remove")
@click.option("--db-path", type=click.Path(exists=True), required=True)
@click.option("--page", type=str, required=True)
@click.option("--line", type=str, required=True)
def remove(db_path, page, line):
    AnnotationDB(db_path).remove_line(page, line)
    print("removed %s %s" % (page, line))


if __name__ == "__main__":
    pick()

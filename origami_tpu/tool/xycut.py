"""XY-cut debugger: prints the recursive cut tree for a page's regions
(text-mode counterpart of the reference's Qt stepper,
origami/tool/xycut.py)."""

from __future__ import annotations

from pathlib import Path

import click


@click.command()
@click.argument("page_path", type=click.Path(exists=True), required=True)
@click.option("--stage", type=str, default="reliable")
@click.option("--fringe", type=float, default=0.005)
def xycut_debug(page_path, stage, fringe):
    """Show the XY-cut decision tree for PAGE_PATH."""
    from origami_tpu.batch.core.io import Artifact, Input, Stage
    from origami_tpu.core.segment import PredictorType
    from origami_tpu.core import xycut

    reader = Input(Artifact.CONTOURS,
                   stage=Stage[stage.upper()]).instantiate(
        page_path=Path(page_path))
    items = [(parts, geom) for parts, geom in reader.contours
             if geom.geom_type == "Polygon"]
    page_geom = reader.page.geometry(Stage[stage.upper()].is_dewarped)
    f = page_geom.rel_length(fringe)

    named = []
    for parts, geom in items:
        minx, miny, maxx, maxy = geom.bounds
        named.append(("/".join(parts), (minx + f, miny + f,
                                        maxx - f, maxy - f)))

    import numpy as np
    from origami_tpu.core.xycut import _axis_candidates, _split
    names = [n for n, _ in named]
    bounds = np.array([b for _, b in named], np.float64).reshape(-1, 4)

    def show(idx, depth):
        indent = "  " * depth
        if len(idx) <= 1:
            for i in idx:
                print("%s- %s" % (indent, names[i]))
            return
        cands = (_axis_candidates(bounds, idx, 0,
                                  xycut.SCORES["widest_gap"], 0, 0.1)
                 + _axis_candidates(bounds, idx, 1,
                                    xycut.SCORES["widest_gap"], 0, 0.1))
        if not cands:
            print("%s* unsplittable group: %s"
                  % (indent, [names[i] for i in idx]))
            return
        s, x, axis, overlap = max(cands, key=lambda c: c[0])
        a, b = _split(bounds, idx, axis, x, 0.1)
        print("%scut %s at %.1f (score %.1f%s)"
              % (indent, "x" if axis == 0 else "y", x, s,
                 ", overlap" if overlap else ""))
        show(a, depth + 1)
        show(b, depth + 1)

    show(np.arange(len(named)), 0)
    print("\nfinal order:")
    for name in xycut.reading_order(named):
        print("  %s" % name)


if __name__ == "__main__":
    xycut_debug()

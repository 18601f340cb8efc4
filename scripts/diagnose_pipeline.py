"""Attribute full-pipeline CER / line-recall loss to stages.

For every GT line of a completed pipeline corpus (run_pipeline output +
synth GT), classify where it was lost or corrupted:

  ok                  matched detected line, CER <= 0.05
  bad_text_squeezed   matched, CER > 0.05, and the extraction strip
                      exceeded the 2048-px bucket cap (aspect squeeze)
  bad_text            matched, CER > 0.05 otherwise
  no_ocr_text         baseline detected but no OCR text for its path
                      (confidence filter / extraction failure)
  line_miss_in_region no baseline near the GT line although its
                      midpoint lies inside a detected TEXT region
                      (line-detection loss)
  region_miss         segmentation marked the line TEXT but no TEXT
                      region polygon contains it (contour/layout loss)
  segment_miss        the segmenter itself missed the line

Usage:
    PYTHONPATH=/root/repo:/root/.axon_site python \
        scripts/diagnose_pipeline.py --corpus work/bootstrap2/\
pipeline_student --gt work/bootstrap2/val
"""

import argparse
import collections
import json
import sys
import zipfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np


def _shell(g):
    """Exterior coordinates of a Polygon / largest part of a Multi."""
    if hasattr(g, "geoms"):
        g = max(g.geoms, key=lambda p: p.area)
    return g.np_shell


def _table_cells(key, bl, columns):
    """Split a table row line into per-column cells exactly as the OCR
    stage's LineRewriter does (origami_tpu/batch/core/lines.py:70-97):
    cell key = pred/label/block.division.line.column/0, baseline
    clipped to the column's x-range. Returns None for non-table lines
    (no columns entry for the region)."""
    parts = key.split("/")
    cols = columns.get("/".join(parts[:3]))
    if cols is None:
        return None
    pp = parts[2].split(".")
    if len(pp) != 4:
        return None
    block, division = pp[0], pp[1]
    ln = 1 + int(parts[3])
    xs = bl[:, 0]
    edges = [float(xs.min())] + list(map(float, cols)) + [float(xs.max())]
    cells = []
    for i, (x0, x1) in enumerate(zip(edges, edges[1:])):
        lo, hi = max(x0, xs.min()), min(x1, xs.max())
        if hi - lo < 1.0:
            continue
        y0 = float(np.interp(lo, bl[:, 0], bl[:, 1]))
        y1 = float(np.interp(hi, bl[:, 0], bl[:, 1]))
        cell_key = "%s/%s/%s.%s.%d.%d/0" % (
            parts[0], parts[1], block, division, ln, i + 1)
        cells.append((cell_key, np.array([[lo, y0], [hi, y1]])))
    return cells


def load_detected(out):
    """[(baseline_pagespace (N,2), height_dewarped, width_dewarped,
    key, text_or_None)] — table row lines appear as their per-column
    cells (the keys the OCR stage writes), not as the raw row."""
    from origami_tpu.core.dewarp import Grid
    grid = Grid.open(out / "dewarp.zip")
    texts = {}
    with zipfile.ZipFile(out / "ocr.zip") as zf:
        for n in zf.namelist():
            texts[n[:-4]] = zf.read(n).decode("utf-8")
    columns = {}
    tables_path = out / "tables.json"
    if tables_path.exists():
        columns = json.loads(tables_path.read_text()).get("columns", {})
    det = []
    with zipfile.ZipFile(out / "lines.3.zip") as zf:
        for n in zf.namelist():
            if not n.endswith(".json") or n.endswith("meta.json"):
                continue
            d = json.loads(zf.read(n))
            bl = (d.get("tesseract_data") or {}).get("baseline")
            if not bl:
                continue
            key = n[:-5]
            # strip geometry in dewarped space, from the line polygon
            from origami_tpu.geometry import wkt as wkt_mod
            poly = wkt_mod.loads(d["wkt"])
            shell = np.asarray(_shell(poly))
            xs = shell[:, 0]
            ys = shell[:, 1]
            h_dw = float(ys.max() - ys.min())
            bl_arr = np.asarray(bl, float)
            cells = _table_cells(key, bl_arr, columns)
            if cells is None:
                w_dw = float(xs.max() - xs.min())
                det.append((grid.inverse_points(bl_arr),
                            h_dw, w_dw, key, texts.get(key)))
            else:
                for cell_key, cell_bl in cells:
                    w_dw = float(cell_bl[1, 0] - cell_bl[0, 0])
                    det.append((grid.inverse_points(cell_bl),
                                h_dw, w_dw, cell_key,
                                texts.get(cell_key)))
    return det, grid


def text_regions_pagespace(out, grid, stage=3):
    """TEXT region polygons (page space); stage 3 = post-layout,
    stage 2 = post-dewarp/pre-layout."""
    from origami_tpu.batch.core.io import read_contours_zip
    from origami_tpu.core.segment import PredictorType
    regs = []
    items, _ = read_contours_zip(out / ("contours.%d.zip" % stage),
                                 PredictorType.REGION)
    for parts, g in items:
        if parts[1] != "TEXT" or g is None or g.is_empty:
            continue
        pts = np.asarray(_shell(g), float)
        if stage >= 2:
            pts = grid.inverse_points(pts)
        regs.append(pts)
    return regs


def point_in_poly(pt, poly):
    x, y = pt
    inside = False
    n = len(poly)
    for i in range(n):
        x0, y0 = poly[i]
        x1, y1 = poly[(i + 1) % n]
        if (y0 > y) != (y1 > y):
            t = (y - y0) / (y1 - y0)
            if x < x0 + t * (x1 - x0):
                inside = not inside
    return inside


def segment_text_mask(out):
    from origami_tpu.core.segment import Segmentation
    seg = Segmentation.open(out / "segment.zip")
    reg = seg.by_name("regions")
    return reg.labels == reg.classes["TEXT"].value


def diagnose_page(img, gt):
    from origami_tpu.batch.utils.evaluate import cer
    out = img.parent / (img.stem + ".out")
    det, grid = load_detected(out)
    regions = text_regions_pagespace(out, grid, stage=3)
    regions_pre = text_regions_pagespace(out, grid, stage=2)
    mask = segment_text_mask(out)
    page_w, page_h = gt["size"]
    sy = mask.shape[0] / page_h
    sx = mask.shape[1] / page_w

    heights = [l["bbox"][3] - l["bbox"][1] for l in gt["lines"]]
    tol = 0.75 * float(np.median(heights))
    rows = []
    for line in gt["lines"]:
        (x0, y), (x1, _) = line["baseline"]
        if x1 - x0 < 60:
            continue
        mx, my = (x0 + x1) / 2.0, y
        best = None
        for bl, h_dw, w_dw, key, text in det:
            bx0, bx1 = bl[:, 0].min(), bl[:, 0].max()
            if not (bx0 - tol <= mx <= bx1 + tol):
                continue
            by = float(np.interp(mx, bl[:, 0], bl[:, 1]))
            d = abs(by - my)
            if d <= tol and (best is None or d < best[0]):
                best = (d, h_dw, w_dw, key, text)
        if best is not None:
            _, h_dw, w_dw, key, text = best
            strip_w = w_dw * (48.0 / max(h_dw, 1.0))
            if text is None:
                cat, c = "no_ocr_text", None
            else:
                c = cer(line["text"], text)
                if c <= 0.05:
                    cat = "ok"
                elif strip_w > 2048:
                    cat = "bad_text_squeezed"
                else:
                    cat = "bad_text"
            rows.append(dict(cat=cat, cer=c, gt=line["text"],
                             pred=text, strip_w=round(strip_w)))
            continue
        # containment test at the line CENTER (baseline y is the
        # bbox bottom edge — on the polygon boundary)
        cy = (line["bbox"][1] + line["bbox"][3]) / 2.0
        if any(point_in_poly((mx, cy), r) for r in regions):
            cat = "line_miss_in_region"
        elif any(point_in_poly((mx, cy), r) for r in regions_pre):
            cat = "layout_drop"        # present pre-layout, gone after
        else:
            b = line["bbox"]
            ys0, ys1 = int(b[1] * sy), max(int(b[3] * sy), int(b[1] * sy) + 1)
            xs0, xs1 = int(b[0] * sx), max(int(b[2] * sx), int(b[0] * sx) + 1)
            frac = float(mask[ys0:ys1, xs0:xs1].mean())
            cat = "region_miss" if frac > 0.3 else "segment_miss"
        rows.append(dict(cat=cat, cer=None, gt=line["text"], pred=None))
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", default="work/bootstrap2/pipeline_student")
    ap.add_argument("--gt", default="work/bootstrap2/val")
    ap.add_argument("--examples", type=int, default=6)
    args = ap.parse_args()

    cats = collections.Counter()
    cers = []
    examples = collections.defaultdict(list)
    for img in sorted(Path(args.corpus).glob("*.png")):
        gt_path = Path(args.gt) / (img.stem + ".gt.json")
        if ".labels." in img.name or not gt_path.exists():
            continue
        if not (img.parent / (img.stem + ".out") / "ocr.zip").exists():
            continue
        for row in diagnose_page(img, json.loads(gt_path.read_text())):
            cats[row["cat"]] += 1
            if row["cer"] is not None:
                cers.append(row["cer"])
            if row["cat"] != "ok" and \
                    len(examples[row["cat"]]) < args.examples:
                examples[row["cat"]].append(row)

    total = sum(cats.values())
    print("total GT lines: %d" % total)
    for cat, n in cats.most_common():
        print("  %-20s %5d  (%.1f%%)" % (cat, n, 100.0 * n / total))
    matched = sum(cats[c] for c in
                  ("ok", "bad_text", "bad_text_squeezed", "no_ocr_text"))
    print("line recall: %.3f" % (matched / max(total, 1)))
    if cers:
        print("CER over matched+texted: mean %.4f median %.4f" %
              (float(np.mean(cers)), float(np.median(cers))))
    for cat, rows in examples.items():
        print("\n== %s examples" % cat)
        for r in rows:
            print("  gt  : %r" % r["gt"][:70])
            if r.get("pred") is not None:
                print("  pred: %r  (cer %.3f, strip_w %s)" %
                      (r["pred"][:70], r["cer"], r.get("strip_w")))


if __name__ == "__main__":
    main()

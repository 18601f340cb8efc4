"""Isolate READING-ORDER loss in the composed page stream.

COMPARE shows the heuristic chain at composed CER 0.1276 vs order-free
0.0185 (VERDICT r4 weak-6): ~0.11 of the composed stream is lost to
reading order / structure, not recognition. This script measures that
loss with PERFECT recognition: run the chain only through `order` (no
OCR), match detected lines to GT lines geometrically, compose the
matched GT texts in the detected reading order, and CER that stream
against the GT stream. Any error is pure ordering/recall loss.

Per page it reports the order-CER and, for scrambled pages, the walk of
GT indices in detected order (a monotone walk is perfect order; jumps
localize the inversions).

Usage (CPU backend, no chip needed):
    PYTHONPATH=/root/repo:/root/.axon_site python \
        scripts/diagnose_order.py --model heuristic --pages 4
"""

import argparse
import collections
import json
import shutil
import sys
import tempfile
import zipfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))
sys.path.insert(0, str(Path(__file__).parent))

import numpy as np


def run_to_order(corpus, segment_model, target):
    from origami_tpu.batch.detect.contours import ContoursProcessor
    from origami_tpu.batch.detect.dewarp import DewarpProcessor
    from origami_tpu.batch.detect.flow import FlowDetectionProcessor
    from origami_tpu.batch.detect.layout import LayoutDetectionProcessor
    from origami_tpu.batch.detect.lines import LineDetectionProcessor
    from origami_tpu.batch.detect.order import ReadingOrderProcessor
    from origami_tpu.batch.detect.segment import SegmentationProcessor

    opts = dict(lock_strategy="NONE", plain=True)
    stages = [
        SegmentationProcessor(segment_model, dict(target=target, **opts)),
        ContoursProcessor(opts),
        FlowDetectionProcessor(opts),
        DewarpProcessor(opts),
        LayoutDetectionProcessor(dict(layout="bbz", **opts)),
        LineDetectionProcessor(opts),
        ReadingOrderProcessor(opts),
    ]
    for proc in stages:
        proc.traverse(corpus)


def composed_line_keys(out, det):
    """Line keys in composed order — replicates compose._compose_text's
    walk (region entries expand to their lines in _line_sort_key order;
    split tables interleave row-major via compose._table_rows; line-
    level entries from region splitting appear singly). `det` maps line
    keys to page-space baselines (for the table row clustering)."""
    from origami_tpu.batch.core.utils import TableRegionCombinator
    from origami_tpu.batch.detect.compose import _line_sort_key

    order = json.loads((out / "order.json").read_text())["orders"]["*"]
    by_region = collections.defaultdict(list)
    with zipfile.ZipFile(out / "lines.3.zip") as zf:
        for n in zf.namelist():
            if not n.endswith(".json") or n.endswith("meta.json"):
                continue
            parts = tuple(n[:-5].split("/"))
            by_region[parts[:3]].append(parts)
    for k in by_region:
        by_region[k].sort(key=lambda p: _line_sort_key(p[3:]))
    combinator = TableRegionCombinator(list(by_region.keys()))

    def row_major(lps):
        entries = []
        for lp in lps:
            bl = det.get(lp)
            if bl is None:
                entries.append((float("inf"), 0.0, len(entries), lp))
            else:
                entries.append((float(bl[:, 1].mean()),
                                float(bl[:, 0].min()), len(entries), lp))
        entries.sort(key=lambda e: e[:3])
        ys = [e[0] for e in entries if e[0] != float("inf")]
        gaps = sorted(b - a for a, b in zip(ys, ys[1:]) if b - a > 1.0)
        tol = 0.5 * gaps[len(gaps) // 2] if gaps else 1.0
        rows, last_y = [], None
        for e in entries:
            if last_y is None or e[0] - last_y > tol:
                rows.append([])
            rows[-1].append(e)
            last_y = e[0]
        for row in rows:
            row.sort(key=lambda e: (e[1], e[0], e[2]))
            yield from (e[3] for e in row)

    keys = []
    seen = set()
    for name in order:
        path = tuple(name.split("/"))
        if len(path) > 3:
            if path in seen:
                continue
            seen.add(path)
            keys.append(path)
            continue
        members = combinator.mapping.get(path, [path])
        pend = [lp for m in members for lp in by_region.get(tuple(m), [])
                if lp not in seen]
        for lp in (row_major(pend) if len(members) > 1 else pend):
            seen.add(lp)
            keys.append(lp)
    return keys


def detected_baselines(out):
    """{line_key_tuple: baseline (N,2) in page space}."""
    from origami_tpu.core.dewarp import Grid
    from origami_tpu.geometry import wkt as wkt_mod

    grid = Grid.open(out / "dewarp.zip")
    det = {}
    with zipfile.ZipFile(out / "lines.3.zip") as zf:
        for n in zf.namelist():
            if not n.endswith(".json") or n.endswith("meta.json"):
                continue
            d = json.loads(zf.read(n))
            bl = (d.get("tesseract_data") or {}).get("baseline")
            if not bl:
                continue
            det[tuple(n[:-5].split("/"))] = grid.inverse_points(
                np.asarray(bl, float))
    return det


def diagnose_page(out, gt):
    from origami_tpu.batch.utils.evaluate import cer

    det = detected_baselines(out)
    keys = composed_line_keys(out, det)

    heights = [l["bbox"][3] - l["bbox"][1] for l in gt["lines"]]
    tol = 0.75 * float(np.median(heights))
    # match every detected line to its nearest GT line (midpoint walk,
    # mirrors make_compare_report.pipeline_cer but detected->GT)
    gt_mid = []
    for line in gt["lines"]:
        (x0, y), (x1, _) = line["baseline"]
        gt_mid.append((x0, x1, y))
    assign = {}
    for key, bl in det.items():
        bx0, bx1 = bl[:, 0].min(), bl[:, 0].max()
        mx = (bx0 + bx1) / 2.0
        my = float(np.interp(mx, bl[:, 0], bl[:, 1]))
        best = None
        for gi, (x0, x1, y) in enumerate(gt_mid):
            if not (x0 - tol <= mx <= x1 + tol):
                continue
            d = abs(y - my)
            if d <= tol and (best is None or d < best[0]):
                best = (d, gi)
        if best is not None:
            assign[key] = best[1]

    # compose the matched GT texts in detected order (dedup: a GT line
    # detected as several fragments contributes once, at its first slot)
    walk = []
    used = set()
    for key in keys:
        gi = assign.get(key)
        if gi is not None and gi not in used:
            used.add(gi)
            walk.append(gi)
    composed = "\n".join(gt["lines"][gi]["text"] for gi in walk)
    gt_text = "\n".join(l["text"] for l in gt["lines"])
    order_cer = cer(gt_text, composed)

    # inversion count: adjacent composed pairs out of GT order
    inversions = sum(1 for a, b in zip(walk, walk[1:]) if b < a)
    return dict(order_cer=order_cer, walk=walk,
                n_gt=len(gt["lines"]), n_composed=len(walk),
                inversions=inversions)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="heuristic")
    ap.add_argument("--target", default="quality")
    ap.add_argument("--pages", type=int, default=4)
    ap.add_argument("--keep", default=None,
                    help="keep artifacts in this dir for inspection")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    from origami_tpu.train import synth

    work = Path(args.keep) if args.keep else \
        Path(tempfile.mkdtemp(prefix="origami_order_"))
    try:
        val = work / "val"
        if not (val / "synth0000.gt.json").exists():
            synth.write_corpus(val, args.pages, seed=7_000_000)
        for extra in val.glob("*.labels.*.png"):
            extra.unlink()
        run_to_order(val, args.model, args.target)

        cers = []
        for img in sorted(val.glob("*.png")):
            gt = json.loads(
                (val / (img.stem + ".gt.json")).read_text())
            out = val / (img.stem + ".out")
            r = diagnose_page(out, gt)
            cers.append(r["order_cer"])
            print("%s  order_cer=%.4f  composed=%d/%d  inversions=%d"
                  % (img.stem, r["order_cer"], r["n_composed"],
                     r["n_gt"], r["inversions"]))
            if r["order_cer"] > 0.02:
                print("   walk:", r["walk"])
        print("mean order CER: %.4f" % float(np.mean(cers)))
    finally:
        if not args.keep:
            shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()

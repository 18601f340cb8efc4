"""Real-scan accuracy for TRAINED models (VERDICT r2 item 7 follow-on).

Runs the full detect chain with the distilled student segmenters (and
the TPU-trained recognizer for timing realism) over the two in-repo
real newspaper scans, then scores detected baselines against the
hand-authored GT (tests/data/*.gt.json) with the same matcher the test
suite uses (batch.utils.evaluate.match_baselines). The heuristic
numbers asserted by tests/test_real_scan.py are the floor; this script
reports the trained-model operating point for COMPARE docs.

    PYTHONPATH=/root/repo:/root/.axon_site \
        python scripts/eval_real_scan.py --models work/bootstrap3
"""

import argparse
import json
import shutil
import sys
import tempfile
import zipfile
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

DATA = Path(__file__).parent.parent / "tests" / "data"
PAGES = [("p1872", "real_scan_1872.png", "real_scan_1872.gt.json"),
         ("p1925", "real_scan_bbz_1925.png", "real_scan_bbz_1925.gt.json")]


def run_chain(corpus, students, recognizer):
    from origami_tpu.batch.detect.segment import SegmentationProcessor
    from origami_tpu.batch.detect.contours import ContoursProcessor
    from origami_tpu.batch.detect.flow import FlowDetectionProcessor
    from origami_tpu.batch.detect.dewarp import DewarpProcessor
    from origami_tpu.batch.detect.layout import LayoutDetectionProcessor
    from origami_tpu.batch.detect.lines import LineDetectionProcessor
    from origami_tpu.batch.detect.order import ReadingOrderProcessor
    from origami_tpu.batch.detect.ocr import OCRProcessor

    opts = dict(lock_strategy="NONE", plain=True)
    for proc in [
            SegmentationProcessor(str(students), dict(target="speed", **opts)),
            ContoursProcessor(opts),
            FlowDetectionProcessor(opts),
            DewarpProcessor(opts),
            LayoutDetectionProcessor(dict(layout="bbz", **opts)),
            LineDetectionProcessor(opts),
            ReadingOrderProcessor(opts),
            OCRProcessor(dict(model=str(recognizer), **opts))]:
        proc.traverse(corpus)


def score(corpus, name, gt_file):
    from origami_tpu.batch.utils.evaluate import (
        gt_zones, match_baselines, match_detections)
    gt = json.loads((DATA / gt_file).read_text())
    out = corpus / (name + ".out")
    dets = []
    with zipfile.ZipFile(out / "lines.3.zip") as zf:
        for n in zf.namelist():
            if not n.endswith(".json") or n == "meta.json":
                continue
            d = json.loads(zf.read(n))
            bl = (d.get("tesseract_data") or {}).get("baseline")
            if bl and len(bl) >= 2:
                p = np.asarray(bl, float)
                dets.append(p[np.argsort(p[:, 0])])
    res = match_baselines(gt["lines"], dets)
    hs = np.array([g["h"] for g, _ in res], float)
    tol = np.maximum(0.5 * hs, 4.0)
    d = np.array([x if x is not None else np.inf for _, x in res])
    true = d <= 2 * tol
    recall = float(np.mean(d <= tol))
    # precision is per-detection and ZONE-LIMITED: band-annotated GT
    # (p1925) covers only sub-bands of a page with far more real text
    # lines, so only detections inside annotated zones count
    prec = match_detections(gt["lines"], dets, zones=gt_zones(gt["lines"]))
    p = prec["precision"]
    return dict(
        n_gt=len(res), n_detected_lines=len(dets),
        n_detected_in_zone=prec["n_considered"],
        recall=round(recall, 3),
        precision=round(p, 3),
        f1=round(2 * p * recall / (p + recall), 3) if p + recall else 0.0,
        placement_px=(round(float(np.median(d[true])), 2)
                      if true.any() else None),
        line_height=float(np.median(hs)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--models", default="work/bootstrap3")
    ap.add_argument("--students", default=None,
                    help="override the students dir (e.g. a finetuned "
                         "work/ft_p1872/students for holdout transfer)")
    ap.add_argument("--recognizer", default=None)
    ap.add_argument("--page", default=None,
                    help="evaluate only this fixture (p1872/p1925)")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    models = Path(args.models)
    students = Path(args.students) if args.students else models / "students"
    recognizer = (Path(args.recognizer) if args.recognizer
                  else models / "recognizer")
    pages = [p for p in PAGES if args.page in (None, p[0])]

    work = Path(tempfile.mkdtemp(prefix="origami_realscan_"))
    corpus = work / "corpus"
    corpus.mkdir(parents=True)
    for name, png, _ in pages:
        shutil.copy(DATA / png, corpus / (name + ".png"))
    try:
        run_chain(corpus, students, recognizer)
        report = {name: score(corpus, name, gt)
                  for name, _, gt in pages}
        text = json.dumps(report, indent=2)
        print(text)
        if args.out:
            Path(args.out).write_text(text + "\n")
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()

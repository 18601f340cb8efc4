"""Re-run the student pipeline from the layout stage on a COPY of a
completed bootstrap corpus, then re-measure pipeline CER + per-stage
loss attribution.

Layout-only changes (e.g. FixSpillOverH's gutter verification) don't
touch segment/contours/flow/dewarp artifacts, so re-running the five
downstream stages is a ~4x cheaper A/B than a full COMPARE rebuild.

Usage:
    PYTHONPATH=/root/repo:/root/.axon_site python \
        scripts/rerun_from_layout.py --work work/bootstrap3 \
        --dest /tmp/rerun_student
"""

import argparse
import collections
import json
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))
sys.path.insert(0, str(Path(__file__).parent))

RERUN_ARTIFACTS = ("contours.3.zip", "lines.0.zip", "lines.3.zip",
                   "order.json", "ocr.zip", "compose.zip", "tables.json")
RERUN_STAGES = ("layout", "lines", "order", "ocr", "compose")


def reset_corpus(src, dest):
    if dest.exists():
        shutil.rmtree(dest)
    shutil.copytree(src, dest)
    for out in dest.glob("*.out"):
        for name in RERUN_ARTIFACTS:
            (out / name).unlink(missing_ok=True)
        for p in out.glob("lines.*.zip"):
            p.unlink()
        rt_path = out / "runtime.json"
        rt = json.loads(rt_path.read_text())
        for stage in RERUN_STAGES:
            rt.pop("origami_tpu.batch.detect." + stage, None)
        rt_path.write_text(json.dumps(rt))
    (dest / "origami.lock.db").unlink(missing_ok=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--work", default="work/bootstrap3")
    ap.add_argument("--dest", default="/tmp/rerun_student")
    args = ap.parse_args()
    work = Path(args.work)
    dest = Path(args.dest)
    reset_corpus(work / "pipeline_student", dest)

    from origami_tpu.batch.detect.compose import ComposeProcessor
    from origami_tpu.batch.detect.layout import LayoutDetectionProcessor
    from origami_tpu.batch.detect.lines import LineDetectionProcessor
    from origami_tpu.batch.detect.ocr import OCRProcessor
    from origami_tpu.batch.detect.order import ReadingOrderProcessor

    opts = dict(lock_strategy="NONE", plain=True)
    stages = [
        LayoutDetectionProcessor(dict(layout="bbz", **opts)),
        LineDetectionProcessor(opts),
        ReadingOrderProcessor(opts),
        OCRProcessor(dict(model=str(work / "recognizer"), **opts)),
        ComposeProcessor(opts),
    ]
    t0 = time.perf_counter()
    for proc in stages:
        proc.traverse(dest)
    elapsed = time.perf_counter() - t0

    import make_compare_report as mcr
    import diagnose_pipeline as diag
    res = mcr.pipeline_cer(dest, work / "val")
    cats = collections.Counter()
    for img in sorted(dest.glob("*.png")):
        gt_path = work / "val" / (img.stem + ".gt.json")
        if ".labels." in img.name or not gt_path.exists():
            continue
        for row in diag.diagnose_page(img, json.loads(gt_path.read_text())):
            cats[row["cat"]] += 1
    print(json.dumps(dict(
        cer=res, seconds=round(elapsed, 1),
        attribution=dict(cats.most_common())), indent=1))


if __name__ == "__main__":
    main()

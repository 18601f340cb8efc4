"""Generate COMPARE_r02.md: accuracy evidence for the trained models.

Consumes a completed bootstrap work dir (scripts/bootstrap_synth.py):
  * per-class IoU of the trained ensembles / 1-member speed mode /
    distilled students against held-out GT masks (report.json),
  * isolated-line CER of the trained recognizer (report.json),
  * a full-pipeline run on validation pages with the TRAINED models:
    segment(quality ensembles) -> ... -> ocr(trained recognizer),
    measuring end-to-end line-level CER against the page GT (detected
    lines matched to GT lines by rewarped baseline proximity), plus
    the same pipeline with the heuristic segmenter for comparison
    (batch/utils/compare.py artifact diffing between the two).

Run after bootstrap_synth.py:
    PYTHONPATH=/root/repo:/root/.axon_site \
        python scripts/make_compare_report.py --work work/bootstrap
"""

import argparse
import json
import shutil
import time
from pathlib import Path

import numpy as np


def run_pipeline(corpus, segment_model, recognizer, target="quality",
                 ocr_extra=None, warm_ocr=False):
    from origami_tpu.batch.detect.compose import ComposeProcessor
    from origami_tpu.batch.detect.contours import ContoursProcessor
    from origami_tpu.batch.detect.dewarp import DewarpProcessor
    from origami_tpu.batch.detect.flow import FlowDetectionProcessor
    from origami_tpu.batch.detect.layout import LayoutDetectionProcessor
    from origami_tpu.batch.detect.lines import LineDetectionProcessor
    from origami_tpu.batch.detect.ocr import OCRProcessor
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
        OCRProcessor(dict(model=str(recognizer), **(ocr_extra or {}),
                          **opts)),
        ComposeProcessor(opts),
    ]
    if warm_ocr:
        # compile/load every recognizer (batch, bucket) graph BEFORE the
        # s/page clock starts: the voted 2-member predictor otherwise
        # pays its graph loads inside the first timed chain while the
        # single-seed chains ride graphs disk-cached by earlier runs —
        # steady-state is the comparable number
        pred = stages[-2]._get_predictor()
        if hasattr(pred, "warm_buckets"):
            pred.warm_buckets()
    t0 = time.time()
    for proc in stages:
        proc.traverse(corpus)
    return time.time() - t0


def pipeline_cer(corpus, gt_dir):
    """Line-level CER: detected OCR lines matched to GT transcripts by
    rewarped baseline proximity. Table rows are matched as their
    per-column cells (diagnose_pipeline.load_detected applies the OCR
    stage's LineRewriter re-keying — without it every table cell reads
    as a recall miss).

    Also attributes the composed-page CER gap (VERDICT r4 weak-6: the
    heuristic chain composed 0.1049 vs per-line 0.0215 — where do the
    other points go?): `order_free_cer` re-composes the MATCHED
    detected texts in GT order (so composed − order_free = reading-
    order loss) and `spurious_chars_frac` counts detected-text
    characters never matched to any GT line (pure insertions in the
    composed stream)."""
    from origami_tpu.batch.utils.evaluate import cer
    import diagnose_pipeline as diag

    cers = []
    n_gt = n_matched = 0
    order_free_cers = []
    spurious_chars = total_det_chars = 0
    for img in sorted(Path(corpus).glob("*.png")):
        if ".labels." in img.name:
            continue
        gt = json.loads(
            (Path(gt_dir) / (img.stem + ".gt.json")).read_text())
        out = img.parent / (img.stem + ".out")
        if not (out / "ocr.zip").exists():
            continue
        det_full, _ = diag.load_detected(out)
        det = [(bl, text) for bl, _, _, _, text in det_full
               if text is not None]
        heights = [l["bbox"][3] - l["bbox"][1] for l in gt["lines"]]
        tol = 0.75 * float(np.median(heights))
        matched_texts = []       # per GT line, in GT order
        used = set()
        for line in gt["lines"]:
            (x0, y), (x1, _) = line["baseline"]
            narrow = x1 - x0 < 60
            mx, my = (x0 + x1) / 2.0, y
            best = None
            for di, (bl, text) in enumerate(det):
                bx0, bx1 = bl[:, 0].min(), bl[:, 0].max()
                if not (bx0 - tol <= mx <= bx1 + tol):
                    continue
                by = float(np.interp(mx, bl[:, 0], bl[:, 1]))
                d = abs(by - my)
                if d <= tol and (best is None or d < best[0]):
                    best = (d, text, di)
            if best is not None:
                # narrow GT lines don't score, but they do CLAIM their
                # detected line so it isn't miscounted as spurious
                used.add(best[2])
            if narrow:
                continue
            n_gt += 1
            if best is not None:
                n_matched += 1
                cers.append(cer(line["text"], best[1]))
                matched_texts.append(best[1])
            else:
                matched_texts.append("")
        gt_text = "\n".join(
            line["text"] for line in gt["lines"]
            if line["baseline"][1][0] - line["baseline"][0][0] >= 60)
        if gt_text:
            order_free_cers.append(
                cer(gt_text, "\n".join(t for t in matched_texts if t)))
        total_det_chars += sum(len(t) for _, t in det)
        spurious_chars += sum(len(t) for di, (_, t) in enumerate(det)
                              if di not in used)
    return dict(
        cer=float(np.mean(cers)) if cers else None,
        cer_median=float(np.median(cers)) if cers else None,
        order_free_cer=(float(np.mean(order_free_cers))
                        if order_free_cers else None),
        spurious_chars_frac=(spurious_chars / total_det_chars
                             if total_det_chars else 0.0),
        line_recall=n_matched / max(n_gt, 1), n_gt=n_gt)


def composed_cer(corpus, gt_dir):
    """Page-level CER of the COMPOSED text (compose.zip page.txt, i.e.
    recognition AND reading order) against the GT line stream — the
    per-line matched CER can hide seam losses where a split line's
    halves both match (VERDICT r3 item 5 asks for this measure)."""
    import zipfile
    from origami_tpu.batch.utils.evaluate import cer

    cers = []
    for img in sorted(Path(corpus).glob("*.png")):
        if ".labels." in img.name:
            continue
        out = img.parent / (img.stem + ".out")
        if not (out / "compose.zip").exists():
            continue
        gt = json.loads(
            (Path(gt_dir) / (img.stem + ".gt.json")).read_text())
        gt_text = "\n".join(line["text"] for line in gt["lines"])
        with zipfile.ZipFile(out / "compose.zip") as z:
            det = z.read("page.txt").decode("utf-8")
        det = "\n".join(l for l in det.splitlines() if l.strip())
        cers.append(cer(gt_text, det))
    return float(np.mean(cers)) if cers else None


def fmt_iou(d):
    rows = []
    for kind in ("region", "separator"):
        classes = {k: v for k, v in d[kind].items() if k != "_mean"}
        cells = " ".join("%s=%.3f" % (k, v)
                         for k, v in classes.items() if v is not None)
        rows.append("| %s | %.3f | %s |" % (kind, d[kind]["_mean"],
                                            cells))
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--work", default="work/bootstrap")
    ap.add_argument("--out", default="COMPARE_r05.md")
    ap.add_argument("--pages", type=int, default=4)
    ap.add_argument("--with-beam", action="store_true",
                    help="also run the voted-beam pipeline (slow: host "
                         "beam decode per member per line)")
    ap.add_argument("--metrics-only", action="store_true",
                    help="recompute CER/attribution from existing "
                         "pipeline_* outputs (e.g. after a GT fix that "
                         "keeps the page pixels identical); keeps the "
                         "previous run's s/page numbers")
    args = ap.parse_args()
    work = Path(args.work)
    report = json.loads((work / "report.json").read_text())

    from origami_tpu.batch.utils.compare import compare_segmentation

    # multi-member recognizer dir for the voted pipeline (OCRProcessor
    # votes over every member subdir with a meta.json); rebuilt each
    # run so a freshly trained seed joins the ensemble
    members = [work / "recognizer", work / "recognizer2",
               work / "recognizer3"]
    members = [m for m in members if (m / "meta.json").exists()]
    vote_dir = work / "recognizers_voted"
    if len(members) >= 2:
        if vote_dir.exists():
            shutil.rmtree(vote_dir)
        vote_dir.mkdir()
        for i, src in enumerate(members):
            (vote_dir / str(i)).symlink_to(src.resolve())

    results = {}
    chains = [
        ("trained_quality", work / "models", "quality", None, None),
        ("student", work / "students", "speed", None, None),
        ("heuristic", "heuristic", "quality", None, None)]
    if vote_dir.exists():
        # the SHIPPABLE voting mode (VERDICT r4 item 6): every member
        # greedy-decodes ON DEVICE (vmapped over the stacked params),
        # sequence vote on host — runs the same device strip path as
        # single-seed, unlike voted-beam's 148 s/page host decode
        chains.append(("student_voted", work / "students", "speed",
                       vote_dir, None))
    if vote_dir.exists() and args.with_beam:
        chains.append(("student_voted_beam", work / "students", "speed",
                       vote_dir, dict(decoder="beam")))
    prev_spp = {}
    if args.metrics_only:
        try:
            prev = json.loads(Path(
                str(Path(args.out)) + ".results.json").read_text())
            prev_spp = {k: v.get("seconds_per_page")
                        for k, v in prev.items()}
        except OSError:
            pass
    for label, model, target, rec, ocr_extra in chains:
        corpus = work / ("pipeline_" + label)
        if args.metrics_only and corpus.exists():
            results[label] = dict(
                cer=pipeline_cer(corpus, work / "val"),
                composed_cer=composed_cer(corpus, work / "val"),
                seconds_per_page=prev_spp.get(label))
            continue
        if corpus.exists():
            shutil.rmtree(corpus)
        corpus.mkdir(parents=True)
        val_pages = [p for p in sorted((work / "val").glob("*.png"))
                     if ".labels." not in p.name]
        for img in val_pages[: args.pages]:
            shutil.copy(img, corpus / img.name)
        elapsed = run_pipeline(corpus, str(model),
                               rec or work / "recognizer",
                               target=target, ocr_extra=ocr_extra,
                               warm_ocr=True)
        results[label] = dict(
            cer=pipeline_cer(corpus, work / "val"),
            composed_cer=composed_cer(corpus, work / "val"),
            seconds_per_page=round(elapsed / args.pages, 2))

    # artifact-level diff trained vs heuristic (the reference's own
    # comparison mechanism: same pages, diff segment.zip)
    seg_diffs = []
    for img in sorted((work / "pipeline_trained_quality").glob("*.png")):
        a = img.parent / (img.stem + ".out") / "segment.zip"
        b = (work / "pipeline_heuristic" / (img.stem + ".out")
             / "segment.zip")
        if a.exists() and b.exists():
            seg_diffs.append(compare_segmentation(a, b))

    lines = ["# COMPARE — accuracy evidence (synthetic GT corpus)",
             "",
             "Corpus: %d train / %d val synthetic newspaper pages "
             "(train/synth.py; no real scans are obtainable in this "
             "offline environment — the synthetic corpus has EXACT "
             "ground truth instead)." % (
                 len([p for p in (work / "train").glob("*.png")
                      if ".labels." not in p.name]),
                 len([p for p in (work / "val").glob("*.png")
                      if ".labels." not in p.name])),
             "",
             "## Segmentation IoU vs held-out GT masks",
             "",
             "5-member ensembles (region s2d4 width-2, separator s2d2"
             " width-1, the production pair), trained "
             "%d s + distilled %d s on the TPU chip." % (
                 report.get("seg_train_seconds", 0),
                 report.get("distill_seconds", 0)),
             "",
             "| mode | kind | mean IoU | per class |",
             "|---|---|---|---|"]
    for label, key in (("ensemble (quality)", "iou_ensemble"),
                       ("1 member (speed)", "iou_ensemble_speed1"),
                       ("distilled student", "iou_student")):
        for row in fmt_iou(report[key]):
            lines.append("| %s %s" % (label, row[1:]))
    if "sep_tolerant_ensemble" in report:
        lines += ["",
                  "## Separator functional quality (recall/precision "
                  "at ±%d px)" % report["sep_tolerant_ensemble"]
                  .get("tol_px", 3),
                  "",
                  "| mode | class | recall | precision | f1 |",
                  "|---|---|---|---|---|"]
        for label, key in (("ensemble", "sep_tolerant_ensemble"),
                           ("student", "sep_tolerant_student")):
            rep = report.get(key) or {}
            for cls in ("H", "V", "T"):
                r = rep.get(cls)
                if not r:
                    continue
                lines.append(
                    "| %s | %s | %.3f | %.3f | %.3f |" % (
                        label, cls, r["recall"] or 0, r["precision"] or 0,
                        r["f1"] or 0))
            if rep.get("_mean_f1") is not None:
                lines.append("| %s | _mean_ |  |  | %.3f |"
                             % (label, rep["_mean_f1"]))
    lines += ["",
              "## Recognizer CER (isolated lines, n=%d)" %
              report["ocr"]["n"],
              "",
              "greedy decode: CER mean %.4f / median %.4f" % (
                  report["ocr"]["cer"], report["ocr"]["cer_median"])]
    if report.get("ocr_voted_beam"):
        lines += ["",
                  "| decode mode | CER mean | CER median |",
                  "|---|---|---|"]
        n_members = len(members)
        for label, key in (
                ("greedy (seed 1)", "ocr"),
                ("greedy (seed 2)", "ocr_seed2"),
                ("beam, single model", "ocr_beam_single"),
                ("voted greedy (%d models, char-position vote)"
                 % n_members, "ocr_voted_greedy"),
                ("voted beam (%d models, char-position vote)"
                 % n_members, "ocr_voted_beam"),
                ("frame-averaged beam (%d models; retired — CTC "
                 "alignment drift)" % n_members, "ocr_voted_frames")):
            r = report.get(key)
            if r:
                lines.append("| %s | %.4f | %.4f |" % (
                    label, r["cer"], r["cer_median"]))
    lines += ["",
              "## Full pipeline on val pages (segment -> compose)",
              "",
              "composed CER = the page.txt stream (recognition AND "
              "reading order); order-free CER = matched lines "
              "re-composed in GT order (composed − order-free = "
              "reading-order loss); spurious = detected-text chars "
              "never matched to a GT line (insertions).",
              "",
              "| pipeline | line recall | CER mean | CER median | "
              "composed CER | order-free CER | spurious | s/page |",
              "|---|---|---|---|---|---|---|---|"]
    for label, r in results.items():
        c = r["cer"]
        lines.append("| %s | %.3f | %s | %s | %s | %s | %s | %s |" % (
            label, c["line_recall"],
            "%.4f" % c["cer"] if c["cer"] is not None else "-",
            "%.4f" % c["cer_median"] if c["cer_median"] is not None
            else "-",
            "%.4f" % r["composed_cer"]
            if r.get("composed_cer") is not None else "-",
            "%.4f" % c["order_free_cer"]
            if c.get("order_free_cer") is not None else "-",
            "%.1f%%" % (100 * c.get("spurious_chars_frac", 0.0)),
            "%.1f" % r["seconds_per_page"]
            if r.get("seconds_per_page") is not None else "-"))
    if seg_diffs:
        mean_text = float(np.mean(
            [d["regions"].get("TEXT", 0.0) for d in seg_diffs]))
        lines += ["",
                  "## Trained vs heuristic artifact diff",
                  "",
                  "mask agreement (TEXT IoU trained vs heuristic "
                  "segment.zip): %.3f over %d pages" % (
                      mean_text, len(seg_diffs))]

    # per-stage loss attribution on the student + voted pipelines
    try:
        import diagnose_pipeline as diag
        import collections
        for chain in ("student", "student_voted"):
            cats = collections.Counter()
            corpus = work / ("pipeline_" + chain)
            for img in sorted(corpus.glob("*.png")):
                gt_path = work / "val" / (img.stem + ".gt.json")
                if ".labels." in img.name or not gt_path.exists():
                    continue
                if not (img.parent / (img.stem + ".out") /
                        "ocr.zip").exists():
                    continue
                for row in diag.diagnose_page(
                        img, json.loads(gt_path.read_text())):
                    cats[row["cat"]] += 1
            total = sum(cats.values())
            if total:
                lines += ["",
                          "## Pipeline loss attribution (%s chain)"
                          % chain,
                          "",
                          "| category | lines | % |", "|---|---|---|"]
                for cat, n in cats.most_common():
                    lines.append("| %s | %d | %.1f |"
                                 % (cat, n, 100.0 * n / total))
    except Exception as e:          # diagnosis is best-effort
        lines += ["", "(loss attribution unavailable: %s)" % e]
    lines += ["",
              "Reproduce: `python scripts/bootstrap_synth.py` then "
              "`python scripts/make_compare_report.py`.", ""]
    Path(args.out).write_text("\n".join(lines))
    # persist raw results so --metrics-only reruns keep the timed
    # s/page while recomputing quality numbers
    Path(str(Path(args.out)) + ".results.json").write_text(
        json.dumps(results, indent=1, default=str))
    print("wrote", args.out)
    print(json.dumps(results, indent=1, default=str))


if __name__ == "__main__":
    main()

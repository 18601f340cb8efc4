"""Production bootstrap on the synthetic corpus: train the full-quality
segmentation ensembles (region s2d4 width-2, separator s2d2 width-1, 5
members each — the flagship pair of docs/performance.md), distill each
into one student, train the CTC recognizer, and evaluate everything
(per-class IoU through the serving SegmentationPredictor, CER through
the serving RecognizerPredictor). Writes models + report.json under
--work (default work/bootstrap).

Run on the TPU chip:
    PYTHONPATH=/root/repo:/root/.axon_site python scripts/bootstrap_synth.py
"""

import argparse
import json
import logging
import sys
import time
from pathlib import Path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--work", default="work/bootstrap")
    ap.add_argument("--train-pages", type=int, default=48)
    ap.add_argument("--val-pages", type=int, default=12)
    ap.add_argument("--members", type=int, default=5)
    ap.add_argument("--seg-steps", type=int, default=600)
    ap.add_argument("--distill-steps", type=int, default=1200)
    ap.add_argument("--ocr-steps", type=int, default=4000)
    ap.add_argument("--ocr-pool", type=int, default=8000)
    ap.add_argument("--ocr-seeds", type=int, default=1,
                    help="train N recognizer seeds (recognizer, "
                         "recognizer2, ...) for voting evaluation")
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--full-size", default="1280x2432")
    ap.add_argument("--phases", default="gen,seg,distill,ocr,eval")
    ap.add_argument("--platform", default=None,
                    help="force jax platform (e.g. cpu)")
    args = ap.parse_args()

    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(levelname)s %(message)s")
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    from origami_tpu.parallel.cache import ensure_compilation_cache
    ensure_compilation_cache()
    from origami_tpu.train import bootstrap, synth

    work = Path(args.work)
    work.mkdir(parents=True, exist_ok=True)
    phases = set(args.phases.split(","))
    fw, fh = (int(v) for v in args.full_size.split("x"))
    report_path = work / "report.json"
    report = json.loads(report_path.read_text()) \
        if report_path.exists() else {}

    def save_report():
        report_path.write_text(json.dumps(report, indent=2))

    if "gen" in phases:
        t0 = time.time()
        synth.write_corpus(work / "train", args.train_pages, seed=1)
        synth.write_corpus(work / "val", args.val_pages, seed=7_000_000)
        logging.info("corpus generated in %.1f s", time.time() - t0)

    if "seg" in phases:
        t0 = time.time()
        bootstrap.train_segmentation(
            work / "train", work / "models", "region",
            members=args.members, steps=args.seg_steps, width=2.0,
            s2d=4, full_size=(fw, fh), batch=args.batch)
        bootstrap.train_segmentation(
            work / "train", work / "models", "separator",
            members=args.members, steps=args.seg_steps, width=1.0,
            s2d=2, full_size=(fw, fh), batch=args.batch)
        report["seg_train_seconds"] = round(time.time() - t0, 1)
        save_report()

    if "distill" in phases:
        t0 = time.time()
        bootstrap.distill_students(
            work / "models", work / "train", work / "students",
            steps=args.distill_steps, batch=args.batch)
        report["distill_seconds"] = round(time.time() - t0, 1)
        save_report()

    if "ocr" in phases:
        t0 = time.time()
        bootstrap.train_recognizer_synth(
            work / "recognizer", steps=args.ocr_steps,
            n_pool=args.ocr_pool)
        report["ocr_train_seconds"] = round(time.time() - t0, 1)
        save_report()
        for extra in range(1, args.ocr_seeds):
            t0 = time.time()
            bootstrap.train_recognizer_synth(
                work / ("recognizer%d" % (extra + 1)),
                steps=args.ocr_steps, n_pool=args.ocr_pool, seed=extra)
            report["ocr%d_train_seconds" % (extra + 1)] = \
                round(time.time() - t0, 1)
            save_report()

    if "eval" in phases:
        t0 = time.time()
        report["iou_ensemble"] = bootstrap.eval_segmentation(
            work / "models", work / "val", target="quality")
        report["iou_ensemble_speed1"] = bootstrap.eval_segmentation(
            work / "models", work / "val", target="speed")
        report["iou_student"] = bootstrap.eval_segmentation(
            work / "students", work / "val", target="speed")
        report["sep_tolerant_ensemble"] = \
            bootstrap.eval_separator_tolerant(
                work / "models", work / "val", target="quality")
        report["sep_tolerant_student"] = \
            bootstrap.eval_separator_tolerant(
                work / "students", work / "val", target="speed")
        report["ocr"] = bootstrap.eval_recognizer(
            work / "recognizer", n=300)
        if (work / "recognizer2" / "meta.json").exists():
            report["ocr_seed2"] = bootstrap.eval_recognizer(
                work / "recognizer2", n=300)
            # the Calamari-style quality mode: 2-model voted beam vs
            # single greedy (VERDICT r3 item 6)
            report["ocr_voted_beam"] = bootstrap.eval_recognizer(
                [work / "recognizer", work / "recognizer2"],
                n=300, decoder="beam")
            report["ocr_voted_frames"] = bootstrap.eval_recognizer(
                [work / "recognizer", work / "recognizer2"],
                n=300, decoder="beam", vote="frames")
            report["ocr_voted_greedy"] = bootstrap.eval_recognizer(
                [work / "recognizer", work / "recognizer2"], n=300)
            report["ocr_beam_single"] = bootstrap.eval_recognizer(
                work / "recognizer", n=300, decoder="beam")
        report["eval_seconds"] = round(time.time() - t0, 1)
        save_report()
        logging.info("REPORT: %s", json.dumps(report, indent=2))

    save_report()


if __name__ == "__main__":
    sys.exit(main())

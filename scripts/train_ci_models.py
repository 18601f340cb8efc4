"""Train the small COMMITTED models used by CI quality tests.

Two half-resolution single-member U-Nets (region s2d4 / separator s2d2,
width 0.25) and a small CTC recognizer, trained on the synthetic corpus
and saved under tests/data/models (~10 MB total). CI loads them to
assert real quality numbers (IoU / CER) without training at test time.

Run on the TPU chip:
    PYTHONPATH=/root/repo:/root/.axon_site python scripts/train_ci_models.py
"""

import argparse
import json
import logging
import tempfile
from pathlib import Path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="tests/data/models")
    ap.add_argument("--pages", type=int, default=16)
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--ocr-steps", type=int, default=3000)
    args = ap.parse_args()
    logging.basicConfig(level=logging.INFO)

    from origami_tpu.parallel.cache import ensure_compilation_cache
    ensure_compilation_cache()
    from origami_tpu.train import bootstrap, synth

    out = Path(args.out)
    work = Path(tempfile.mkdtemp(prefix="ci_models_"))
    synth.write_corpus(work / "train", args.pages, seed=31)
    synth.write_corpus(work / "val", 4, seed=8_000_000)

    seg = out / "segmentation"
    bootstrap.train_segmentation(
        work / "train", seg, "region", members=1, steps=args.steps,
        width=0.25, s2d=4, full_size=(640, 1216), batch=2)
    bootstrap.train_segmentation(
        work / "train", seg, "separator", members=1, steps=args.steps,
        width=0.25, s2d=2, full_size=(640, 1216), batch=2)
    iou = bootstrap.eval_segmentation(seg, work / "val",
                                      target="speed")

    rec = out / "recognizer"
    bootstrap.train_recognizer_synth(
        rec, steps=args.ocr_steps, batch=64, n_pool=4000,
        conv_features=(32, 64, 96), lstm_features=96)
    ocr = bootstrap.eval_recognizer(rec, n=120)

    report = dict(iou=iou, ocr=ocr, steps=args.steps,
                  ocr_steps=args.ocr_steps, pages=args.pages)
    (out / "training_report.json").write_text(
        json.dumps(report, indent=2))
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()

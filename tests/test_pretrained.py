"""Trained-model pipeline coverage (VERDICT r2 weak-8): the checked-in
pretrained students + recognizer (models_pretrained/, packed by
scripts/pack_pretrained.py from the TPU training bootstrap) drive the
full detect chain, and the artifact chain they produce must hit quality
floors on a synthetic-GT page — the suite exercises the product models,
not just the heuristic scaffold."""

import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).parent.parent
PRETRAINED = ROOT / "models_pretrained"

# the pack ships in-tree (committed, VERDICT r4 item 1): its absence is
# a release failure, so these tests FAIL (never skip) when it's gone —
# the r3 and r4 rounds both lost the pack to silent skips.
PACK_FILES = [
    PRETRAINED / "recognizer" / "meta.json",
    PRETRAINED / "recognizer" / "params.msgpack",
    PRETRAINED / "recognizer2" / "meta.json",
    PRETRAINED / "recognizer2" / "params.msgpack",
    PRETRAINED / "recognizer3" / "meta.json",
    PRETRAINED / "recognizer3" / "params.msgpack",
    PRETRAINED / "students" / "region" / "00" / "meta.json",
    PRETRAINED / "students" / "region" / "00" / "params.msgpack",
    PRETRAINED / "students" / "separator" / "00" / "meta.json",
    PRETRAINED / "students" / "separator" / "00" / "params.msgpack",
]


def test_pretrained_pack_shipped():
    """The product models must be (a) on disk and (b) tracked by git —
    an untracked working-tree copy benches fine locally but vanishes
    from a clean clone (the exact r4 failure: snapshot commit 7d64901
    deleted what f5abd2e added)."""
    missing = [str(p.relative_to(ROOT)) for p in PACK_FILES
               if not p.exists()]
    assert not missing, (
        "models_pretrained/ is missing files %s — the shipped product "
        "pack must exist in every checkout (scripts/pack_pretrained.py "
        "rebuilds it from a training bootstrap)" % missing)
    if (ROOT / ".git").exists():
        tracked = subprocess.run(
            ["git", "-C", str(ROOT), "ls-files", "models_pretrained"],
            capture_output=True, text=True).stdout.splitlines()
        untracked = [str(p.relative_to(ROOT)) for p in PACK_FILES
                     if str(p.relative_to(ROOT)) not in tracked]
        assert not untracked, (
            "models_pretrained files exist but are NOT tracked by git "
            "(%s): a clean clone would ship without the product — "
            "git add models_pretrained/" % untracked)


def test_pretrained_student_chain(tmp_path):
    sys.path.insert(0, str(ROOT / "scripts"))
    from make_compare_report import pipeline_cer, run_pipeline
    from origami_tpu.train.synth import write_corpus

    corpus = tmp_path / "corpus"
    write_corpus(corpus, 1, seed=424242)
    run_pipeline(corpus, PRETRAINED / "students",
                 PRETRAINED / "recognizer", target="speed")
    r = pipeline_cer(corpus, corpus)
    assert r["n_gt"] >= 10
    assert r["line_recall"] >= 0.85, r
    assert r["cer"] is not None and r["cer"] <= 0.06, r


def test_pretrained_student_segmentation_quality(tmp_path):
    """Region mask IoU of the f16-loaded student vs exact GT labels."""
    import numpy as np
    import PIL.Image
    from origami_tpu.batch.detect.segment import SegmentationProcessor
    from origami_tpu.core.segment import Segmentation
    from origami_tpu.train.synth import render_page

    page = render_page(424243)
    corpus = tmp_path / "corpus"
    corpus.mkdir()
    PIL.Image.fromarray(page.image).save(corpus / "p.png")
    SegmentationProcessor(str(PRETRAINED / "students"), dict(
        lock_strategy="NONE", plain=True, target="speed")).traverse(corpus)
    seg = Segmentation.open(corpus / "p.out" / "segment.zip")
    reg = seg.by_name("regions")
    pred_text = np.asarray(reg.labels) == reg.classes["TEXT"].value
    gt_text = page.region_labels == 0
    if pred_text.shape != gt_text.shape:
        # labels live at NET canvas resolution (the reference's
        # segment.zip also stores net-size maps) — resize GT onto the
        # prediction grid exactly like train.bootstrap.eval_segmentation
        # (cropping compares misaligned grids and reads as a quality
        # loss that isn't there)
        import cv2
        gt_text = cv2.resize(
            gt_text.astype(np.uint8),
            (pred_text.shape[1], pred_text.shape[0]),
            interpolation=cv2.INTER_NEAREST).astype(bool)
    inter = float(np.logical_and(pred_text, gt_text).sum())
    union = float(np.logical_or(pred_text, gt_text).sum())
    assert union > 0 and inter / union > 0.80, inter / max(union, 1)


def test_pretrained_auto_mode_sanitizes_real_scan():
    """Hybrid 'auto' segmentation on the real 1872 fixture: the
    synthetic-trained students hallucinate TABULAR over the text
    columns (docs/real_scan_eval_r04.json, unadapted recall 0.254);
    AutoSegmentationPredictor must reclassify the unsupported TABULAR
    components so the page keeps its trained TEXT regions (measured
    chain recall 0.649 vs the 0.45 heuristic floor)."""
    import numpy as np
    import PIL.Image
    from origami_tpu.core.predict import AutoSegmentationPredictor

    page = np.asarray(PIL.Image.open(
        ROOT / "tests" / "data" / "real_scan_1872.png").convert("L"))
    pred = AutoSegmentationPredictor(
        PRETRAINED / "students", target="speed")
    seg = pred.predict_batch([page])[0]
    assert pred.last_modes == ["trained"]
    reg = seg.by_name("regions")
    frac = dict()
    for name in ("TEXT", "TABULAR"):
        frac[name] = float(reg.class_mask(name).mean())
    # raw prediction is ~21% TABULAR; sanitization must clear it
    assert frac["TABULAR"] <= 0.01, frac
    assert frac["TEXT"] >= 0.5, frac

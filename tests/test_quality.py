"""Detection QUALITY assertions on realistic synthetic newspaper pages
with exact ground truth (train.synth) — not just artifact presence:
baselines must land on the GT text lines and segmentation must cover
the GT regions (VERDICT r1: quality was untested everywhere it
matters; core/baselines.py is the riskiest accuracy swap)."""

import json
import zipfile
from pathlib import Path

import numpy as np
import PIL.Image
import pytest


@pytest.fixture(scope="session")
def quality_corpus(tmp_path_factory):
    """Two realistic synthetic pages run through segment..lines."""
    from origami_tpu.train.synth import render_page
    from origami_tpu.batch.detect.segment import SegmentationProcessor
    from origami_tpu.batch.detect.contours import ContoursProcessor
    from origami_tpu.batch.detect.flow import FlowDetectionProcessor
    from origami_tpu.batch.detect.dewarp import DewarpProcessor
    from origami_tpu.batch.detect.layout import LayoutDetectionProcessor
    from origami_tpu.batch.detect.lines import LineDetectionProcessor

    root = tmp_path_factory.mktemp("quality") / "corpus"
    root.mkdir()
    pages = {}
    for i in range(2):
        page = render_page(55_000_000 + i, n_columns=2)
        name = "q%d.png" % i
        PIL.Image.fromarray(page.image).save(str(root / name))
        pages[name] = page
    opts = dict(lock_strategy="NONE", plain=True)
    SegmentationProcessor("heuristic", opts).traverse(root)
    ContoursProcessor(opts).traverse(root)
    FlowDetectionProcessor(opts).traverse(root)
    DewarpProcessor(opts).traverse(root)
    LayoutDetectionProcessor(dict(layout="bbz", **opts)).traverse(root)
    LineDetectionProcessor(opts).traverse(root)
    return root, pages


def _detected_baselines(out_dir):
    """Detected baselines mapped back into WARPED page space (the lines
    stage works in dewarped coordinates, which carry the dewarp margin
    offset)."""
    from origami_tpu.core.dewarp import Grid
    grid = Grid.open(out_dir / "dewarp.zip")
    lines = []
    with zipfile.ZipFile(out_dir / "lines.3.zip") as zf:
        for n in zf.namelist():
            if not n.endswith(".json") or n.endswith("meta.json"):
                continue
            d = json.loads(zf.read(n))
            bl = (d.get("tesseract_data") or {}).get("baseline")
            if bl:
                lines.append(grid.inverse_points(
                    np.asarray(bl, float)))
    return lines


def test_baselines_land_on_gt_lines(quality_corpus):
    root, pages = quality_corpus
    total, matched = 0, 0
    for name, page in pages.items():
        out = root / (Path(name).stem + ".out")
        detected = _detected_baselines(out)
        assert detected, "no baselines detected on %s" % name
        heights = [l.bbox[3] - l.bbox[1] for l in page.lines]
        tol = 0.75 * float(np.median(heights))
        for gt in page.lines:
            (x0, y), (x1, _) = gt.baseline
            if x1 - x0 < 60:      # skip specks/table cells
                continue
            mx, my = (x0 + x1) / 2.0, y
            total += 1
            for bl in detected:
                bx0, bx1 = bl[:, 0].min(), bl[:, 0].max()
                if not (bx0 - tol <= mx <= bx1 + tol):
                    continue
                by = float(np.interp(mx, bl[:, 0], bl[:, 1]))
                if abs(by - my) <= tol:
                    matched += 1
                    break
    assert total >= 80
    recall = matched / total
    assert recall >= 0.85, "baseline recall %.2f (%d/%d)" % (
        recall, matched, total)


def test_segmentation_covers_gt_text(quality_corpus):
    import cv2
    from origami_tpu.core.segment import Segmentation
    root, pages = quality_corpus
    for name, page in pages.items():
        out = root / (Path(name).stem + ".out")
        seg = Segmentation.open(out / "segment.zip")
        pred = seg.by_name("regions")
        lab = pred.labels
        gt = cv2.resize(page.region_labels,
                        (lab.shape[1], lab.shape[0]),
                        interpolation=cv2.INTER_NEAREST)
        text_idx = pred.classes["TEXT"].value
        gt_text = gt == 0       # synth REGION["TEXT"] == 0
        pr_text = lab == text_idx
        recall = (gt_text & pr_text).sum() / max(gt_text.sum(), 1)
        # model-free heuristic: ink-coverage recall of GT text area
        assert recall >= 0.5, "%s text recall %.2f" % (name, recall)
        # and TEXT prediction should not spill over everything
        precision = (gt_text & pr_text).sum() / max(pr_text.sum(), 1)
        assert precision >= 0.5, "%s precision %.2f" % (name, precision)


def test_separators_detected(quality_corpus):
    import cv2
    from origami_tpu.core.segment import Segmentation
    root, pages = quality_corpus
    for name, page in pages.items():
        out = root / (Path(name).stem + ".out")
        seg = Segmentation.open(out / "segment.zip")
        pred = seg.by_name("separators")
        lab = pred.labels
        gt = cv2.resize(page.separator_labels,
                        (lab.shape[1], lab.shape[0]),
                        interpolation=cv2.INTER_NEAREST)
        # vertical column rules must be found where GT has them
        gt_v = gt == 1          # synth SEP["V"] == 1
        pr_v = lab == pred.classes["V"].value
        if gt_v.sum() < 100:
            continue
        # dilate prediction: hairline masks need positional, not
        # per-pixel, agreement
        pr_wide = cv2.dilate(pr_v.astype(np.uint8),
                             np.ones((5, 5), np.uint8)) > 0
        recall = (gt_v & pr_wide).sum() / gt_v.sum()
        assert recall >= 0.5, "%s V-separator recall %.2f" % (
            name, recall)

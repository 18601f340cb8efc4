"""Accuracy on REAL newspaper scans, against hand-authored GT.

The fixtures are the reference project's own documentation sample pages
(SNP2436020X 1872-04-10 p.12 and Berliner Börsen-Zeitung 1925-02-27
Beilage, from /root/reference/docs/img/), grayscaled. They are debug
renders — pale line/contour highlights and small overlay markers sit on
top of genuine scans. `<page>.gt.json` carries hand-authored ground
truth (projection-profile assisted, visually verified): baseline rows
with ink extents and column region boxes.

Two accuracy axes are separated on purpose:
  * placement — a baseline that IS detected must sit within half a
    line-height of the true baseline (VERDICT r2 item 7);
  * recall — how many GT baselines are detected at all. The heuristic
    segmenter is the floor here (the debug-overlay scans are hard for
    it); trained-model numbers come from scripts/eval_real_scan.py.
"""

import json
import zipfile
from pathlib import Path

import numpy as np
import pytest

DATA = Path(__file__).parent / "data"


def _gt(name):
    return json.loads((DATA / name).read_text())


@pytest.fixture(scope="module")
def real_corpus(tmp_path_factory):
    import shutil
    corpus = tmp_path_factory.mktemp("real") / "corpus"
    corpus.mkdir()
    shutil.copy(DATA / "real_scan_1872.png", corpus / "p1872.png")
    shutil.copy(DATA / "real_scan_bbz_1925.png", corpus / "p1925.png")

    from origami_tpu.batch.detect.segment import SegmentationProcessor
    from origami_tpu.batch.detect.contours import ContoursProcessor
    from origami_tpu.batch.detect.flow import FlowDetectionProcessor
    from origami_tpu.batch.detect.dewarp import DewarpProcessor
    from origami_tpu.batch.detect.layout import LayoutDetectionProcessor
    from origami_tpu.batch.detect.lines import LineDetectionProcessor
    from origami_tpu.batch.detect.order import ReadingOrderProcessor

    opts = dict(lock_strategy="NONE", plain=True)
    for proc in [
            SegmentationProcessor("heuristic", opts),
            ContoursProcessor(opts),
            FlowDetectionProcessor(opts),
            DewarpProcessor(opts),
            LayoutDetectionProcessor(dict(layout="bbz", **opts)),
            LineDetectionProcessor(opts),
            ReadingOrderProcessor(opts)]:
        proc.traverse(corpus)
    return corpus


def _lines(corpus, name):
    out = corpus / (name + ".out")
    lines = {}
    with zipfile.ZipFile(out / "lines.3.zip") as zf:
        for n in zf.namelist():
            if n.endswith(".json") and n != "meta.json":
                lines[n[:-5]] = json.loads(zf.read(n))
    return lines


def test_real_scan_finds_a_newspaper_of_lines(real_corpus):
    lines = _lines(real_corpus, "p1872")
    # the 1872 page is dense table + body text: a real detection finds
    # dozens of lines (debug-overlay noise may perturb a few)
    assert len(lines) >= 40, len(lines)


def test_real_scan_baselines_are_level(real_corpus):
    lines = _lines(real_corpus, "p1872")
    slopes = []
    widths = []
    for d in lines.values():
        bl = (d.get("tesseract_data") or {}).get("baseline")
        if not bl or len(bl) < 2:
            continue
        bl = np.asarray(bl, float)
        dx = bl[-1, 0] - bl[0, 0]
        if dx < 80:
            continue
        slopes.append((bl[-1, 1] - bl[0, 1]) / dx)
        widths.append(dx)
    assert len(slopes) >= 30, len(slopes)
    # print-era newspaper lines are near-horizontal after deskew/dewarp
    assert abs(float(np.median(slopes))) < 0.03, np.median(slopes)
    assert float(np.mean(np.abs(np.asarray(slopes)) < 0.08)) > 0.85


def test_real_scan_text_regions_cover_content(real_corpus):
    import PIL.Image
    from origami_tpu import geometry as G
    out = real_corpus / "p1872.out"
    polys = []
    with zipfile.ZipFile(out / "contours.2.zip") as zf:
        for n in zf.namelist():
            if n.startswith("regions/TEXT") and n.endswith(".wkt"):
                polys.append(G.wkt.loads(zf.read(n).decode("utf8")))
    assert polys, "no TEXT regions detected"
    area = sum(p.area for p in polys)
    im = PIL.Image.open(DATA / "real_scan_1872.png")
    w, h = im.size
    # the printed area of this page is roughly the right 60%; text
    # regions should cover a substantial share of the page
    assert area > 0.15 * w * h, area / (w * h)

    order = json.loads((out / "order.json").read_text())
    assert order["orders"]["*"], "empty reading order"


def _detected_baselines(corpus, name):
    dets = []
    for d in _lines(corpus, name).values():
        bl = (d.get("tesseract_data") or {}).get("baseline")
        if bl and len(bl) >= 2:
            p = np.asarray(bl, float)
            dets.append(p[np.argsort(p[:, 0])])
    return dets


def _accuracy(corpus, name, gt_file):
    from origami_tpu.batch.utils.evaluate import match_baselines
    gt = _gt(gt_file)
    res = match_baselines(gt["lines"], _detected_baselines(corpus, name))
    hs = np.array([g["h"] for g, _ in res], float)
    tol = np.maximum(0.5 * hs, 4.0)
    d = np.array([x if x is not None else np.inf for _, x in res])
    true = d <= 2 * tol
    return dict(recall=float(np.mean(d <= tol)),
                n_true=int(true.sum()),
                placement=float(np.median(d[true])) if true.any() else np.inf,
                h=float(np.median(hs)))


def test_baseline_accuracy_1872(real_corpus):
    m = _accuracy(real_corpus, "p1872", "real_scan_1872.gt.json")
    # placement: detected baselines sit within 0.5 x line-height
    assert m["n_true"] >= 80, m
    assert m["placement"] <= 0.5 * m["h"], m
    assert m["recall"] >= 0.45, m


def test_baseline_accuracy_1925(real_corpus):
    m = _accuracy(real_corpus, "p1925", "real_scan_bbz_1925.gt.json")
    # the low-contrast debug scan is the hard case: placement must
    # still be tight for the lines the heuristic chain does find
    assert m["n_true"] >= 20, m
    assert m["placement"] <= max(0.5 * m["h"], 4.0), m
    assert m["recall"] >= 0.22, m


def _region_cover(corpus, name, gt_file):
    from origami_tpu import geometry as G
    gt = _gt(gt_file)
    out = corpus / (name + ".out")
    polys = []
    with zipfile.ZipFile(out / "contours.2.zip") as zf:
        for n in zf.namelist():
            if n.startswith("regions/TEXT") and n.endswith(".wkt"):
                polys.append(G.wkt.loads(zf.read(n).decode("utf8")))
    union = G.unary_union(polys)
    return {rname: union.intersection(
                G.box(x0, y0, x1, y1)).area / ((x1 - x0) * (y1 - y0))
            for rname, (x0, y0, x1, y1) in gt["regions"].items()}


@pytest.fixture(scope="module")
def auto_corpus(tmp_path_factory):
    """The PRODUCT operating mode on real scans (VERDICT r4 item 5):
    'auto' segmentation — trained students + TABULAR sanitization +
    per-page heuristic fallback — through the same chain. The floors
    asserted below gate the auto mode itself, not just the heuristic
    fallback."""
    import shutil
    students = Path(__file__).parent.parent / "models_pretrained" / "students"
    assert students.exists(), (
        "models_pretrained/students missing — the shipped pack is "
        "required (see tests/test_pretrained.py)")
    corpus = tmp_path_factory.mktemp("real_auto") / "corpus"
    corpus.mkdir()
    shutil.copy(DATA / "real_scan_1872.png", corpus / "p1872.png")
    shutil.copy(DATA / "real_scan_bbz_1925.png", corpus / "p1925.png")

    from origami_tpu.batch.detect.segment import SegmentationProcessor
    from origami_tpu.batch.detect.contours import ContoursProcessor
    from origami_tpu.batch.detect.flow import FlowDetectionProcessor
    from origami_tpu.batch.detect.dewarp import DewarpProcessor
    from origami_tpu.batch.detect.layout import LayoutDetectionProcessor
    from origami_tpu.batch.detect.lines import LineDetectionProcessor
    from origami_tpu.batch.detect.order import ReadingOrderProcessor

    opts = dict(lock_strategy="NONE", plain=True)
    for proc in [
            SegmentationProcessor("auto:%s" % students,
                                  dict(target="speed", **opts)),
            ContoursProcessor(opts),
            FlowDetectionProcessor(opts),
            DewarpProcessor(opts),
            LayoutDetectionProcessor(dict(layout="bbz", **opts)),
            LineDetectionProcessor(opts),
            ReadingOrderProcessor(opts)]:
        proc.traverse(corpus)
    return corpus


def _precision(corpus, name, gt_file):
    from origami_tpu.batch.utils.evaluate import gt_zones, match_detections
    gt = _gt(gt_file)
    return match_detections(gt["lines"], _detected_baselines(corpus, name),
                            zones=gt_zones(gt["lines"]))


def test_auto_mode_accuracy_1872(auto_corpus):
    m = _accuracy(auto_corpus, "p1872", "real_scan_1872.gt.json")
    p = _precision(auto_corpus, "p1872", "real_scan_1872.gt.json")
    assert m["recall"] >= 0.6, (m, p)
    assert p["precision"] >= 0.5, (m, p)


def test_auto_mode_accuracy_1925(auto_corpus):
    m = _accuracy(auto_corpus, "p1925", "real_scan_bbz_1925.gt.json")
    p = _precision(auto_corpus, "p1925", "real_scan_bbz_1925.gt.json")
    assert m["recall"] >= 0.6, (m, p)
    assert p["precision"] >= 0.5, (m, p)


def test_match_detections_zone_limited():
    """Precision matching: in-zone hits and misses counted, detections
    outside every annotated band excluded from the denominator."""
    from origami_tpu.batch.utils.evaluate import gt_zones, match_detections
    gt = [dict(y=100, x0=0, x1=200, h=10, band="a"),
          dict(y=120, x0=0, x1=200, h=10, band="a")]
    zones = gt_zones(gt)
    assert len(zones) == 1
    dets = [
        np.array([[0, 101], [200, 101]], float),    # TP (gap 1 <= 5)
        np.array([[0, 111], [200, 111]], float),    # FP (gap 6/9 > 5)
        np.array([[0, 900], [200, 900]], float),    # out of zone
    ]
    m = match_detections(gt, dets, zones=zones)
    assert m["n_considered"] == 2, m
    assert m["n_true"] == 1, m
    assert m["n_out_of_zone"] == 1, m
    assert m["precision"] == 0.5, m
    # full-page GT (no bands): zones is None, everything counted
    gt_full = [dict(y=100, x0=0, x1=200, h=10)]
    assert gt_zones(gt_full) is None
    m = match_detections(gt_full, dets, zones=None)
    assert m["n_considered"] == 3 and m["n_true"] == 1, m


def test_region_cover_1872(real_corpus):
    cov = _region_cover(real_corpus, "p1872", "real_scan_1872.gt.json")
    assert min(cov.values()) >= 0.7, cov


def test_region_cover_1925(real_corpus):
    cov = _region_cover(real_corpus, "p1925", "real_scan_bbz_1925.gt.json")
    assert min(cov.values()) >= 0.6, cov

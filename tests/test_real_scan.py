"""Structural quality on REAL newspaper scans.

The fixtures are the reference project's own documentation sample pages
(SNP2436020X 1872-04-10 p.12 and Berliner Börsen-Zeitung 1925-02-27
Beilage, from /root/reference/docs/img/), grayscaled. They are debug
renders — pale line/contour highlights and small overlay markers sit on
top of genuine scans — so the assertions are structural, not exact:
the pipeline must find a newspaper's worth of text lines, with mostly
level baselines, inside sensible text regions. This is the repo's
"does it work on a real scan" smoke layer (synthetic pages with exact
GT cover precision separately, tests/test_quality.py).
"""

import json
import zipfile
from pathlib import Path

import numpy as np
import pytest

DATA = Path(__file__).parent / "data"


@pytest.fixture(scope="module")
def real_corpus(tmp_path_factory):
    import shutil
    corpus = tmp_path_factory.mktemp("real") / "corpus"
    corpus.mkdir()
    shutil.copy(DATA / "real_scan_1872.png", corpus / "p1872.png")

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

"""End-to-end pipeline tests over a tiny synthetic corpus (the FAKE-OCR
test strategy the reference lacks, SURVEY.md §4)."""

import json
import zipfile
from pathlib import Path

import numpy as np
import PIL.Image
import pytest


@pytest.fixture()
def corpus(tmp_path, synthetic_page):
    root = tmp_path / "corpus"
    root.mkdir()
    PIL.Image.fromarray(synthetic_page).save(root / "page0001.png")
    return root


def _run_segment(corpus):
    from origami_tpu.batch.detect.segment import SegmentationProcessor
    proc = SegmentationProcessor("heuristic", dict(
        lock_strategy="NONE", plain=True))
    proc.traverse(corpus)


def test_segment_stage(corpus):
    _run_segment(corpus)
    out = corpus / "page0001.out" / "segment.zip"
    assert out.exists()
    from origami_tpu.core.segment import Segmentation, PredictorType
    seg = Segmentation.open(out)
    assert {p.name for p in seg.predictions} == {"regions", "separators"}
    reg = seg.by_name("regions")
    assert reg.type == PredictorType.REGION
    # substantial text detected
    text_frac = (reg.labels == reg.classes["TEXT"].value).mean()
    assert text_frac > 0.1
    sep = seg.by_name("separators")
    v_frac = (sep.labels == sep.classes["V"].value).mean()
    assert v_frac > 0  # the vertical rule was found
    # runtime.json written
    rt = json.loads((corpus / "page0001.out" / "runtime.json").read_text())
    status = list(rt.values())[0]
    assert status["status"] == "COMPLETED"


def test_contours_stage(corpus):
    _run_segment(corpus)
    from origami_tpu.batch.detect.contours import ContoursProcessor
    ContoursProcessor(dict(lock_strategy="NONE", plain=True)) \
        .traverse(corpus)
    out = corpus / "page0001.out" / "contours.0.zip"
    assert out.exists()
    from origami_tpu.batch.core.io import read_contours_zip, read_separators
    from origami_tpu.core.segment import PredictorType
    items, meta = read_contours_zip(out, PredictorType.REGION)
    text_regions = [g for parts, g in items if parts[1] == "TEXT"]
    assert len(text_regions) >= 2       # two columns
    assert all(g.geom_type == "Polygon" for g in text_regions)
    seps, widths = read_separators(out)
    v_seps = [g for parts, g in seps.items() if parts[1] == "V"]
    assert len(v_seps) >= 1
    # v separator runs roughly down the middle
    c = v_seps[0].np_coords
    assert 180 < np.mean(c[:, 0]) < 220
    assert widths  # width metadata present


def test_skip_existing_and_overwrite(corpus):
    _run_segment(corpus)
    out = corpus / "page0001.out" / "segment.zip"
    t0 = out.stat().st_mtime_ns
    _run_segment(corpus)   # skip: exists
    assert out.stat().st_mtime_ns == t0
    from origami_tpu.batch.detect.segment import SegmentationProcessor
    SegmentationProcessor("heuristic", dict(
        lock_strategy="NONE", plain=True, overwrite=True)).traverse(corpus)
    assert out.stat().st_mtime_ns > t0

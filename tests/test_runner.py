"""Wave-pipelined runner equivalence (batch/runner.py).

The runner overlaps device stages of neighboring waves with host
geometry, but it only REORDERS page traversals — artifacts and
runtime.json records must come out exactly as sequential stage-by-stage
traversal produces them.
"""

import json
import zipfile

import PIL.Image
import pytest


def _make_corpus(tmp_path, name, synthetic_page, n):
    root = tmp_path / name
    root.mkdir()
    for i in range(n):
        img = synthetic_page.copy()
        img[10 + 2 * i: 12 + 2 * i, 30:370] = 25   # vary pages slightly
        PIL.Image.fromarray(img).save(root / ("p%04d.png" % i))
    return root


def _stages():
    from origami_tpu.batch.detect.compose import ComposeProcessor
    from origami_tpu.batch.detect.contours import ContoursProcessor
    from origami_tpu.batch.detect.dewarp import DewarpProcessor
    from origami_tpu.batch.detect.flow import FlowDetectionProcessor
    from origami_tpu.batch.detect.layout import LayoutDetectionProcessor
    from origami_tpu.batch.detect.lines import LineDetectionProcessor
    from origami_tpu.batch.detect.ocr import OCRProcessor
    from origami_tpu.batch.detect.order import ReadingOrderProcessor
    from origami_tpu.batch.detect.segment import SegmentationProcessor

    def opts(**kw):
        return dict(lock_strategy="NONE", plain=True, **kw)

    return [
        ("segment", SegmentationProcessor("heuristic", opts())),
        ("contours", ContoursProcessor(opts())),
        ("flow", FlowDetectionProcessor(opts())),
        ("dewarp", DewarpProcessor(opts())),
        ("layout", LayoutDetectionProcessor(opts(layout="bbz"))),
        ("lines", LineDetectionProcessor(opts())),
        ("order", ReadingOrderProcessor(opts())),
        ("ocr", OCRProcessor(opts(model="FAKE"))),
        ("compose", ComposeProcessor(opts())),
    ]


def test_runner_matches_sequential(tmp_path, synthetic_page):
    n = 4
    seq = _make_corpus(tmp_path, "seq", synthetic_page, n)
    pipe = _make_corpus(tmp_path, "pipe", synthetic_page, n)

    for name, proc in _stages():
        proc.traverse(seq)

    from origami_tpu.batch.runner import PipelinedRunner
    PipelinedRunner(_stages(), wave_size=2).run(pipe)

    for i in range(n):
        oa = seq / ("p%04d.out" % i)
        ob = pipe / ("p%04d.out" % i)
        rt = json.loads((ob / "runtime.json").read_text())
        assert rt and all(v["status"] == "COMPLETED"
                          for v in rt.values()), rt
        with zipfile.ZipFile(oa / "ocr.zip") as za, \
                zipfile.ZipFile(ob / "ocr.zip") as zb:
            assert sorted(za.namelist()) == sorted(zb.namelist())
            for entry in za.namelist():
                assert za.read(entry) == zb.read(entry)
        assert json.loads((oa / "order.json").read_text()) == \
            json.loads((ob / "order.json").read_text())
        with zipfile.ZipFile(oa / "compose.zip") as za, \
                zipfile.ZipFile(ob / "compose.zip") as zb:
            for entry in za.namelist():
                assert za.read(entry) == zb.read(entry)


def test_runner_requires_device_stages():
    from origami_tpu.batch.runner import PipelinedRunner
    with pytest.raises(ValueError):
        PipelinedRunner([("contours", object())])

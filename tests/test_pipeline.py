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


def _run_contours(corpus):
    from origami_tpu.batch.detect.contours import ContoursProcessor
    ContoursProcessor(dict(lock_strategy="NONE", plain=True)) \
        .traverse(corpus)


def _run_flow(corpus):
    from origami_tpu.batch.detect.flow import FlowDetectionProcessor
    FlowDetectionProcessor(dict(lock_strategy="NONE", plain=True)) \
        .traverse(corpus)


def test_flow_stage(corpus):
    _run_segment(corpus)
    _run_contours(corpus)
    _run_flow(corpus)
    out = corpus / "page0001.out"
    assert (out / "flow.zip").exists()
    assert (out / "lines.0.zip").exists()
    import zipfile as _zf
    from origami_tpu.core.flow import Samples
    with _zf.ZipFile(out / "flow.zip") as zf:
        sh = Samples.from_zip(zf, "h")
        sv = Samples.from_zip(zf, "v")
    assert len(sh) > 3          # baselines + H separator
    assert len(sv) > 3          # V separator + orthogonals
    # h angles near 0, v angles near pi/2
    assert abs(np.median(sh.values)) < 0.15
    assert abs(np.median(sv.values) - np.pi / 2) < 0.15
    # warped lines were detected in both columns
    with _zf.ZipFile(out / "lines.0.zip") as zf:
        names = [n for n in zf.namelist() if n.endswith(".json")]
    assert len(names) > 10


def test_dewarp_stage(corpus):
    _run_segment(corpus)
    _run_contours(corpus)
    _run_flow(corpus)
    from origami_tpu.batch.detect.dewarp import DewarpProcessor
    DewarpProcessor(dict(lock_strategy="NONE", plain=True)) \
        .traverse(corpus)
    out = corpus / "page0001.out"
    assert (out / "dewarp.zip").exists()
    assert (out / "contours.1.zip").exists()
    from origami_tpu.core.dewarp import Grid
    grid = Grid.open(out / "dewarp.zip")
    pts = grid.points("sample")
    assert pts.ndim == 3 and pts.shape[2] == 2
    # the synthetic page is unwarped: grid stays nearly regular
    assert grid.warping < 3.0
    # dewarped contours parse and cover similar area
    from origami_tpu.batch.core.io import read_contours_zip
    from origami_tpu.core.segment import PredictorType
    items0, _ = read_contours_zip(out / "contours.0.zip",
                                  PredictorType.REGION)
    items1, _ = read_contours_zip(out / "contours.1.zip",
                                  PredictorType.REGION)
    assert len(items1) == len(items0)
    a0 = sum(g.area for _, g in items0)
    a1 = sum(g.area for _, g in items1)
    assert abs(a1 - a0) / a0 < 0.25


def _run_chain(corpus, upto="compose"):
    _run_segment(corpus)
    _run_contours(corpus)
    _run_flow(corpus)
    from origami_tpu.batch.detect.dewarp import DewarpProcessor
    DewarpProcessor(dict(lock_strategy="NONE", plain=True)) \
        .traverse(corpus)
    if upto == "dewarp":
        return
    from origami_tpu.batch.detect.layout import LayoutDetectionProcessor
    LayoutDetectionProcessor(dict(lock_strategy="NONE", plain=True,
                                  layout="bbz")).traverse(corpus)
    if upto == "layout":
        return
    from origami_tpu.batch.detect.lines import LineDetectionProcessor
    LineDetectionProcessor(dict(lock_strategy="NONE", plain=True)) \
        .traverse(corpus)
    if upto == "lines":
        return
    from origami_tpu.batch.detect.order import ReadingOrderProcessor
    ReadingOrderProcessor(dict(lock_strategy="NONE", plain=True)) \
        .traverse(corpus)
    if upto == "order":
        return
    from origami_tpu.batch.detect.ocr import OCRProcessor
    OCRProcessor(dict(lock_strategy="NONE", plain=True, model="FAKE")) \
        .traverse(corpus)
    if upto == "ocr":
        return
    from origami_tpu.batch.detect.compose import ComposeProcessor
    ComposeProcessor(dict(lock_strategy="NONE", plain=True,
                          page_xml=True)).traverse(corpus)


def test_layout_stage(corpus):
    _run_chain(corpus, upto="layout")
    out = corpus / "page0001.out"
    assert (out / "contours.2.zip").exists()
    assert (out / "tables.json").exists()
    tables = json.loads((out / "tables.json").read_text())
    assert tables["version"] == 1
    from origami_tpu.batch.core.io import read_contours_zip
    from origami_tpu.core.segment import PredictorType
    items, _ = read_contours_zip(out / "contours.2.zip",
                                 PredictorType.REGION)
    text = [g for parts, g in items if parts[1] == "TEXT"]
    # the two columns must NOT merge across the V separator (whose
    # dewarped-space x we read from contours.1)
    sep_items, _ = read_contours_zip(out / "contours.1.zip",
                                     PredictorType.SEPARATOR)
    v_seps = [g for parts, g in sep_items if parts[1] == "V"]
    assert v_seps
    sep_x = float(np.mean(v_seps[0]._all_coords()[:, 0]))
    assert len(text) >= 2
    for g in text:
        minx, _, maxx, _ = g.bounds
        assert not (minx < sep_x - 10 and maxx > sep_x + 10), \
            "region crosses the column separator: %s" % (g.bounds,)


def test_lines_stage(corpus):
    _run_chain(corpus, upto="lines")
    out = corpus / "page0001.out"
    assert (out / "contours.3.zip").exists()
    assert (out / "lines.3.zip").exists()
    import zipfile as _zf
    with _zf.ZipFile(out / "lines.3.zip") as zf:
        names = [n for n in zf.namelist() if n.endswith(".json")
                 and n != "meta.json"]
        assert len(names) > 10
        rec = json.loads(zf.read(names[0]))
        assert set(rec) >= {"p", "right", "up", "wkt", "confidence",
                            "tesseract_data"}


def test_order_stage(corpus):
    _run_chain(corpus, upto="order")
    out = corpus / "page0001.out"
    order = json.loads((out / "order.json").read_text())
    assert order["version"] == 1
    assert "*" in order["orders"]
    assert len(order["orders"]["*"]) >= 2
    # left column regions come before right column regions
    from origami_tpu.batch.core.io import read_contours_zip
    from origami_tpu.core.segment import PredictorType
    items, _ = read_contours_zip(out / "contours.3.zip",
                                 PredictorType.REGION)
    centers = {"/".join(p): (g.bounds[0] + g.bounds[2]) / 2
               for p, g in items}
    star = [centers[n] for n in order["orders"]["*"] if n in centers]
    if len(star) >= 2:
        # first ordered region is left of the last
        assert star[0] < star[-1]


def test_ocr_and_compose(corpus):
    _run_chain(corpus, upto="compose")
    out = corpus / "page0001.out"
    assert (out / "ocr.zip").exists()
    import zipfile as _zf
    with _zf.ZipFile(out / "ocr.zip") as zf:
        texts = {n: zf.read(n).decode("utf8") for n in zf.namelist()}
    assert len(texts) > 10
    assert all(t.startswith("text for ") for t in texts.values())

    with _zf.ZipFile(out / "compose.zip") as zf:
        page_txt = zf.read("page.txt").decode("utf8")
        page_xml = zf.read("page.xml")
    assert "text for " in page_txt
    assert page_txt.count("\n\n") >= 1     # paragraph separation
    from lxml import etree
    root = etree.fromstring(page_xml)
    assert root.tag.endswith("PcGts")
    text_regions = root.findall(".//{*}TextRegion")
    assert len(text_regions) >= 2
    ro = root.findall(".//{*}RegionRefIndexed")
    assert len(ro) >= 2


def test_utils_and_annotate_stages(corpus):
    _run_chain(corpus, upto="compose")
    out = corpus / "page0001.out"
    opts = dict(lock_strategy="NONE", plain=True)

    # annotate overlays
    from origami_tpu.batch.annotate.contours import (
        AnnotateContoursProcessor)
    AnnotateContoursProcessor(dict(stage="reliable", **opts)) \
        .traverse(corpus)
    assert (out / "annotation.contours.3.jpg").exists()
    from origami_tpu.batch.annotate.flow import AnnotateFlowProcessor
    AnnotateFlowProcessor(opts).traverse(corpus)
    assert (out / "annotation.flow.jpg").exists()
    from origami_tpu.batch.annotate.grid import AnnotateGridProcessor
    AnnotateGridProcessor(opts).traverse(corpus)
    assert (out / "annotation.dewarp.jpg").exists()
    from origami_tpu.batch.annotate.layout import AnnotateLayoutProcessor
    AnnotateLayoutProcessor(opts).traverse(corpus)
    assert (out / "annotation.layout.jpg").exists()
    from origami_tpu.batch.annotate.lines import AnnotateLinesProcessor
    AnnotateLinesProcessor(dict(stage="reliable", **opts)) \
        .traverse(corpus)
    assert (out / "annotation.lines.jpg").exists()

    # signature + thumbnail
    from origami_tpu.batch.utils.signature import SignatureProcessor
    SignatureProcessor(opts).traverse(corpus)
    assert (out / "signature.zip").exists()
    from origami_tpu.batch.utils.thumbnail import ThumbnailProcessor
    ThumbnailProcessor(opts).traverse(corpus)
    assert (out / "thumbnail.jpg").exists()

    # evaluate against a fabricated ground truth (identical text -> 0)
    with zipfile.ZipFile(out / "compose.zip") as zf:
        text = zf.read("page.txt").decode("utf8")
    (corpus / "page0001.gt.txt").write_text(text)
    from origami_tpu.batch.utils.evaluate import EvaluationProcessor
    ev = EvaluationProcessor(opts)
    ev.traverse(corpus)
    assert len(ev._results) == 1
    assert ev._results[0][1] == 0.0    # CER 0 on identical text

    # reset removes chosen artifacts
    from origami_tpu.batch.utils.reset import ResetProcessor
    ResetProcessor(dict(artifacts="ocr", **opts)).traverse(corpus)
    assert not (out / "ocr.zip").exists()


def test_export_stages(corpus, tmp_path):
    _run_chain(corpus, upto="order")
    opts = dict(lock_strategy="NONE", plain=True)
    from origami_tpu.batch.export.lines import LineExportProcessor
    out_dir = tmp_path / "lines_export"
    LineExportProcessor(dict(output=str(out_dir), line_height=32,
                             **opts)).traverse(corpus)
    pngs = list(out_dir.glob("**/*.png"))
    assert len(pngs) > 5
    import PIL.Image
    im = PIL.Image.open(pngs[0])
    assert im.size[1] == 32

    from origami_tpu.batch.export.pagexml import PageXMLExportProcessor
    xml_dir = tmp_path / "xml_export"
    PageXMLExportProcessor(dict(output=str(xml_dir), **opts)) \
        .traverse(corpus)
    xmls = list(xml_dir.glob("*.xml"))
    assert len(xmls) == 1
    from lxml import etree
    root = etree.parse(str(xmls[0])).getroot()
    assert len(root.findall(".//{*}TextLine")) > 5


def test_track_changes(corpus):
    """The golden re-run diffing harness: unchanged artifacts leave
    .checked markers, changed content leaves .changed markers."""
    _run_segment(corpus)
    out = corpus / "page0001.out"
    from origami_tpu.batch.detect.contours import ContoursProcessor
    opts = dict(lock_strategy="NONE", plain=True)
    ContoursProcessor(dict(track_changes="t1", **opts)).traverse(corpus)
    # first run: artifact newly created -> .checked
    assert (out / "contours.0.checked").exists()
    (out / "contours.0.checked").unlink()
    # identical recompute -> no marker, file kept
    ContoursProcessor(dict(track_changes="t2", **opts)).traverse(corpus)
    assert not (out / "contours.0.changed").exists()
    assert (out / "contours.0.zip").exists()


def test_legacy_segment_conversion(corpus):
    import pickle
    import io as _io
    out = corpus / "page0001.out"
    out.mkdir(exist_ok=True)
    labels = np.zeros((30, 20), np.uint8)
    buf = _io.BytesIO()
    np.savez(buf, labels)
    legacy = [("k", ("RegionLabel",
                     {"TEXT": 0, "BACKGROUND": 3}, buf.getvalue()))]
    with open(out / "segmentation.pickle", "wb") as f:
        pickle.dump(legacy, f)
    from origami_tpu.batch.utils.segment import SegmentConverterProcessor
    SegmentConverterProcessor(dict(plain=True)).traverse(corpus)
    from origami_tpu.core.segment import Segmentation
    seg = Segmentation.open(out / "segment.zip")
    assert seg.predictions[0].labels.shape == (30, 20)


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


def test_multiprocess_host_stage(corpus, synthetic_page):
    """The fork-based worker pool with DB locking (host geometry
    stages parallelize across processes like the reference)."""
    import PIL.Image
    # add more pages so both workers get work
    for i in range(2, 5):
        PIL.Image.fromarray(synthetic_page).save(
            corpus / ("page%04d.png" % i))
    _run_segment(corpus)
    from origami_tpu.batch.detect.contours import ContoursProcessor
    ContoursProcessor(dict(lock_strategy="DB", plain=True,
                           processes=2)).traverse(corpus)
    for i in [1] + list(range(2, 5)):
        assert (corpus / ("page%04d.out" % i) /
                "contours.0.zip").exists()
    # lock db exists and is empty of stale locks
    from origami_tpu.batch.core.mutex import DatabaseMutex
    m = DatabaseMutex(corpus / "origami.lock.db")
    assert m.held() == []


def test_page_pipeline_api(synthetic_page):
    """The one-call serving API drives all nine stages in memory."""
    from origami_tpu.pipeline import PagePipeline
    pipe = PagePipeline(segmentation_model="heuristic",
                        ocr_model="FAKE", page_xml=True)
    result = pipe.process(synthetic_page)
    assert "text for " in result.text
    assert result.page_xml is not None
    assert len(result.regions) >= 2
    assert len(result.lines) > 10
    assert len(result.order) >= 2
    from lxml import etree
    root = etree.fromstring(result.page_xml)
    assert root.tag.endswith("PcGts")


def test_contours_export_images(corpus):
    _run_segment(corpus)
    from origami_tpu.batch.detect.contours import ContoursProcessor
    ContoursProcessor(dict(lock_strategy="NONE", plain=True,
                           export_images=True)).traverse(corpus)
    with zipfile.ZipFile(
            corpus / "page0001.out" / "contours.0.zip") as zf:
        pngs = [n for n in zf.namelist()
                if n.startswith("regions/") and n.endswith(".png")]
        assert pngs


def test_foreign_segment_zip_interop(corpus):
    """A segment.zip built by hand exactly per the reference format
    (paletted PNG + class JSON, different canvas size than the page)
    feeds our contours stage — cross-system artifact interop."""
    import io as _io
    out = corpus / "page0001.out"
    out.mkdir(exist_ok=True)
    # label canvas at half the page size (consumers must rescale)
    lab = np.full((300, 200), 3, np.uint8)
    lab[20:120, 20:80] = 0          # TEXT block
    lab[20:260, 100:102] = 1        # V separator (in sep png below)
    sep = np.full((300, 200), 3, np.uint8)
    sep[20:260, 100:102] = 1
    with zipfile.ZipFile(out / "segment.zip", "w") as zf:
        for name, arr, typ, classes in (
                ("regions", lab, "REGION",
                 {"TEXT": 0, "TABULAR": 1, "ILLUSTRATION": 2,
                  "BACKGROUND": 3}),
                ("separators", sep, "SEPARATOR",
                 {"H": 0, "V": 1, "T": 2, "BACKGROUND": 3})):
            im = PIL.Image.fromarray(arr, "P")
            pal = [0] * 768
            pal[:12] = [255, 0, 0, 0, 255, 0, 0, 0, 255, 255, 255, 255]
            im.putpalette(pal)
            with __import__("io").BytesIO() as buf:
                im.save(buf, "png")
                zf.writestr(name + ".png", buf.getvalue())
            zf.writestr(name + ".json", json.dumps(
                dict(type=typ, name=name, classes=classes)))

    from origami_tpu.batch.detect.contours import ContoursProcessor
    ContoursProcessor(dict(lock_strategy="NONE", plain=True)) \
        .traverse(corpus)
    from origami_tpu.batch.core.io import read_contours_zip
    from origami_tpu.core.segment import PredictorType
    items, _ = read_contours_zip(out / "contours.0.zip",
                                 PredictorType.REGION)
    text = [g for parts, g in items if parts[1] == "TEXT"]
    assert len(text) == 1
    # label-space (20..80, 20..120) scaled x2 to the 400x600 page
    minx, miny, maxx, maxy = text[0].bounds
    assert 30 < minx < 50 and 150 < maxx < 170
    assert 30 < miny < 50 and 230 < maxy < 250


def test_page_pipeline_batch(synthetic_page):
    from origami_tpu.pipeline import PagePipeline
    pipe = PagePipeline(segmentation_model="heuristic",
                        ocr_model="FAKE", page_xml=False)
    results = pipe.process_batch(
        [synthetic_page, synthetic_page], names=["a", "b"])
    assert len(results) == 2
    assert results[0].text == results[1].text
    assert "text for " in results[0].text


def test_page_pipeline_overlapped(synthetic_page, rng):
    """overlap mode (device segmentation feeding host stages from a
    thread) produces the same results as the sequential path."""
    from origami_tpu.pipeline import PagePipeline
    pages = [synthetic_page,
             np.clip(synthetic_page.astype(np.int16) + 6,
                     0, 255).astype(np.uint8),
             synthetic_page[::-1].copy(),
             synthetic_page[:, ::-1].copy()]
    pipe = PagePipeline(segmentation_model="heuristic",
                        ocr_model="FAKE", page_xml=False)
    seq = pipe.process_batch(pages, overlap=False)
    par = pipe.process_batch(pages, overlap=True)
    for a, b in zip(seq, par):
        assert a.text == b.text
        assert set(a.lines) == set(b.lines)
        assert a.order == b.order


def test_gutter_is_clear():
    """FixSpillOverH's gutter verifier: accept real column gutters,
    reject aligned inter-word gaps and bridged whitespace (the
    COMPARE_r03 bad_text tail: the periodogram found a 'gutter' at an
    inter-word gap and split every line of the block in half)."""
    from origami_tpu.batch.detect.layout import _gutter_is_clear
    lh = 12
    h, w = 120, 240
    paper = np.ones((h, w), dtype=bool)  # True = paper

    # two text columns with a wide clear gutter at x=120
    two_col = paper.copy()
    for y in range(6, h - 6, lh):
        two_col[y:y + 8, 10:100] = False
        two_col[y:y + 8, 140:230] = False
    assert _gutter_is_clear(two_col, 120, lh)

    # one text block with a narrow aligned inter-word gap at x=120
    word_gap = paper.copy()
    for y in range(6, h - 6, lh):
        word_gap[y:y + 8, 10:113] = False
        word_gap[y:y + 8, 127:230] = False
    assert not _gutter_is_clear(word_gap, 120, lh)

    # wide gutter but half the rows have ink running through it
    bridged = two_col.copy()
    rows = list(range(6, h - 6, lh))
    for y in rows[::2]:
        bridged[y:y + 8, 100:140] = False
    assert not _gutter_is_clear(bridged, 120, lh)

    # degenerate positions never split
    assert not _gutter_is_clear(two_col, 0, lh)
    assert not _gutter_is_clear(two_col, w - 1, lh)


def test_lines_bridge_veto():
    """FixSpillOverH's second line of defense (VERDICT r3 item 5):
    detected baselines whose dewarped x-extent reads straight across a
    candidate whitespace column veto the split — an aligned inter-word
    column bridges on every text row, a genuine gutter on none."""
    from origami_tpu.batch.detect.layout import _lines_bridge
    lh = 12.0
    # two-column page: lines end at 100 / start at 140, candidate 120
    spans_cols = [(10.0, 100.0)] * 6 + [(140.0, 230.0)] * 6
    assert not _lines_bridge(spans_cols, 120.0, margin=lh)
    # one block whose lines all span the candidate
    spans_block = [(10.0, 230.0)] * 8
    assert _lines_bridge(spans_block, 120.0, margin=lh)
    # a single spanning headline over two columns: under the 20%
    # default it must NOT veto
    assert not _lines_bridge(spans_cols + [(10.0, 230.0)], 120.0,
                             margin=lh)
    # lines merely touching the candidate (within margin) don't count
    spans_touch = [(10.0, 125.0)] * 6 + [(115.0, 230.0)] * 6
    assert not _lines_bridge(spans_touch, 120.0, margin=lh)
    assert not _lines_bridge([], 120.0, margin=lh)

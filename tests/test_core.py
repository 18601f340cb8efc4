import json
import zipfile

import numpy as np
import pytest

from origami_tpu import geometry as G
from origami_tpu.core.math import Geometry, Orientation, divide_path
from origami_tpu.core import xycut


def test_geometry_rel():
    g = Geometry(300, 400)
    assert g.diameter == pytest.approx(500.0)
    assert g.rel_length(0.01) == pytest.approx(5.0)
    # (a*d)^2 — reference semantics (origami/core/math.py:90-91);
    # a*d^2 would be 400x larger at a=0.0025 and deletes headlines
    assert g.rel_area(0.01) == pytest.approx(25.0)


def test_divide_path():
    pts = divide_path([(0, 0), (10, 0)], 5)
    assert len(pts) == 6
    np.testing.assert_allclose(pts[:, 0], [0, 2, 4, 6, 8, 10])


def test_xycut_two_columns():
    # two columns of boxes separated by a wide vertical gap
    boxes = []
    for i in range(3):
        boxes.append(("L%d" % i, (0, i * 30, 80, i * 30 + 20)))
        boxes.append(("R%d" % i, (150, i * 30, 230, i * 30 + 20)))
    order = xycut.reading_order(boxes, score="widest_gap")
    assert order == ["L0", "L1", "L2", "R0", "R1", "R2"]


def test_xycut_rows():
    boxes = [("A", (0, 0, 100, 10)), ("B", (0, 30, 100, 40)),
             ("C", (0, 60, 100, 70))]
    order = xycut.reading_order(boxes)
    assert order == ["A", "B", "C"]


def test_xycut_grouped_overlap():
    boxes = [("A", (0, 0, 50, 50)), ("B", (40, 10, 90, 60)),
             ("C", (200, 0, 250, 50))]
    groups = xycut.reading_order(boxes, mode="grouped")
    # A and B overlap -> same group; C separate
    ab = [g for g in groups if "A" in g][0]
    assert "B" in ab
    assert ["C"] in groups


def test_polygon_order():
    polys = [("a", G.box(0, 0, 10, 10)), ("b", G.box(0, 20, 10, 30))]
    assert xycut.polygon_order(polys, fringe=1.0) == ["a", "b"]


def _make_segmentation():
    from origami_tpu.core.segment import Prediction, Segmentation
    sep_labels = np.zeros((60, 40), np.uint8)
    sep_labels[:] = 3
    sep = Prediction("SEPARATOR", "separators", sep_labels,
                     {"H": 0, "V": 1, "T": 2, "BACKGROUND": 3})
    reg_labels = np.full((60, 40), 3, np.uint8)
    reg = Prediction("REGION", "regions", reg_labels,
                     {"TEXT": 0, "TABULAR": 1, "ILLUSTRATION": 2,
                      "BACKGROUND": 3})
    return Segmentation([sep, reg])


def test_segmentation_zip_roundtrip(tmp_path):
    from origami_tpu.core.segment import Segmentation, PredictorType
    seg = _make_segmentation()
    p = tmp_path / "segment.zip"
    seg.save(p)
    seg2 = Segmentation.open(p)
    assert len(seg2.predictions) == 2
    sep = seg2.by_name("separators")
    assert sep.type == PredictorType.SEPARATOR
    assert sep.classes["V"].value == 1
    assert sep.classes["V"].orientation == Orientation.V
    np.testing.assert_array_equal(
        sep.labels, seg.by_name("separators").labels)
    preds = Segmentation.read_predictors(p)
    assert {p["name"] for p in preds} == {"separators", "regions"}


def test_separators_and_obstacle_sampler():
    from origami_tpu.core.separate import Separators, ObstacleSampler
    seg = _make_segmentation()
    seps = {
        ("separators", "V", "0"): G.LineString([(100, 0), (100, 200)]),
        ("separators", "H", "0"): G.LineString([(0, 50), (200, 50)]),
    }
    S = Separators(seg, seps, {("separators", "V", "0"): 2.0})
    assert len(S.geoms) == 2
    assert S.width("separators/V/0") == 2.0
    assert S.check_obstacles((90, 40, 110, 60), ["separators/V"])
    assert not S.check_obstacles((0, 0, 50, 40), ["separators/V"])

    sampler = ObstacleSampler(S)
    from origami_tpu.core.xycut import GapInfo
    # vertical cut along the V separator (below the H sep) -> flow boost
    gap_aligned = GapInfo(0, 95, 105, 100, 200)
    # same-geometry cut far from any separator -> plain whitespace score
    gap_plain = GapInfo(0, 145, 155, 100, 200)
    # horizontal cut crossing the V separator -> obstacle penalty
    gap_crossing = GapInfo(1, 145, 155, 80, 120)
    plain_crossing = GapInfo(1, 145, 155, 280, 320)
    assert sampler(gap_aligned) > sampler(gap_plain) > 0
    assert sampler(gap_crossing) < sampler(plain_crossing)


def test_flow_samples_roundtrip(tmp_path):
    from origami_tpu.core.flow import Samples
    g = Geometry(200, 300)
    s = Samples(g)
    s.extend([(10, 10), (50, 50)], [0.1, -0.1])
    with zipfile.ZipFile(tmp_path / "flow.zip", "w") as zf:
        s.save(zf, "h")
    with zipfile.ZipFile(tmp_path / "flow.zip", "r") as zf:
        s2 = Samples.from_zip(zf, "h")
    assert len(s2) == 2
    assert s2.values[0] == pytest.approx(0.1)
    assert s2.geometry.size == (200, 300)


def test_patch_skew_detects_rotation():
    import cv2
    from origami_tpu.core.flow import patch_skew_samples
    # draw slightly rotated text-like stripes
    img = np.full((256, 256), 255, np.uint8)
    for y in range(20, 240, 16):
        cv2.line(img, (10, y), (246, y + 12), 0, 3)  # slope ~ 0.05
    binar = img > 128
    samples = patch_skew_samples(binar, patch=256, min_ink_frac=0.01)
    assert len(samples) == 1
    (pt, angle), = samples
    assert 0.02 < angle < 0.09


def test_dewarp_identity_grid():
    from origami_tpu.core.dewarp import Grid, GridFactory
    from origami_tpu.core.flow import Samples
    g = Geometry(200, 160)
    empty_h = Samples(g)
    empty_v = Samples(g)
    grid = Grid.create((200, 160), empty_h, empty_v, grid_res=25)
    pts = grid.points("sample")
    # with no samples the field is identity: rows horizontal, cols vertical
    assert pts.shape[2] == 2
    dx = np.diff(pts[..., 0], axis=1)
    dy = np.diff(pts[..., 1], axis=0)
    np.testing.assert_allclose(dx, 25.0, atol=1.5)
    np.testing.assert_allclose(dy, 25.0, atol=1.5)


def test_dewarp_grid_roundtrip(tmp_path):
    from origami_tpu.core.dewarp import Grid
    hv = np.random.default_rng(0).random((6, 5, 2)).astype(np.float32) * 100
    grid = Grid(hv, 25)
    grid.save(tmp_path / "dewarp.zip")
    g2 = Grid.open(tmp_path / "dewarp.zip")
    np.testing.assert_allclose(g2.points("sample"), hv, atol=1e-6)
    assert g2.resolution == 25
    with zipfile.ZipFile(tmp_path / "dewarp.zip") as zf:
        meta = json.loads(zf.read("meta.json"))
        assert meta["version"] == 1 and meta["cell"] == 25
        assert meta["shape"] == [6, 5, 2]


def test_dewarp_inverse_points():
    from origami_tpu.core.dewarp import Grid
    # identity-ish grid: dewarped == warped
    ys, xs = np.mgrid[0:5, 0:4].astype(np.float32)
    hv = np.stack([xs * 25, ys * 25], axis=-1)
    grid = Grid(hv, 25)
    pts = grid.inverse_points([[30, 40], [70, 80]])
    np.testing.assert_allclose(pts, [[30, 40], [70, 80]], atol=1e-4)
    fwd = grid.transformer_points([[30, 40]])
    np.testing.assert_allclose(fwd, [[30, 40]], atol=1.0)


def test_baseline_detection():
    from origami_tpu.core.baselines import detect_baselines
    # three horizontal text lines
    img = np.full((100, 200), 255, np.uint8)
    rng = np.random.default_rng(0)
    for y0 in (10, 40, 70):
        for dy in range(12):
            xs = rng.random(180) < 0.7
            img[y0 + dy, 10:190][xs] = 0
    lines = detect_baselines(img > 128, origin=(5, 7))
    assert len(lines) == 3
    l0 = lines[0]
    # baseline near the bottom of the first band, offset by origin
    assert 15 + 7 <= l0.baseline[0][1] <= 24 + 7
    assert l0.right[0] > 150
    assert not l0.fake
    # empty crop: forced fake line
    fake = detect_baselines(np.ones((50, 80), bool), origin=(0, 0),
                            force_one=True)
    assert len(fake) == 1 and fake[0].fake


def test_skeleton_polyline():
    from origami_tpu.core.polyline import estimate_polyline
    mask = np.zeros((40, 120), np.uint8)
    mask[18:22, 5:115] = 1  # thick horizontal bar
    pl = estimate_polyline(mask, Orientation.H)
    assert pl is not None
    c = pl.np_coords
    assert c[0, 0] < c[-1, 0]           # oriented left->right
    assert abs(c[0, 0] - 5) < 6 and abs(c[-1, 0] - 114) < 6
    assert 2.0 <= pl.width <= 7.0


def test_contours_pipeline():
    from origami_tpu.core import contours as C
    labels = np.full((100, 100), 3, np.uint8)
    labels[10:40, 10:60] = 0      # TEXT region
    labels[50:90, 20:80] = 0      # another
    labels[45:47, 0:100] = 1      # stray TABULAR sliver
    from origami_tpu.core.segment import Classes
    classes = Classes({"TEXT": 0, "TABULAR": 1, "ILLUSTRATION": 2,
                       "BACKGROUND": 3})
    build = C.multi_class_constructor(
        lambda label: C.pipeline(
            C.Contours(), C.Decompose(), C.Simplify(1.0),
            C.FilterByArea(50.0)),
        list(classes))
    result = build(labels)
    text_polys = result[classes["TEXT"]]
    assert len(text_polys) == 2
    assert all(p.area > 1000 for p in text_polys)
    tab = result[classes["TABULAR"]]
    assert len(tab) == 1  # sliver has area 200 > 50


def test_glue_merges_fragments():
    from origami_tpu.core.contours import Glue
    a = G.box(0, 0, 10, 10)
    b = G.box(12, 0, 22, 10)      # 2px gap
    c = G.box(100, 100, 110, 110)
    out = Glue(buffer=3.0)([a, b, c])
    assert len(out) == 2
    areas = sorted(p.area for p in out)
    assert areas[1] > 200  # merged pair


def test_block_and_line(tmp_path):
    from origami_tpu.core.page import Page
    from origami_tpu.core.block import Block, Line, Lines, Regions
    from origami_tpu.batch.core.io import Stage
    img = np.full((100, 200), 220, np.uint8)
    img[40:52, 20:180] = 30
    page = Page(pixels=img)
    poly = G.box(10, 30, 190, 60)
    block = Block(page, poly, Stage.WARPED)
    assert 150 < block.background <= 255
    line = Line(block, p=(20, 52), right=(160, 0), up=(0, -12),
                tesseract_data=dict(baseline=[[20, 50], [180, 50]],
                                    ascent=10, descent=2, height=10))
    strip = line.image(target_height=12, dewarped=False)
    assert strip.shape[0] == 12
    assert strip.mean() < 100  # mostly ink
    # serialization roundtrip via Lines zip
    regions = Regions({("regions", "TEXT", "0"): block})
    lines = Lines({("regions", "TEXT", "0", "0"): line})
    import zipfile as _zf
    with _zf.ZipFile(tmp_path / "lines.0.zip", "w") as zf:
        lines.save(zf)
    lines2 = Lines.open(tmp_path / "lines.0.zip", regions)
    l2 = lines2.by_path[("regions", "TEXT", "0", "0")]
    np.testing.assert_allclose(l2.p, line.p)
    np.testing.assert_allclose(l2.baseline, line.baseline)


def test_lingrid():
    from origami_tpu.core.lingrid import lininterp
    pts = [(0, 0), (10, 0), (0, 10), (10, 10)]
    vals = [0.0, 1.0, 0.0, 1.0]
    f = lininterp(pts, vals, (0, 0, 10, 10))
    out = f([(5, 5), (20, 5)])
    assert out[0] == pytest.approx(0.5, abs=1e-6)
    assert np.isfinite(out[1])  # extrapolation falls back to nearest


def test_border_angle_samples():
    from origami_tpu.core.flow import border_angle_samples
    # page with a slanted left content border
    binar = np.ones((400, 300), dtype=bool)
    for y in range(40, 360):
        x0 = 40 + int(0.1 * (y - 40))   # left edge drifts right
        binar[y, x0:260] = False        # ink region
    samples = border_angle_samples(binar, n_samples=8)
    assert len(samples) >= 8
    left = [phi for (x, y), phi in samples if x < 150]
    assert left
    # left border slope 0.1 -> angle ~ atan2(dy=1, dx=0.1) ~ 1.47 rad
    med = float(np.median(left))
    assert abs(med - np.arctan2(1.0, 0.1)) < 0.08


def test_estimate_skew_sign_and_ties():
    """estimate_skew returns the straightening shear (negated text
    slope); ties after decimation must resolve to zero, not one grid
    step off (regression: horizontal pages came out at -0.01)."""
    import numpy as np
    from origami_tpu.core.baselines import estimate_skew

    rng = np.random.default_rng(1)
    for true_a in (-0.08, 0.0, 0.02, 0.1):
        h, w = 900, 300
        ink = np.zeros((h, w), np.float32)
        for i in range(20):
            y = 30 + i * 42
            ink[y:y + 20, 20:280] = rng.random((20, 260)) < 0.7
        out = np.zeros_like(ink)
        for c in range(w):
            s = int(round(np.tan(true_a) * (c - w / 2)))
            out[:, c] = np.roll(ink[:, c], s)
        est = estimate_skew(out)
        assert abs(est + true_a) <= 0.011, (true_a, est)

    # large horizontal crop (hits the decimation path): exactly zero
    big = np.zeros((2000, 400), np.float32)
    for i in range(38):
        big[40 + i * 50:60 + i * 50, 30:370] = \
            rng.random((20, 340)) < 0.75
    assert estimate_skew(big) == 0.0


def test_headline_region_survives_area_filter():
    """A single-line headline region (~400x40 label px) must survive
    the contours stage's FilterByArea at the reference default
    region_area=0.0025 — regression for the rel_area semantics bug
    that silently dropped 8% of GT lines (headlines)."""
    import numpy as np
    from origami_tpu.core import contours as C
    from origami_tpu.core.math import Geometry

    mask = np.zeros((2432, 1250), bool)
    mask[76:116, 423:826] = True        # the headline
    mask[300:2300, 100:600] = True      # a big column (control)
    g = Geometry(1250, 2432)
    pipe = C.pipeline(C.Contours(), C.Decompose(),
                      C.FilterByArea(g.rel_area(0.0025)))
    polys = pipe(mask)
    assert len(polys) == 2


def test_auto_segmentation_fallback_on_collapse():
    """AutoSegmentationPredictor routes per page: trained output is kept
    when its text regions explain the page's ink, the heuristic takes
    over when the trained prediction collapses (near-empty labels)."""
    from origami_tpu.core.predict import AutoSegmentationPredictor
    from origami_tpu.core.segment import Prediction, Segmentation

    rng = np.random.default_rng(0)
    page = np.full((200, 160), 255, np.uint8)
    # text block: dark speckle rows in the upper half
    page[20:100, 20:140] = rng.choice(
        [0, 255], size=(80, 120), p=[0.4, 0.6]).astype(np.uint8)

    classes = {"TEXT": 0, "TABULAR": 1, "ILLUSTRATION": 2,
               "BACKGROUND": 3}
    sep_classes = {"H": 0, "V": 1, "T": 2, "BACKGROUND": 3}

    def seg_with_text(cover):
        reg = np.full((200, 160), 3, np.uint8)
        if cover:
            reg[10:110, 10:150] = 0
        sep = np.full((200, 160), 3, np.uint8)
        return Segmentation([
            Prediction("REGION", "regions", reg, classes),
            Prediction("SEPARATOR", "separators", sep, sep_classes)])

    class FakeTrained:
        def __init__(self, covers):
            self._covers = covers

        def predict_batch(self, pages):
            return [seg_with_text(c) for c in self._covers]

    class FakeHeuristic:
        def __call__(self, page):
            return seg_with_text(True)

        def predict_batch(self, pages):
            return [self(p) for p in pages]

    # page 0: trained covers the ink -> kept; page 1: collapse -> fallback
    pred = AutoSegmentationPredictor(
        trained=FakeTrained([True, False]), heuristic=FakeHeuristic())
    segs = pred.predict_batch([page, page])
    assert pred.last_modes == ["trained", "heuristic"]
    assert len(segs) == 2
    # the fallback result still carries both predictor rasters
    assert {p.name for p in segs[1].predictions} == \
        {"regions", "separators"}

    # blank page: no ink to explain -> trust the (empty) trained output
    blank = np.full((200, 160), 255, np.uint8)
    pred2 = AutoSegmentationPredictor(
        trained=FakeTrained([False]), heuristic=FakeHeuristic())
    pred2.predict_batch([blank])
    assert pred2.last_modes == ["trained"]


def test_auto_segmentation_sanitizes_unsupported_tabular():
    """TABULAR components without T-separator support reclassify to
    TEXT; components with table-column structure are kept."""
    from origami_tpu.core.predict import AutoSegmentationPredictor
    from origami_tpu.core.segment import Prediction, Segmentation

    reg = np.full((100, 200), 3, np.uint8)
    reg[10:40, 10:90] = 1      # genuine table (gets T dividers)
    reg[60:90, 110:190] = 1    # hallucinated table (no T support)
    sep = np.full((100, 200), 3, np.uint8)
    sep[12:38, 30] = 0  # stray H
    for x in (35, 60):  # column dividers in the genuine table
        sep[10:40, x] = 2
    seg = Segmentation([
        Prediction("REGION", "regions", reg,
                   {"TEXT": 0, "TABULAR": 1, "ILLUSTRATION": 2,
                    "BACKGROUND": 3}),
        Prediction("SEPARATOR", "separators", sep,
                   {"H": 0, "V": 1, "T": 2, "BACKGROUND": 3})])
    changed = AutoSegmentationPredictor.sanitize_tabular(
        seg, min_t_density=0.012, min_area=100)
    r = seg.by_name("regions")
    assert changed == 30 * 80
    assert r.labels[70, 150] == 0          # hallucination -> TEXT
    assert r.labels[20, 20] == 1           # genuine table kept


def test_xycut_touching_bounds_are_not_ambiguity_groups():
    """Items that exactly TOUCH on the sweep axis (a full-width header
    above two columns) are a clean cut, not an overlap: grouped mode
    must not flatten the page into one y-sorted group (the synth0005
    composed-CER 0.71 regression)."""
    from origami_tpu.core import xycut
    boxes = [
        ("head", (0, 0, 100, 10)),     # full width, ends at y=10
        ("left", (0, 10, 45, 100)),    # starts exactly at y=10
        ("right", (55, 10, 100, 100)),
    ]
    groups = xycut.reading_order(boxes, mode="grouped")
    assert groups == [["head"], ["left"], ["right"]]
    # genuine penetration still groups
    boxes2 = [
        ("a", (0, 0, 100, 55)),
        ("b", (0, 45, 100, 100)),      # overlaps a by 10 in y
    ]
    groups2 = xycut.reading_order(boxes2, mode="grouped")
    assert groups2 == [["a", "b"]]

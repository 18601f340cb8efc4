import numpy as np
import pytest

from origami_tpu import geometry as G


def test_polygon_basic():
    p = G.Polygon([(0, 0), (10, 0), (10, 10), (0, 10)])
    assert p.area == pytest.approx(100.0)
    assert p.bounds == (0, 0, 10, 10)
    assert p.length == pytest.approx(40.0)
    c = p.centroid
    assert (c.x, c.y) == (pytest.approx(5.0), pytest.approx(5.0))
    assert not p.is_empty
    assert p.is_valid


def test_polygon_with_hole():
    p = G.Polygon([(0, 0), (10, 0), (10, 10), (0, 10)],
                  [[(4, 4), (6, 4), (6, 6), (4, 6)]])
    assert p.area == pytest.approx(96.0)
    assert not p.contains_points([[5, 5]])[0]
    assert p.contains_points([[1, 1]])[0]


def test_wkt_roundtrip():
    p = G.Polygon([(0, 0), (10.5, 0), (10.5, 10.25), (0, 10.25)])
    s = p.wkt
    assert s.startswith("POLYGON ((")
    q = G.wkt.loads(s)
    assert q.area == pytest.approx(p.area)
    np.testing.assert_allclose(q.np_shell, p.np_shell)

    l = G.LineString([(1, 2), (3, 4.5)])
    l2 = G.wkt.loads(l.wkt)
    np.testing.assert_allclose(l2.np_coords, l.np_coords)

    pt = G.wkt.loads("POINT (3 4)")
    assert (pt.x, pt.y) == (3.0, 4.0)

    mp = G.wkt.loads(
        "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)), "
        "((2 2, 3 2, 3 3, 2 3, 2 2)))")
    assert mp.geom_type == "MultiPolygon"
    assert mp.area == pytest.approx(2.0)

    e = G.wkt.loads("POLYGON EMPTY")
    assert e.is_empty


def test_intersects_contains():
    a = G.box(0, 0, 10, 10)
    b = G.box(5, 5, 15, 15)
    c = G.box(20, 20, 30, 30)
    d = G.box(2, 2, 8, 8)
    assert a.intersects(b)
    assert not a.intersects(c)
    assert a.contains(d)
    assert not a.contains(b)
    assert d.within(a)
    # point cases
    assert a.contains_points([[5, 5], [11, 5]]).tolist() == [True, False]


def test_intersection_union_difference():
    a = G.box(0, 0, 10, 10)
    b = G.box(5, 0, 15, 10)
    inter = a.intersection(b)
    assert inter.area == pytest.approx(50.0, rel=0.05)
    uni = a.union(b)
    assert uni.area == pytest.approx(150.0, rel=0.05)
    diff = a.difference(b)
    assert diff.area == pytest.approx(50.0, rel=0.05)
    # disjoint
    c = G.box(100, 100, 110, 110)
    assert a.intersection(c).is_empty
    assert a.union(c).area == pytest.approx(200.0, rel=0.05)


def test_unary_union():
    boxes = [G.box(i * 5, 0, i * 5 + 7, 10) for i in range(4)]
    u = G.unary_union(boxes)
    # overlapping chain merges to one polygon of width 22
    assert u.geom_type == "Polygon"
    assert u.area == pytest.approx(220.0, rel=0.05)


def test_line_clip():
    poly = G.box(0, 0, 10, 10)
    line = G.LineString([(-5, 5), (15, 5)])
    clipped = line.intersection(poly)
    assert clipped.geom_type == "LineString"
    assert clipped.length == pytest.approx(10.0, abs=1e-6)

    # line crossing a concave poly -> multiple pieces
    poly2 = G.Polygon([(0, 0), (10, 0), (10, 10), (6, 10), (6, 3),
                       (4, 3), (4, 10), (0, 10)])
    clipped2 = G.LineString([(-1, 5), (11, 5)]).intersection(poly2)
    assert clipped2.geom_type == "MultiLineString"
    assert clipped2.length == pytest.approx(8.0, abs=1e-6)


def test_buffer():
    p = G.box(10, 10, 20, 20)
    grown = p.buffer(2)
    assert grown.area > p.area
    assert grown.contains_points([[9, 15]])[0]
    shrunk = p.buffer(-2)
    assert 0 < shrunk.area < p.area
    line = G.LineString([(0, 0), (10, 0)])
    lb = line.buffer(1)
    assert lb.area == pytest.approx(20 + np.pi, rel=0.15)


def test_polyline_buffer_fast():
    # near-straight polyline (the hot separator-obstacle case) takes
    # the exact miter path: area matches square-cap offset exactly
    from origami_tpu.geometry import ops
    line = G.LineString([(0, 0), (100, 0)])
    b = ops.buffer(line, 3.0)
    assert b.geom_type == "Polygon" and b.is_valid
    assert b.area == pytest.approx((100 + 6) * 6, rel=1e-9)
    # every point of the source line is covered
    pts = np.c_[np.linspace(0, 100, 50), np.zeros(50)]
    assert b.contains_points(pts).all()
    # gentle bend: still one valid polygon covering the line
    bend = G.LineString([(0, 0), (100, 2), (200, -1), (300, 0.5)])
    b2 = ops.buffer(bend, 3.0)
    assert b2.geom_type == "Polygon" and b2.is_valid
    # sharp hairpin exceeds the offset regime -> miter path declines,
    # raster fallback still returns a covering polygon
    hairpin = G.LineString([(0, 0), (50, 0), (10, 5)])
    assert ops._polyline_buffer_fast(
        np.array(hairpin.coords, float), 3.0) is None
    b3 = ops.buffer(hairpin, 3.0)
    assert b3.contains_points([[25, 0], [30, 3]]).all()


def test_simplify():
    t = np.linspace(0, 2 * np.pi, 200)
    circle = G.Polygon(np.c_[np.cos(t[:-1]) * 50 + 60, np.sin(t[:-1]) * 50 + 60])
    s = circle.simplify(1.0)
    assert len(s.np_shell) < len(circle.np_shell)
    assert s.area == pytest.approx(circle.area, rel=0.03)


def test_strtree():
    geoms = [G.box(i * 10, 0, i * 10 + 5, 5) for i in range(10)]
    tree = G.STRtree(geoms)
    hits = tree.query(G.box(12, 1, 23, 4))
    assert len(hits) == 2
    hits_exact = tree.query_indices(G.box(12, 1, 23, 4), predicate="intersects")
    assert set(hits_exact) == {1, 2}
    nearest = tree.nearest(G.Point(33, 2))
    assert nearest.bounds[0] == 30


def test_interval_tree():
    t = G.IntervalTree([(0, 5, "a"), (3, 8, "b"), (10, 12, "c")])
    assert len(t.overlap(4, 6)) == 2
    assert len(t.at(11)) == 1
    assert t.coverage(0, 12) == pytest.approx(10.0)


def test_affinity():
    p = G.box(0, 0, 10, 10)
    r = G.affinity.rotate(p, 90, origin=(0, 0))
    minx, miny, maxx, maxy = r.bounds
    assert minx == pytest.approx(-10)
    assert maxy == pytest.approx(10, abs=1e-9)
    s = G.affinity.scale(p, 2, 3, origin=(0, 0))
    assert s.area == pytest.approx(600)
    t = G.affinity.translate(p, 5, 5)
    assert t.bounds == (5, 5, 15, 15)


def test_transform():
    p = G.box(0, 0, 10, 10)
    q = G.transform(lambda x, y: (x * 2, y), p)
    assert q.area == pytest.approx(200)


def test_representative_point():
    # C-shaped polygon whose centroid falls outside
    p = G.Polygon([(0, 0), (10, 0), (10, 2), (2, 2), (2, 8),
                   (10, 8), (10, 10), (0, 10)])
    rp = p.representative_point()
    assert p.contains_points([[rp.x, rp.y]])[0]


def test_minimum_rotated_rectangle():
    p = G.Polygon([(0, 0), (10, 10), (8, 12), (-2, 2)])
    r = p.minimum_rotated_rectangle
    assert r.area == pytest.approx(p.area, rel=0.2)


def test_distance():
    a = G.box(0, 0, 10, 10)
    b = G.box(13, 0, 20, 10)
    assert a.distance(b) == pytest.approx(3.0)
    assert a.distance(G.Point(5, 5)) == 0.0
    assert a.distance(G.Point(14, 5)) == pytest.approx(4.0)


def test_make_valid_bowtie():
    # self-intersecting bowtie gets fixed into valid polygon(s)
    bow = G.Polygon([(0, 0), (10, 10), (10, 0), (0, 10)])
    assert not bow.is_valid
    fixed = G.make_valid(bow)
    assert not fixed.is_empty
    assert fixed.area == pytest.approx(50, rel=0.1)


def test_degenerate_inputs():
    """Degenerate geometries must not crash overlay/predicate code —
    the layout stage feeds sliver contours through these paths."""
    from origami_tpu.geometry import (
        LineString, MultiPolygon, Point, Polygon)

    # collinear "polygon" (zero area)
    sliver = Polygon([(0, 0), (10, 0), (5, 0)])
    assert sliver.area == 0
    box = Polygon([(0, -1), (10, -1), (10, 1), (0, 1)])
    inter = sliver.intersection(box)
    assert inter.area == 0

    # zero-length linestring
    dot = LineString([(3, 3), (3, 3)])
    assert dot.length == 0
    assert box.intersection(dot) is not None

    # empty result propagation
    far = Polygon([(100, 100), (110, 100), (110, 110), (100, 110)])
    empty = box.intersection(far)
    assert empty.is_empty
    assert empty.area == 0
    assert not empty.intersects(box)
    assert empty.union(box).area == pytest.approx(box.area, rel=1e-6)

    # point predicates on boundary-ish coordinates
    assert box.contains(Point(5, 0))
    assert not box.contains(Point(50, 0))

    # buffering a degenerate geometry still yields usable area
    grown = sliver.buffer(1.0)
    assert grown.area > 0

    mp = MultiPolygon([box, far])
    assert mp.area == pytest.approx(box.area + far.area, rel=1e-6)


def test_tiny_and_single_point_geoms():
    from origami_tpu.geometry import LineString, Polygon

    # sub-pixel polygon survives the raster overlay path; raster
    # booleans discretize at union-bounds scale, so only ask for the
    # right order of magnitude here (real inputs are page-pixel scale)
    tiny = Polygon([(0, 0), (0.3, 0), (0.3, 0.3), (0, 0.3)])
    big = Polygon([(-1, -1), (2, -1), (2, 2), (-1, 2)])
    inter = tiny.intersection(big)
    assert inter.area == pytest.approx(tiny.area, rel=0.5)

    # single-segment line clipping at exact corner
    line = LineString([(0, 0), (2, 2)])
    clipped = big.intersection(line)
    assert clipped.length == pytest.approx(line.length, rel=1e-6)


def test_convex_clip_exact():
    """Convex x convex intersections take the exact Sutherland-Hodgman
    path; verify against Monte Carlo ground truth (the raster fallback
    overestimates by its half-pixel outward offset)."""
    rng = np.random.default_rng(7)
    tested = 0
    for _ in range(40):
        a = G.MultiPoint(rng.random((6, 2)) * 100).convex_hull
        b = G.MultiPoint(rng.random((6, 2)) * 100).convex_hull
        if a.geom_type != "Polygon" or b.geom_type != "Polygon":
            continue
        inter = a.intersection(b)
        area = 0.0 if inter.is_empty else inter.area
        pts = rng.random((120000, 2)) * 100
        mc = (a.contains_points(pts) & b.contains_points(pts)).mean() * 1e4
        assert area == pytest.approx(mc, abs=max(0.02 * mc, 2.0))
        if not inter.is_empty:
            # result is itself convex and inside both inputs
            assert inter.area <= min(a.area, b.area) + 1e-6
            tested += 1
    assert tested > 20


def test_convex_clip_disjoint_and_contained():
    a = G.box(0, 0, 10, 10)
    assert a.intersection(G.box(20, 20, 30, 30)).is_empty
    inner = G.box(2, 2, 5, 5)
    r = a.intersection(inner)
    assert r.area == pytest.approx(9.0, abs=1e-9)
    # shared edge only -> empty or zero area
    edge = G.box(10, 0, 20, 10)
    r2 = a.intersection(edge)
    assert r2.is_empty or r2.area < 1e-6


def test_union_hole_does_not_erase_other_polygon():
    # a holed polygon unioned with a solid one covering the hole: the
    # hole ring must not punch through the solid polygon's area
    from origami_tpu.geometry.raster import raster_union_all
    holed = G.Polygon(
        [(0, 0), (40, 0), (40, 40), (0, 40)],
        [[(10, 10), (30, 10), (30, 30), (10, 30)]])
    solid = G.box(5, 5, 35, 35)
    for order in ([solid, holed], [holed, solid]):
        u = raster_union_all(order)
        assert u.area == pytest.approx(1600.0, rel=0.02)
        assert u.contains_points(np.array([[20.0, 20.0]]))[0]


def test_point_to_line_distance_regression():
    # a degenerate (point) "segment" used to register as collinear with
    # ANY segment it projected onto, zeroing line<->point distances
    l = G.LineString([(0, 0), (10, 0)])
    assert l.distance(G.Point(1.0, 2.0)) == pytest.approx(2.0)
    assert l.distance(G.Point(5.0, 0.0)) == pytest.approx(0.0)
    assert l.distance(G.Point(12.0, 0.0)) == pytest.approx(2.0)
    assert not l.intersects(G.Point(3.0, 0.5))
    assert l.intersects(G.Point(3.0, 0.0))
    box = G.box(0, 0, 4, 4)
    assert box.distance(G.Point(7, 0)) == pytest.approx(3.0)


def _poly_area(g):
    return 0.0 if g.is_empty else g.area


def test_exact_boolean_basics():
    A = G.box(0, 0, 10, 10)
    B = G.box(5, 5, 15, 15)
    assert A.intersection(B).area == pytest.approx(25.0, abs=1e-9)
    assert A.union(B).area == pytest.approx(175.0, abs=1e-9)
    assert A.difference(B).area == pytest.approx(75.0, abs=1e-9)
    # holes appear exactly
    E = G.box(2, 2, 8, 8)
    d = A.difference(E)
    assert d.area == pytest.approx(64.0, abs=1e-9)
    assert d.geom_type == "Polygon" and len(d.np_holes) == 1
    # shared edges: no sliver, no double counting
    D = G.box(10, 0, 20, 10)
    assert A.intersection(D).area == pytest.approx(0.0, abs=1e-9)
    assert A.union(D).area == pytest.approx(200.0, abs=1e-9)


def test_exact_boolean_box_torture():
    rng = np.random.default_rng(5)
    for _ in range(80):
        x0, y0 = rng.integers(0, 6, 2)
        w, h = rng.integers(1, 6, 2)
        X0, Y0 = rng.integers(0, 6, 2)
        W, H = rng.integers(1, 6, 2)
        A = G.box(x0, y0, x0 + w, y0 + h)
        B = G.box(X0, Y0, X0 + W, Y0 + H)
        ia = max(0, min(x0 + w, X0 + W) - max(x0, X0)) \
            * max(0, min(y0 + h, Y0 + H) - max(y0, Y0))
        assert _poly_area(A.intersection(B)) == pytest.approx(
            float(ia), abs=1e-9)
        assert _poly_area(A.union(B)) == pytest.approx(
            float(w * h + W * H - ia), abs=1e-9)
        assert _poly_area(A.difference(B)) == pytest.approx(
            float(w * h - ia), abs=1e-9)


def test_exact_boolean_concave_invariants():
    def star(cx, cy, r1, r2, k, rng):
        # distinct sorted angles with a minimum gap -> simple polygon
        angles = np.sort(rng.random(2 * k)) * 2 * np.pi
        while np.min(np.diff(angles)) < 0.05:
            angles = np.sort(rng.random(2 * k)) * 2 * np.pi
        rs = np.where(np.arange(2 * k) % 2 == 0, r2, r1)
        return G.Polygon(np.stack(
            [cx + rs * np.cos(angles), cy + rs * np.sin(angles)], 1))

    rng = np.random.default_rng(11)
    for _ in range(10):
        A = star(45, 45, 12, 30, 5, rng)
        B = star(55, 50, 10, 28, 6, rng)
        i = _poly_area(A.intersection(B))
        u = _poly_area(A.union(B))
        d = _poly_area(A.difference(B))
        assert i + d == pytest.approx(A.area, abs=1e-6)
        assert u == pytest.approx(A.area + B.area - i, abs=1e-6)


def test_exact_nary_union():
    from origami_tpu.geometry import unary_union
    parts = [G.box(0, 0, 10, 10), G.box(5, 5, 15, 15),
             G.box(8, 0, 12, 6), G.box(30, 30, 40, 40)]
    u = unary_union(parts)
    rng = np.random.default_rng(0)
    pts = rng.random((200000, 2)) * 50
    cov = np.zeros(len(pts), bool)
    for p in parts:
        cov |= p.contains_points(pts)
    assert u.area == pytest.approx(cov.mean() * 2500, abs=3.0)
    assert u.geom_type == "MultiPolygon" and len(u.geoms) == 2
    # union of touching boxes dissolves the shared edge exactly
    u2 = unary_union([G.box(0, 0, 5, 10), G.box(5, 0, 10, 10)])
    assert u2.area == pytest.approx(100.0, abs=1e-9)

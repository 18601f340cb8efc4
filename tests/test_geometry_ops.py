import math

import numpy as np
import pytest

from origami_tpu import geometry as G


def test_deskewer():
    from origami_tpu.batch.core.deskew import Deskewer, weighted_median
    assert weighted_median([1, 2, 3], [1, 1, 1]) == 2

    class FakeLine:
        def __init__(self, angle, length):
            self.angle = angle
            self.length = length

    lines = [FakeLine(0.05, 100), FakeLine(0.05, 100),
             FakeLine(0.04, 50), FakeLine(1.0, 10)]  # outlier > 15 deg
    d = Deskewer(lines)
    assert 0.04 <= d.angle <= 0.05

    img = np.full((60, 100), 255, np.uint8)
    img[30, :] = 0
    out = d.image(img)
    assert out.shape == img.shape
    # the rotated dark line is no longer exactly horizontal at row 30
    assert (out[30] > 100).any()


def test_squeeze_split():
    from origami_tpu.core.geometry_ops import squeeze_split
    # dumbbell: two 40x40 squares joined by a 4px-wide neck
    a = G.box(0, 0, 40, 40)
    b = G.box(70, 0, 110, 40)
    neck = G.box(38, 18, 72, 22)
    dumbbell = G.unary_union([a, b, neck])
    parts = squeeze_split(dumbbell)
    assert len(parts) == 2
    areas = sorted(p.area for p in parts)
    assert areas[0] > 1000
    # a plain square must NOT split
    assert len(squeeze_split(G.box(0, 0, 50, 50))) == 1


def test_largest_inscribed_rect():
    from origami_tpu.core.geometry_ops import largest_inscribed_rect
    # L-shape: the biggest rect is one of the arms
    poly = G.Polygon([(0, 0), (100, 0), (100, 30), (30, 30),
                      (30, 100), (0, 100)])
    rect = largest_inscribed_rect(poly)
    assert rect.area > 1800
    inter = rect.intersection(poly)
    assert inter.area > 0.9 * rect.area  # essentially inside


def test_mask_extract():
    from origami_tpu.core.mask import Mask
    img = np.arange(100, dtype=np.uint8).reshape(10, 10)
    tri = G.Polygon([(1, 1), (8, 1), (1, 8)])
    m = Mask(tri)
    crop, origin = m.extract_image(img, background=0)
    assert origin == (1, 1)
    assert crop[0, 0] == img[1, 1]        # inside
    assert crop[-1, -1] == 0              # outside -> background


def test_interiors_overlap_predicate():
    from origami_tpu import geometry as G
    from origami_tpu.geometry.ops import interiors_overlap
    box = lambda x0, y0, x1, y1: G.box(x0, y0, x1, y1)
    a = box(0, 0, 10, 10)
    assert interiors_overlap(a, box(5, 5, 15, 15))        # proper
    assert not interiors_overlap(a, box(10, 0, 20, 10))   # edge touch
    assert not interiors_overlap(a, box(10, 10, 20, 20))  # corner touch
    assert not interiors_overlap(a, box(20, 20, 30, 30))  # disjoint
    assert interiors_overlap(a, box(2, 2, 8, 8))          # containment
    # plus-sign: transversal crossing with no vertex inside either
    horiz = box(-5, 4, 15, 6)
    assert interiors_overlap(a, horiz)
    # concave subject overlapping only in one arm
    concave = G.Polygon([(0, 0), (30, 0), (30, 30), (20, 30),
                         (20, 10), (10, 10), (10, 30), (0, 30)])
    assert interiors_overlap(concave, box(22, 20, 28, 40))
    assert not interiors_overlap(concave, box(12, 20, 18, 30))  # notch

"""origami_tpu.geometry — self-contained host geometry library.

A shapely-free implementation of the vector-geometry capability the pipeline
needs: geometry value types, WKT serialization (the artifact contract),
spatial indexing, affine transforms, polyline clipping, and raster-backed
areal booleans. See `poly.py` for the design notes.

Usage mirrors shapely where practical::

    from origami_tpu import geometry as G
    p = G.Polygon([(0, 0), (10, 0), (10, 10), (0, 10)])
    q = G.wkt.loads("POLYGON ((5 5, 15 5, 15 15, 5 15, 5 5))")
    inter = p.intersection(q)
    tree = G.STRtree([p, q])
"""

from .poly import (
    Geometry, Point, MultiPoint, LineString, MultiLineString, LinearRing,
    Polygon, MultiPolygon, GeometryCollection, box, GEOMETRY_EMPTY,
)
from .ops import (
    unary_union, transform, collect, clip_line_to_polygon, make_valid,
    scale_geometry,
)
from .strtree import STRtree, IntervalTree
from . import wkt
from . import affinity
from . import raster
from . import ops

__all__ = [
    "Geometry", "Point", "MultiPoint", "LineString", "MultiLineString",
    "LinearRing", "Polygon", "MultiPolygon", "GeometryCollection", "box",
    "GEOMETRY_EMPTY", "unary_union", "transform", "collect",
    "clip_line_to_polygon", "make_valid", "scale_geometry",
    "STRtree", "IntervalTree", "wkt", "affinity", "raster", "ops",
]

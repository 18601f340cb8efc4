"""PAGE 2019-07-15 XML writer.

Counterpart of origami/pagexml/pagexml.py: builds Metadata/Page/
TextRegion/TableRegion/GraphicRegion/TextLine/Coords/TextEquiv/
ReadingOrder documents. Validation is structural (required elements,
attribute formats, coordinate sanity) rather than via the PRImA XSD file.
"""

from __future__ import annotations

import datetime

import numpy as np
from lxml import etree

NS = "http://schema.primaresearch.org/PAGE/gts/pagecontent/2019-07-15"
XSI = "http://www.w3.org/2001/XMLSchema-instance"
SCHEMA_LOC = ("%s http://schema.primaresearch.org/PAGE/gts/pagecontent/"
              "2019-07-15/pagecontent.xsd") % NS


def _coords_str(coords):
    pts = []
    for x, y in np.asarray(coords, dtype=np.float64).reshape(-1, 2):
        pts.append("%d,%d" % (max(0, round(x)), max(0, round(y))))
    return " ".join(pts)


class _Region:
    def __init__(self, element):
        self._e = element

    def append_coords(self, coords):
        c = etree.SubElement(self._e, "Coords")
        c.set("points", _coords_str(coords))

    def append_text_equiv(self, text, confidence=None):
        te = etree.SubElement(self._e, "TextEquiv")
        if confidence is not None:
            te.set("conf", "%.2f" % confidence)
        u = etree.SubElement(te, "Unicode")
        u.text = text


class TextRegion(_Region):
    def append_text_line(self, line_id=None):
        tl = etree.SubElement(self._e, "TextLine")
        if line_id:
            tl.set("id", line_id)
        return TextLine(tl)


class TextLine(_Region):
    def append_baseline(self, coords):
        b = etree.SubElement(self._e, "Baseline")
        b.set("points", _coords_str(coords))


class TableCell(_Region):
    pass


class TableRegionElement(_Region):
    def append_table_cell(self, row, col, cell_id=None):
        tc = etree.SubElement(self._e, "TableCell")
        if cell_id:
            tc.set("id", cell_id)
        tc.set("row", str(row))
        tc.set("col", str(col))
        return TableCell(tc)


class Page:
    """One PAGE document for one page image."""

    def __init__(self, filename, size):
        self._root = etree.Element(
            "{%s}PcGts" % NS,
            nsmap={None: NS, "xsi": XSI})
        self._root.set("{%s}schemaLocation" % XSI, SCHEMA_LOC)

        meta = etree.SubElement(self._root, "Metadata")
        etree.SubElement(meta, "Creator").text = "origami_tpu"
        now = datetime.datetime.now(
            datetime.timezone.utc).isoformat()
        etree.SubElement(meta, "Created").text = now
        etree.SubElement(meta, "LastChange").text = now

        self._page = etree.SubElement(self._root, "Page")
        self._page.set("imageFilename", str(filename))
        self._page.set("imageWidth", str(int(size[0])))
        self._page.set("imageHeight", str(int(size[1])))
        self._reading_order = None

    def append_reading_order(self, ordered_ids):
        ro = etree.SubElement(self._page, "ReadingOrder")
        og = etree.SubElement(ro, "OrderedGroup")
        og.set("id", "ro_1")
        for i, rid in enumerate(ordered_ids):
            item = etree.SubElement(og, "RegionRefIndexed")
            item.set("index", str(i))
            item.set("regionRef", rid)
        # move ReadingOrder to the front (schema requires it before
        # regions)
        self._page.insert(0, ro)

    def append_region(self, kind, region_id, region_type=None):
        e = etree.SubElement(self._page, kind)
        e.set("id", region_id)
        if region_type and kind == "TextRegion":
            e.set("type", region_type)
        if kind == "TextRegion":
            return TextRegion(e)
        if kind == "TableRegion":
            return TableRegionElement(e)
        return _Region(e)

    def validate(self):
        """Structural sanity checks; raises ValueError on problems."""
        ids = set()
        for e in self._page.iter():
            rid = e.get("id")
            if rid is not None:
                if rid in ids:
                    raise ValueError("duplicate id %s" % rid)
                ids.add(rid)
        for ref in self._page.iter("RegionRefIndexed"):
            if ref.get("regionRef") not in ids:
                raise ValueError(
                    "dangling regionRef %s" % ref.get("regionRef"))
        for c in self._page.iter("Coords"):
            pts = c.get("points", "")
            if len(pts.split()) < 3:
                raise ValueError("degenerate Coords %r" % pts)
        return True

    def tostring(self):
        return etree.tostring(
            self._root, pretty_print=True, xml_declaration=True,
            encoding="UTF-8")

    def write(self, file_or_path, validate=True, overwrite=False):
        if validate:
            self.validate()
        data = self.tostring()
        if hasattr(file_or_path, "write"):
            file_or_path.write(data)
        else:
            with open(file_or_path, "wb") as f:
                f.write(data)

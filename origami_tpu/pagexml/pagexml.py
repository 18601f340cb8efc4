"""PAGE 2019-07-15 XML writer.

Counterpart of origami/pagexml/pagexml.py: builds Metadata/Page/
TextRegion/TableRegion/GraphicRegion/TextLine/Coords/TextEquiv/
ReadingOrder documents. Every write validates twice: fast structural
checks (unique NCName ids, resolvable reading-order refs, sane Coords),
then against the vendored PRImA pagecontent.xsd — the same guarantee
the reference gives (origami/pagexml/pagexml.py:71-90).
"""

from __future__ import annotations

import datetime
from pathlib import Path

import numpy as np
from lxml import etree

NS = "http://schema.primaresearch.org/PAGE/gts/pagecontent/2019-07-15"
XSI = "http://www.w3.org/2001/XMLSchema-instance"
SCHEMA_LOC = ("%s http://schema.primaresearch.org/PAGE/gts/pagecontent/"
              "2019-07-15/pagecontent.xsd") % NS

_XSD_PATH = Path(__file__).parent / "pagecontent.xsd"
_xsd_cache = None


def xml_schema():
    """The vendored PAGE content schema, compiled once per process."""
    global _xsd_cache
    if _xsd_cache is None:
        _xsd_cache = etree.XMLSchema(etree.parse(str(_XSD_PATH)))
    return _xsd_cache


def _sub(parent, tag):
    """Child element in the PAGE namespace (serialized prefix-free via
    the root's default nsmap)."""
    return etree.SubElement(parent, "{%s}%s" % (NS, tag))


def _coords_str(coords):
    pts = []
    for x, y in np.asarray(coords, dtype=np.float64).reshape(-1, 2):
        pts.append("%d,%d" % (max(0, round(x)), max(0, round(y))))
    return " ".join(pts)


class _Region:
    def __init__(self, element):
        self._e = element

    def append_coords(self, coords):
        c = _sub(self._e, "Coords")
        c.set("points", _coords_str(coords))

    def append_text_equiv(self, text, confidence=None):
        te = _sub(self._e, "TextEquiv")
        if confidence is not None:
            te.set("conf", "%.2f" % confidence)
        u = _sub(te, "Unicode")
        u.text = text


class TextRegion(_Region):
    def append_text_line(self, line_id=None):
        tl = _sub(self._e, "TextLine")
        if line_id:
            tl.set("id", line_id)
        return TextLine(tl)


class TextLine(_Region):
    def append_baseline(self, coords):
        b = _sub(self._e, "Baseline")
        b.set("points", _coords_str(coords))


class TableCell(TextRegion):
    """A table cell: PAGE 2019-07-15 has no TableCell element — cells
    are TextRegions nested in the TableRegion, carrying a
    Roles/TableCellRole with the grid position."""

    def __init__(self, element, row, col, row_span=None, col_span=None):
        super().__init__(element)
        self._role = (row, col, row_span, col_span)

    def append_coords(self, coords):
        # RegionType orders Roles right after Coords
        super().append_coords(coords)
        row, col, row_span, col_span = self._role
        roles = _sub(self._e, "Roles")
        role = _sub(roles, "TableCellRole")
        role.set("rowIndex", str(int(row)))
        role.set("columnIndex", str(int(col)))
        if row_span is not None:
            role.set("rowSpan", str(int(row_span)))
        if col_span is not None:
            role.set("colSpan", str(int(col_span)))


class TableRegionElement(_Region):
    def append_table_cell(self, row, col, cell_id=None, row_span=None,
                          col_span=None):
        tc = _sub(self._e, "TextRegion")
        if cell_id:
            tc.set("id", cell_id)
        return TableCell(tc, row, col, row_span, col_span)


class Page:
    """One PAGE document for one page image."""

    def __init__(self, filename, size):
        self._root = etree.Element(
            "{%s}PcGts" % NS,
            nsmap={None: NS, "xsi": XSI})
        self._root.set("{%s}schemaLocation" % XSI, SCHEMA_LOC)

        meta = _sub(self._root, "Metadata")
        _sub(meta, "Creator").text = "origami_tpu"
        now = datetime.datetime.now(
            datetime.timezone.utc).isoformat()
        _sub(meta, "Created").text = now
        _sub(meta, "LastChange").text = now

        self._page = _sub(self._root, "Page")
        self._page.set("imageFilename", str(filename))
        self._page.set("imageWidth", str(int(size[0])))
        self._page.set("imageHeight", str(int(size[1])))
        self._reading_order = None

    def append_reading_order(self, ordered_ids):
        ro = _sub(self._page, "ReadingOrder")
        og = _sub(ro, "OrderedGroup")
        og.set("id", "ro_1")
        for i, rid in enumerate(ordered_ids):
            item = _sub(og, "RegionRefIndexed")
            item.set("index", str(i))
            item.set("regionRef", rid)
        # move ReadingOrder to the front (schema requires it before
        # regions)
        self._page.insert(0, ro)

    def append_region(self, kind, region_id, region_type=None):
        e = _sub(self._page, kind)
        e.set("id", region_id)
        if region_type and kind == "TextRegion":
            e.set("type", region_type)
        if kind == "TextRegion":
            return TextRegion(e)
        if kind == "TableRegion":
            return TableRegionElement(e)
        return _Region(e)

    def validate(self, xsd=True):
        """Structural sanity checks, then (xsd=True) full validation
        against the vendored PRImA schema; raises ValueError."""
        ids = set()
        for e in self._page.iter():
            rid = e.get("id")
            if rid is not None:
                if rid in ids:
                    raise ValueError("duplicate id %s" % rid)
                ids.add(rid)
        for ref in self._page.iter("{%s}RegionRefIndexed" % NS):
            if ref.get("regionRef") not in ids:
                raise ValueError(
                    "dangling regionRef %s" % ref.get("regionRef"))
        for c in self._page.iter("{%s}Coords" % NS):
            pts = c.get("points", "")
            if len(pts.split()) < 3:
                raise ValueError("degenerate Coords %r" % pts)
        if xsd:
            schema = xml_schema()
            if not schema.validate(self._root):
                raise ValueError(
                    "Page-XML schema validation failed:\n%s"
                    % "\n".join(str(e) for e in schema.error_log))
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

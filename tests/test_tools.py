"""Tests for tools, utils stages, harmonization, evaluate metrics."""

import json
import zipfile
from pathlib import Path

import numpy as np
import pytest


def test_harmonize_default_schema_selftests():
    from origami_tpu.tool.harmonize import Schema
    schema = Schema.load("default")
    assert schema.run_tests(verbose=False)


def test_harmonize_bbz_schema_selftests():
    from origami_tpu.tool.harmonize import Schema
    schema = Schema.load("bbz")
    assert schema.run_tests(verbose=False)


def test_harmonize_alphabet_check():
    from origami_tpu.tool.harmonize import Schema, IllegalCharacter
    schema = Schema({
        "channels": {"c": {"transform": "t", "alphabet": "abc ",
                           "tests": []}},
        "transforms": {"t": [("str", "x", "a")]},
        "tests": {}})
    assert schema.channels["c"].transform("xbc") == "abc"
    with pytest.raises(IllegalCharacter):
        schema.channels["c"].transform("abz")


def test_annotation_db(tmp_path):
    from origami_tpu.tool.lineload import AnnotationDB
    db = AnnotationDB(tmp_path / "annotations.db")
    db.add_line("p1.png", "regions/TEXT/0/0")
    db.add_line("p1.png", "regions/TEXT/0/1", annotation="hello",
                author="me")
    assert len(db) == 2
    db.update_annotation("p1.png", "regions/TEXT/0/0", "world")
    recs = db.all_lines(annotated_only=True)
    assert len(recs) == 2
    db.remove_line("p1.png", "regions/TEXT/0/1")
    assert len(db) == 1
    db.set_split("p1.png", "regions/TEXT/0/0", 1, 0)
    assert db.all_lines()[0]["training"] == 1


def test_cer_wer():
    from origami_tpu.batch.utils.evaluate import cer, wer, levenshtein
    assert levenshtein("kitten", "sitting") == 3
    assert cer("abcd", "abcd") == 0.0
    assert cer("abcd", "abce") == pytest.approx(0.25)
    assert wer("the quick fox", "the slow fox") == pytest.approx(1 / 3)
    assert cer("", "") == 0.0


def test_optimal_split():
    from origami_tpu.tool.split import optimal_split, line_signature
    rng = np.random.default_rng(0)
    # two visually distinct line populations
    sigs = []
    names = []
    for i in range(40):
        base = np.zeros((8, 64)) if i % 2 == 0 else np.ones((8, 64)) * 0.5
        strip = (base + rng.random((8, 64)) * 0.1) * 255
        sigs.append(line_signature(strip))
        names.append("line%d" % i)
    train, valid = optimal_split(names, sigs, valid_ratio=0.25)
    assert len(train) + len(valid) == 40
    assert 4 <= len(valid) <= 20


def test_table_region_combinator():
    from origami_tpu.batch.core.utils import TableRegionCombinator
    paths = [("regions", "TABULAR", "5.1.1.1"),
             ("regions", "TABULAR", "5.2.1.1"),
             ("regions", "TEXT", "3")]
    c = TableRegionCombinator(paths)
    base = ("regions", "TABULAR", "5")
    assert set(c.mapping[base]) == set(paths[:2])
    assert c.mapping[("regions", "TEXT", "3")] == [paths[2]]
    assert c.combined_path(paths[0]) == base


def test_line_rewriter():
    import types
    import numpy as np
    from origami_tpu.batch.core.lines import LineRewriter
    tables = dict(columns={"regions/TABULAR/5.1.1.1": [100.0, 200.0]})
    rw = LineRewriter(tables)
    line = types.SimpleNamespace(_up=np.array([0.0, 25.0]))
    lines = {("regions", "TABULAR", "5.1.1.1", "0"): line}
    parts = rw(lines)
    # 2 columns -> 3 cells, named block.division.line.column
    assert len(parts) == 3
    paths = [p for p, _, _ in parts]
    assert paths[0] == ("regions", "TABULAR", "5.1.1.1", "0")
    assert paths[1] == ("regions", "TABULAR", "5.1.1.2", "0")
    assert paths[2] == ("regions", "TABULAR", "5.1.1.3", "0")
    # interior edges are inset by 0.12 * line height (min 2, max 6 px)
    # so the divider stroke itself stays out of the cell strip
    inset = 3.0
    cols = [c for _, _, c in parts]
    assert cols[0] == (None, 100.0 - inset)
    assert cols[1] == (100.0 + inset, 200.0 - inset)
    assert cols[2] == (200.0 + inset, None)
    # degenerate (very narrow) cells keep their original edges
    tables2 = dict(columns={"regions/TABULAR/5.1.1.1": [100.0, 104.0]})
    parts2 = LineRewriter(tables2)(lines)
    assert [c for _, _, c in parts2][1] == (100.0, 104.0)


def test_concave_hull():
    from origami_tpu.core.hull import concave_hull
    # C-shaped point cloud with a wide open notch: the concave hull
    # should dig into it (narrower than edge_len/concavity stays sealed,
    # like the original concaveman criterion)
    pts = []
    for x in np.linspace(0, 10, 30):
        for y in np.linspace(0, 10, 30):
            if not (x > 4 and 2 < y < 8):
                pts.append((x, y))
    hull = concave_hull(np.array(pts), concavity=1.0, length_threshold=0.5)
    from origami_tpu import geometry as G
    poly = G.Polygon(hull)
    full = 100.0
    assert poly.area < 0.9 * full  # dug into the notch


def test_kmeans():
    from origami_tpu.tool.split import kmeans
    rng = np.random.default_rng(0)
    a = rng.normal(0, 0.1, (20, 2))
    b = rng.normal(5, 0.1, (20, 2))
    pts = np.vstack([a, b])
    assign, centers = kmeans(pts, 2)
    assert len(set(assign[:20])) == 1
    assert len(set(assign[20:])) == 1
    assert assign[0] != assign[20]


def test_merge_dbs(tmp_path):
    from origami_tpu.tool.lineload import AnnotationDB
    from origami_tpu.tool.merge import merge_dbs
    a = AnnotationDB(tmp_path / "a.db")
    b = AnnotationDB(tmp_path / "b.db")
    a.add_line("p1", "l1", "old")
    b.add_line("p1", "l1", "new")
    b.add_line("p2", "l1", "other")
    n = merge_dbs(tmp_path / "a.db", tmp_path / "b.db", prefer="src")
    assert n == 2
    a2 = AnnotationDB(tmp_path / "a.db")
    recs = {(r["page_path"], r["line_path"]): r["annotation"]
            for r in a2.all_lines()}
    assert recs[("p1", "l1")] == "new"
    assert recs[("p2", "l1")] == "other"


def test_ransac_skew():
    from origami_tpu.train.segment.skew import ransac_angle
    import math
    # many segments at 0.03 rad, a few outliers
    segs = []
    for i in range(20):
        x0, y0 = i * 10, 50 + i
        segs.append((x0, y0, x0 + 100, y0 + 100 * math.tan(0.03)))
    segs.append((0, 0, 0.5, 100))   # vertical outlier
    a = ransac_angle(segs)
    assert abs(a - 0.03) < 0.005


def test_compare_utility(tmp_path):
    from origami_tpu.core.segment import Prediction, Segmentation
    from origami_tpu.batch.utils.compare import (
        compare_segmentation, compare_ocr, mask_iou)
    lab_a = np.zeros((40, 30), np.uint8)
    lab_a[5:20, 5:25] = 1
    lab_b = lab_a.copy()
    lab_b[5:20, 5:10] = 0   # shrink class 1
    classes = {"TEXT": 0, "TABULAR": 1, "BACKGROUND": 3}
    for name, lab in (("a", lab_a), ("b", lab_b)):
        Segmentation([Prediction("REGION", "regions", lab, classes)]) \
            .save(tmp_path / ("%s.zip" % name))
    out = compare_segmentation(tmp_path / "a.zip", tmp_path / "b.zip")
    assert 0.6 < out["regions"]["TABULAR"] < 0.9
    ious = mask_iou(lab_a, lab_a, 4)
    assert all(v == 1.0 for v in ious.values())

    import zipfile as _zf
    for name, text in (("oa", "hello world"), ("ob", "hallo world")):
        with _zf.ZipFile(tmp_path / ("%s.zip" % name), "w") as zf:
            zf.writestr("regions/TEXT/0/0.txt", text)
    oc = compare_ocr(tmp_path / "oa.zip", tmp_path / "ob.zip")
    assert 0 < oc["cer"] < 0.2
    assert oc["n_lines"] == 1


def test_mutex_reclaims_dead_pids(tmp_path):
    import socket
    import sqlite3
    import time as _time
    from origami_tpu.batch.core.mutex import DatabaseMutex
    m = DatabaseMutex(tmp_path / "lock.db")
    assert m.try_lock("page", ["/a"])
    # fake locks held by a dead pid: one on this host, one on a remote
    # host (whose PIDs we cannot inspect — must NOT be reclaimed)
    conn = sqlite3.connect(str(tmp_path / "lock.db"))
    conn.execute(
        "INSERT INTO mutex (path, processor, pid, host, time) "
        "VALUES (?, ?, ?, ?, ?)",
        ("/b", "page", 999999999, socket.gethostname(), _time.time()))
    conn.execute(
        "INSERT INTO mutex (path, processor, pid, host, time) "
        "VALUES (?, ?, ?, ?, ?)",
        ("/c", "page", 999999999, "some-other-node", _time.time()))
    conn.commit()
    conn.close()
    m.clear_locks(age=3600)
    held = {p for p, *_ in m.held()}
    assert "/a" in held        # live pid's lock survives
    assert "/b" not in held    # dead local pid's lock reclaimed
    assert "/c" in held        # remote host's lock untouchable by pid
    m.unlock("page", ["/a"])
    # remote lock expires only by age
    _time.sleep(0.02)
    m.clear_locks(age=0.01)
    assert m.held() == []


def test_mutex_migrates_old_schema(tmp_path):
    import sqlite3
    from origami_tpu.batch.core.mutex import DatabaseMutex
    # a DB created by the pre-host-column schema keeps working
    conn = sqlite3.connect(str(tmp_path / "old.db"))
    conn.execute(
        "CREATE TABLE mutex (path TEXT NOT NULL, processor TEXT NOT "
        "NULL, pid INTEGER NOT NULL, time REAL NOT NULL, "
        "PRIMARY KEY (path, processor))")
    conn.execute("INSERT INTO mutex VALUES ('/z', 'page', 1, 0.0)")
    conn.commit()
    conn.close()
    m = DatabaseMutex(tmp_path / "old.db")
    assert not m.try_lock("page", ["/z"])
    assert m.try_lock("page", ["/w"])
    m.clear_locks()
    assert m.held() == []


def test_mutex_basics(tmp_path):
    from origami_tpu.batch.core.mutex import DatabaseMutex
    m = DatabaseMutex(tmp_path / "l.db")
    with m.lock("page", ["/x", "/y"]) as got:
        assert got
        # second claim on same paths fails
        assert not m.try_lock("page", ["/x"])
        # different processor may claim the same path
        assert m.try_lock("other", ["/x"])
        m.unlock("other", ["/x"])
    assert m.try_lock("page", ["/x"])
    m.unlock("page", ["/x"])


def test_remote_task_db(tmp_path):
    from origami_tpu.batch.remote.runner import (
        TaskDB, file_digest, signature)
    db = TaskDB(tmp_path / "tasks.db")
    assert db.status("p1.png") is None
    db.mark("p1.png", "RUNNING")
    assert db.status("p1.png") == "RUNNING"
    db.mark("p1.png", "DONE", "sig123")
    assert db.status("p1.png") == "DONE"
    # resume: a second TaskDB sees the state
    db2 = TaskDB(tmp_path / "tasks.db")
    assert db2.status("p1.png") == "DONE"

    f = tmp_path / "x.bin"
    f.write_bytes(b"hello world")
    d1 = file_digest(f)
    assert len(d1) == 64
    s1 = signature(f)
    f.write_bytes(b"hello world!")
    assert signature(f) != s1


def test_ocr_pack_strip_wide_line_downscales():
    import numpy as np
    from origami_tpu.batch.detect.ocr import pack_strip
    # black text block at the far right end of an over-wide strip
    strip = np.full((48, 3000), 255, np.uint8)
    strip[:, 2900:] = 0
    inv, w = pack_strip(strip, 2048, 48)
    assert w == 2048 and inv.shape == (48, 2048)
    # the tail ink survives (was cropped to blank before)
    assert inv[:, -110:].max() > 0.5
    # in-range strips pass through untouched
    inv2, w2 = pack_strip(strip[:, :500], 2048, 48)
    assert w2 == 500 and inv2.shape == (48, 500)


def test_pagexml_xsd_validation():
    from origami_tpu.pagexml.pagexml import Page
    doc = Page("x.png", (800, 1200))
    r = doc.append_region("TextRegion", "r_1", region_type="paragraph")
    r.append_coords([(0, 0), (100, 0), (100, 50), (0, 50)])
    tl = r.append_text_line("l_1")
    tl.append_coords([(0, 0), (100, 0), (100, 20), (0, 20)])
    tl.append_baseline([(0, 18), (100, 18)])
    tl.append_text_equiv("hello", confidence=0.9)
    r.append_text_equiv("hello")
    t = doc.append_region("TableRegion", "t_1")
    t.append_coords([(0, 100), (200, 100), (200, 200), (0, 200)])
    c = t.append_table_cell(0, 1, cell_id="t_1_c01", col_span=2)
    c.append_coords([(0, 100), (100, 100), (100, 150), (0, 150)])
    c.append_text_equiv("42")
    g = doc.append_region("GraphicRegion", "g_1")
    g.append_coords([(300, 300), (400, 300), (400, 400), (300, 400)])
    doc.append_reading_order(["r_1", "t_1", "g_1"])
    assert doc.validate()
    # the schema itself is enforced: TextEquiv on a GraphicRegion is
    # structurally fine but schema-invalid
    g.append_text_equiv("not allowed here")
    with pytest.raises(ValueError, match="schema"):
        doc.validate()


def test_pagexml_xsd_rejects_missing_line_id():
    from origami_tpu.pagexml.pagexml import Page
    doc = Page("x.png", (100, 100))
    r = doc.append_region("TextRegion", "r_1")
    r.append_coords([(0, 0), (10, 0), (10, 10)])
    r.append_text_line()   # TextLine @id is required by the schema
    with pytest.raises(ValueError, match="schema"):
        doc.validate()
    assert doc.validate(xsd=False)   # structural-only path still passes


def test_watchdog_reports_stuck_pages():
    import threading
    import time as _time
    from origami_tpu.batch.core.processor import Watchdog

    class FakePool:
        def __init__(self):
            self.terminated = False

        def terminate(self):
            self.terminated = True

    class HB:
        value = 0.0

    hb = HB()
    hb.value = _time.time() - 100     # stalled long ago
    work = {1234: ("corpus/page9.png", _time.time() - 90)}
    pool = FakePool()
    wd = Watchdog(pool, timeout=60, heartbeat=hb, work_set=work)
    wd._done = threading.Event()
    # drive one check directly instead of sleeping through the loop
    wd._strikes = 0
    assert _time.time() - hb.value > 60
    wd._strikes += 1
    wd._report_stuck()
    wd._cancelled = True
    pool.terminate()
    assert pool.terminated
    assert wd.stuck and wd.stuck[0][0] == "corpus/page9.png"
    assert wd.stuck[0][2] > 60


def test_annotate_web_ui(tmp_path, monkeypatch):
    import http.client
    import threading
    from http.server import HTTPServer
    import origami_tpu.tool.lineload as lineload
    from origami_tpu.tool.annotate_web import make_handler
    from origami_tpu.tool.lineload import AnnotationDB

    db_path = tmp_path / "annotations.db"
    db = AnnotationDB(db_path)
    db.add_line("p1.png", "regions/TEXT/0/0")
    db.add_line("p1.png", "regions/TEXT/0/1", annotation="done")

    strip = np.full((48, 200), 255, np.uint8)
    strip[20:30, 10:190] = 0
    monkeypatch.setattr(lineload, "load_line_image",
                        lambda page, line, h, column=None: strip)

    server = HTTPServer(("127.0.0.1", 0), make_handler(db_path, 48))
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=10)
        conn.request("GET", "/")
        assert b"transcription" in conn.getresponse().read()
        conn.request("GET", "/lines?only_blank=1")
        lines = json.loads(conn.getresponse().read())
        assert len(lines) == 1 and lines[0]["line_path"] == \
            "regions/TEXT/0/0"
        conn.request("GET", "/strip?page=p1.png&line=regions/TEXT/0/0")
        png = conn.getresponse().read()
        assert png[:8] == b"\x89PNG\r\n\x1a\n"
        body = json.dumps(dict(page="p1.png", line="regions/TEXT/0/0",
                               text="Neue Zeitung"))
        conn.request("POST", "/save", body=body,
                     headers={"Content-Type": "application/json"})
        assert conn.getresponse().status == 200
    finally:
        server.shutdown()
    recs = {r["line_path"]: r["annotation"]
            for r in AnnotationDB(db_path).all_lines()}
    assert recs["regions/TEXT/0/0"] == "Neue Zeitung"


def test_import_reference_model_meta(tmp_path):
    from origami_tpu.tool.migrate import import_model_meta
    from origami_tpu.models import registry
    # a reference-style model directory (meta.json + Keras model.h5)
    src = tmp_path / "v3" / "sep" / "1"
    src.mkdir(parents=True)
    src.joinpath("meta.json").write_text(json.dumps(dict(
        model="Unet", backbone="resnet34", type="SEPARATOR",
        classes=["H", "V", "T", "BACKGROUND"],
        full_size=[1280, 2400], tile_size=[1280, 896], tile_beta=50)))
    import h5py
    with h5py.File(str(src / "model.h5"), "w") as f:
        f.attrs["keras_version"] = b"2.3.1"
        f.create_dataset("model_weights/conv1/kernel",
                         data=np.zeros((3, 3, 1, 8), np.float32))
    out = tmp_path / "native" / "separator" / "00"
    meta = import_model_meta(src, out, width=0.125, s2d=2)
    assert meta["classes"] == ["H", "V", "T", "BACKGROUND"]
    assert meta["imported_from"]["h5"]["n_params"] == 72
    # the imported dir is a servable native model (fresh params)
    module, params, loaded = registry.load_model(out)
    assert loaded["type"] == "separator"
    assert loaded["tile_beta"] == 50


def test_pick_web_ui(tmp_path, monkeypatch):
    """Browser line-picking UI: lines listed with picked state from the
    DB, click-toggle adds/removes rows (reference origami/tool/pick.py
    workflow)."""
    import http.client
    import threading
    from http.server import HTTPServer
    import origami_tpu.tool.pick_web as pick_web
    from origami_tpu.tool.lineload import AnnotationDB

    db_path = tmp_path / "annotations.db"
    AnnotationDB(db_path).add_line("page.png", "regions/TEXT/0/1")

    shells = [("regions/TEXT/0/0",
               np.array([[10., 10.], [200., 10.], [200., 40.],
                         [10., 40.]])),
              ("regions/TEXT/0/1",
               np.array([[10., 60.], [200., 60.], [200., 90.],
                         [10., 90.]]))]
    monkeypatch.setattr(pick_web, "_page_lines",
                        lambda page, stage: (shells, (800, 1200), None))
    monkeypatch.setattr(pick_web, "_page_image",
                        lambda page, stage:
                        np.full((1200, 800), 230, np.uint8))

    server = HTTPServer(
        ("127.0.0.1", 0),
        pick_web.make_handler(db_path, [Path("page.png")], "reliable"))
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=10)
        conn.request("GET", "/")
        assert b"pick" in conn.getresponse().read()
        conn.request("GET", "/pages")
        assert json.loads(conn.getresponse().read()) == ["page.png"]
        conn.request("GET", "/lines?page=page.png")
        d = json.loads(conn.getresponse().read())
        assert d["size"] == [800, 1200]
        state = {l["path"]: l["picked"] for l in d["lines"]}
        assert state == {"regions/TEXT/0/0": False,
                         "regions/TEXT/0/1": True}
        assert d["lines"][0]["points"].startswith("10.0,10.0 200.0,10.0")
        conn.request("GET", "/image?page=page.png")
        assert conn.getresponse().read()[:2] == b"\xff\xd8"   # JPEG
        body = json.dumps(dict(page="page.png",
                               line="regions/TEXT/0/0", picked=True))
        conn.request("POST", "/toggle", body=body,
                     headers={"Content-Type": "application/json"})
        assert json.loads(conn.getresponse().read())["picked"] is True
        body = json.dumps(dict(page="page.png",
                               line="regions/TEXT/0/1", picked=False))
        conn.request("POST", "/toggle", body=body,
                     headers={"Content-Type": "application/json"})
        conn.getresponse().read()
    finally:
        server.shutdown()
    rows = {r["line_path"]
            for r in AnnotationDB(db_path).all_lines()}
    assert rows == {"regions/TEXT/0/0"}


def test_xycut_web_tree():
    """The cut tree matches the production reading order and carries
    drawable cut geometry (reference origami/tool/xycut.py stepper)."""
    from origami_tpu.core.xycut import reading_order
    from origami_tpu.tool.xycut_web import build_cut_tree

    # two columns, the right one split in two vertically
    named = [("left", (0., 0., 90., 200.)),
             ("right_top", (110., 0., 200., 90.)),
             ("right_bot", (110., 110., 200., 200.))]
    tree = build_cut_tree(named)
    assert tree["cut"] and tree["axis"] == 0 and 90 <= tree["x"] <= 110
    assert tree["extent"] == [0.0, 200.0]
    sides = {tuple(sorted(n["names"]))
             for n in (tree["a_node"], tree["b_node"]) if not n["cut"]}
    assert ("left",) in sides
    sub = tree["a_node"] if tree["a_node"]["cut"] else tree["b_node"]
    assert sub["axis"] == 1 and 90 <= sub["x"] <= 110
    assert sub["a_node"]["names"] + sub["b_node"]["names"] == \
        ["right_top", "right_bot"]
    assert list(reading_order(named)) == \
        ["left", "right_top", "right_bot"]


def test_xycut_web_ui(tmp_path, monkeypatch):
    import http.client
    import threading
    from http.server import HTTPServer
    import origami_tpu.tool.xycut_web as xycut_web

    monkeypatch.setattr(
        xycut_web, "cut_tree",
        lambda page, stage, fringe: dict(
            tree=dict(cut=False, names=["a"]), boxes={"a": [0, 0, 5, 5]},
            size=[10, 10], order=["a"]))
    server = HTTPServer(
        ("127.0.0.1", 0),
        xycut_web.make_handler([Path("page.png")], "reliable", 0.005))
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=10)
        conn.request("GET", "/")
        assert b"xycut" in conn.getresponse().read()
        conn.request("GET", "/tree?page=page.png")
        d = json.loads(conn.getresponse().read())
        assert d["order"] == ["a"] and d["boxes"]["a"] == [0, 0, 5, 5]
    finally:
        server.shutdown()


def test_cluster_web_ui(tmp_path, monkeypatch):
    """Cluster explorer: browse signature clusters as thumbnails
    (reference origami/tool/cluster.py PySide2 explorer)."""
    import http.client
    import threading
    from http.server import HTTPServer
    import PIL.Image
    import origami_tpu.tool.cluster_web as cluster_web

    pages = []
    for i in range(3):
        p = tmp_path / ("p%d.png" % i)
        PIL.Image.fromarray(
            np.full((120, 80), 200 + i, np.uint8)).save(str(p))
        pages.append(str(p))
    groups = {0: pages[:2], 1: pages[2:]}
    server = HTTPServer(("127.0.0.1", 0),
                        cluster_web.make_handler(groups))
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=10)
        conn.request("GET", "/")
        assert b"clusters" in conn.getresponse().read()
        conn.request("GET", "/clusters")
        d = json.loads(conn.getresponse().read())
        assert sorted(d.keys()) == ["0", "1"]
        assert len(d["0"]) == 2
        conn.request("GET", "/thumb?page=" +
                     pages[0].replace("/", "%2F"))
        assert conn.getresponse().read()[:2] == b"\xff\xd8"
        conn.request("GET", "/thumb?page=%2Fetc%2Fpasswd")
        assert conn.getresponse().status == 404
    finally:
        server.shutdown()


def test_cluster_web_compute(tmp_path):
    """compute_clusters groups processed pages by their signature
    vectors through the CLI's k-means."""
    import zipfile
    import PIL.Image
    from origami_tpu.tool.cluster_web import compute_clusters

    for i, counts in enumerate(([4, 0, 4, 0], [4, 0, 4, 0],
                                [0, 9, 0, 9])):
        out = tmp_path / ("p%d.out" % i)
        out.mkdir()
        PIL.Image.fromarray(
            np.full((60, 40), 220, np.uint8)).save(
            str(tmp_path / ("p%d.png" % i)))
        with zipfile.ZipFile(out / "signature.zip", "w") as zf:
            zf.writestr("signature.json",
                        json.dumps(dict(counts=dict(g=counts))))
    groups = compute_clusters(tmp_path, 2)
    sizes = sorted(len(v) for v in groups.values())
    assert sizes == [1, 2]

"""Edge-case unit tests for batch/core/io.py writers and path keys.

Covers the crash-safety and change-tracking semantics the batch stages
rely on (reference: origami/batch/core/processor.py's output protocol).
"""

import json
import zipfile

import pytest

from origami_tpu.batch.core.io import (
    Annotation, Artifact, AtomicFileWriter, Stage, TrackChangeWriter,
    _numeric_path_key, atomic_write, parse_artifact)


def test_atomic_write_no_partial_file_on_error(tmp_path):
    target = tmp_path / "out.json"
    with pytest.raises(RuntimeError):
        with atomic_write(target, "w") as f:
            f.write("partial")
            raise RuntimeError("boom")
    assert not target.exists()
    # no stray .tmp files either
    assert list(tmp_path.iterdir()) == []


def test_atomic_write_refuses_overwrite(tmp_path):
    target = tmp_path / "out.json"
    target.write_text("old")
    with pytest.raises(FileExistsError):
        with atomic_write(target, "w"):
            pass
    assert target.read_text() == "old"
    with AtomicFileWriter(overwrite=True)(target, "w") as f:
        f.write("new")
    assert target.read_text() == "new"


def _write_zip(f, entries):
    with zipfile.ZipFile(f, "w") as z:
        for name, data in entries:
            z.writestr(name, data)


def test_track_change_writer_markers(tmp_path):
    w = TrackChangeWriter()
    target = tmp_path / "data.zip"

    # first write: .checked marker, no .changed
    with w(target) as f:
        _write_zip(f, [("a.txt", b"1")])
    assert (tmp_path / "data.checked").exists()
    assert not (tmp_path / "data.changed").exists()

    # identical zip content (different byte stream is fine): no .changed
    with w(target) as f:
        _write_zip(f, [("a.txt", b"1")])
    assert not (tmp_path / "data.changed").exists()
    assert not (tmp_path / "data.tmp").exists()

    # changed content: .changed marker appears and file is replaced
    with w(target) as f:
        _write_zip(f, [("a.txt", b"2")])
    assert (tmp_path / "data.changed").exists()
    with zipfile.ZipFile(target) as z:
        assert z.read("a.txt") == b"2"


def test_track_change_writer_plain_files(tmp_path):
    w = TrackChangeWriter()
    target = tmp_path / "meta.json"
    with w(target, "w") as f:
        json.dump({"a": 1}, f)
    with w(target, "w") as f:
        json.dump({"a": 1}, f)
    assert not (tmp_path / "meta.changed").exists()
    with w(target, "w") as f:
        json.dump({"a": 2}, f)
    assert (tmp_path / "meta.changed").exists()


def test_numeric_path_key_ordering():
    parts = [("10.2",), ("2.10",), ("2.9",), ("regions",), ("2.9.1",)]
    ordered = sorted(parts, key=_numeric_path_key)
    assert ordered == [
        ("2.9",), ("2.9.1",), ("2.10",), ("10.2",), ("regions",)]


def test_parse_artifact_variants():
    art, stage = parse_artifact("contours/warped")
    assert art is Artifact.CONTOURS and stage is Stage.WARPED
    art, stage = parse_artifact("ocr")
    assert art is Artifact.OCR and stage is None
    ann, stage = parse_artifact("annotation/layout")
    assert isinstance(ann, Annotation) and stage is None
    assert "layout" in ann.filename()

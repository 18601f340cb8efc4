"""Segmentation containers and the segment.zip artifact format.

Keeps the reference's on-disk contract exactly (origami/core/segment.py:
69-80 and docs/formats.md#segmentzip): per predictor a paletted label PNG
plus a JSON {"type", "name", "classes"} file inside segment.zip — so
corpora segmented by either system interoperate.
"""

from __future__ import annotations

import enum
import io as _io
import json
import zipfile

import numpy as np
import PIL.Image

from origami_tpu.core.math import Orientation


class PredictorType(enum.Enum):
    REGION = 1
    SEPARATOR = 2


class Classes:
    """Ordered label name -> index mapping with the reference's enum-ish
    access patterns (name lookup, .value, background)."""

    def __init__(self, mapping):
        self._by_name = dict(mapping)
        self._by_value = {v: k for k, v in self._by_name.items()}

    def __getitem__(self, name):
        return ClassLabel(name, self._by_name[name])

    def __contains__(self, name):
        return name in self._by_name

    def __iter__(self):
        for name, value in self._by_name.items():
            yield ClassLabel(name, value)

    def name_of(self, value):
        return self._by_value.get(int(value))

    def as_dict(self):
        return dict(self._by_name)

    def __len__(self):
        return len(self._by_name)


class ClassLabel:
    __slots__ = ("name", "value")

    def __init__(self, name, value):
        self.name = name
        self.value = int(value)

    @property
    def orientation(self):
        # separator class names start with H or V (T counts as horizontal
        # table separator); mirrors SeparatorLabel.orientation in the
        # reference (origami/core/predict.py:130-137)
        return Orientation.V if self.name.startswith("V") else Orientation.H

    def __eq__(self, other):
        return isinstance(other, ClassLabel) and \
            (self.name, self.value) == (other.name, other.value)

    def __hash__(self):
        return hash((self.name, self.value))

    def __repr__(self):
        return "<ClassLabel %s=%d>" % (self.name, self.value)


def _palette_image(labels, background=None):
    """Paletted PNG of a label map (tab10-ish colors, white background)."""
    lab = np.asarray(labels).astype(np.uint8)
    im = PIL.Image.fromarray(lab, "P")
    base = np.array([
        [31, 119, 180], [255, 127, 14], [44, 160, 44], [214, 39, 40],
        [148, 103, 189], [140, 86, 75], [227, 119, 194], [127, 127, 127],
        [188, 189, 34], [23, 190, 207]], dtype=np.uint8)
    pal = np.zeros((256, 3), dtype=np.uint8)
    n = int(lab.max()) + 1
    for i in range(max(n, 1)):
        pal[i] = base[i % len(base)]
    if background is not None:
        pal[int(background)] = (255, 255, 255)
    im.putpalette(pal.flatten().tolist())
    return im


class Prediction:
    """One predictor's label map + class metadata."""

    def __init__(self, type_, name, labels, classes):
        self.type = type_ if isinstance(type_, PredictorType) \
            else PredictorType[str(type_).upper()]
        self.name = name
        self.labels = np.asarray(labels)
        self.classes = classes if isinstance(classes, Classes) \
            else Classes(classes)

    @property
    def background_label(self):
        if "BACKGROUND" in self.classes:
            return self.classes["BACKGROUND"]
        return None

    @property
    def size(self):
        h, w = self.labels.shape[:2]
        return (w, h)

    def class_mask(self, name):
        return self.labels == self.classes[name].value

    @property
    def colorized(self):
        bg = self.background_label
        return _palette_image(self.labels,
                              bg.value if bg is not None else None)


_SEGMENTATION_OPEN_CACHE = {}


class Segmentation:
    """A set of per-predictor Predictions with zip save/load."""

    def __init__(self, predictions):
        self.predictions = tuple(predictions)

    @property
    def size(self):
        return self.predictions[0].size

    def by_name(self, name):
        for p in self.predictions:
            if p.name == name:
                return p
        raise KeyError(name)

    def by_type(self, type_):
        return [p for p in self.predictions if p.type == type_]

    def save(self, file_or_path):
        if hasattr(file_or_path, "write"):
            self._save_to(file_or_path)
        else:
            with open(file_or_path, "wb") as f:
                self._save_to(f)

    def _save_to(self, f):
        with zipfile.ZipFile(f, "w", zipfile.ZIP_DEFLATED) as zf:
            for p in self.predictions:
                with _io.BytesIO() as buf:
                    # fast zlib level: optimize=True costs ~0.38 s per
                    # full-page label raster on the 1-core bench host
                    # (24x the level-1 encode) to save ~17 KB — the
                    # segment stage was spending more time encoding
                    # PNGs than running the U-Net. PNGs are already
                    # compressed, so store them uncompressed in the zip.
                    p.colorized.save(buf, "png", optimize=False,
                                     compress_level=1)
                    zf.writestr("%s.png" % p.name, buf.getvalue(),
                                zipfile.ZIP_STORED)
                zf.writestr("%s.json" % p.name, json.dumps(dict(
                    type=p.type.name, name=p.name,
                    classes=p.classes.as_dict())))

    @staticmethod
    def open(path, open=None):
        # NB: inside the class body a bare `open` default would bind to
        # this very staticmethod, not the builtin
        builtin_open = __import__("builtins").open
        cache_key = None
        if open is None or open is builtin_open:
            # memoized per file identity: every downstream stage
            # re-opens segment.zip and the label-PNG decode was
            # ~0.3 s/stage over 6 bench pages; label arrays are
            # treated immutable repo-wide (mutators copy first,
            # core/predict.py sanitize_tabular)
            import os
            try:
                st = os.stat(path)
                cache_key = (str(path), st.st_mtime_ns, st.st_size)
            except OSError:
                cache_key = None
            hit = _SEGMENTATION_OPEN_CACHE.get(cache_key)
            if hit is not None:
                return hit
        open = open or builtin_open
        predictions = []
        with open(path, "rb") as f:
            with zipfile.ZipFile(f, "r") as zf:
                stems = [n[:-4] for n in zf.namelist() if n.endswith(".png")]
                for stem in stems:
                    with _io.BytesIO(zf.read(stem + ".png")) as buf:
                        im = PIL.Image.open(buf)
                        im.load()
                    meta = json.loads(zf.read(stem + ".json"))
                    predictions.append(Prediction(
                        meta["type"], meta["name"], np.array(im),
                        meta["classes"]))
        seg = Segmentation(predictions)
        if cache_key is not None:
            if len(_SEGMENTATION_OPEN_CACHE) > 16:
                _SEGMENTATION_OPEN_CACHE.clear()
            _SEGMENTATION_OPEN_CACHE[cache_key] = seg
        return seg

    @staticmethod
    def read_predictors(path, open=None):
        """Lightweight metadata-only read of segment.zip."""
        open = open or __import__("builtins").open
        out = []
        with open(path, "rb") as f:
            with zipfile.ZipFile(f, "r") as zf:
                for name in zf.namelist():
                    if name.endswith(".json"):
                        out.append(json.loads(zf.read(name)))
        return out

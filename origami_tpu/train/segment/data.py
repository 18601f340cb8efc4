"""Training-tile generation: corpus of (image, label) pages -> tile
datasets with class weights and k-fold splits.

Counterpart of the reference's TileProcessor (origami/train/segment/
main.py:60-440: 1280x2400 master pages cut into 1280x896 tiles with
>=50 px overlap, median class-frequency loss weights, 5-fold validation
splits). Ground truth is read as paletted label PNGs next to the page
images (<stem>.labels.<kind>.png) instead of PSD layer stacks.
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np
import PIL.Image

from origami_tpu.ops.tiling import TileLayout
from origami_tpu.train.segment.labels import LabelSet


def page_pairs(corpus_dir, kind):
    """Yield (image_path, label_path) pairs for one network kind."""
    corpus_dir = Path(corpus_dir)
    for img in sorted(corpus_dir.glob("*.png")):
        if ".labels." in img.name:
            continue
        lab = img.with_name(img.stem + ".labels.%s.png" % kind)
        if lab.exists():
            yield img, lab


def class_weights(label_maps, num_classes):
    """Median-frequency class weights (reference main.py:302-319)."""
    freqs = np.zeros(num_classes, dtype=np.float64)
    for lab in label_maps:
        freqs += np.bincount(np.asarray(lab).flatten(),
                             minlength=num_classes)[:num_classes]
    total = freqs.sum()
    if total == 0:
        return np.ones(num_classes)
    freqs = freqs / total
    med = np.median(freqs[freqs > 0])
    w = np.where(freqs > 0, med / np.maximum(freqs, 1e-9), 0.0)
    return w / max(w.max(), 1e-9) * 10.0


def k_folds(names, k=5, seed=0):
    """Deterministic k-fold split (reference gen/folds.py)."""
    rng = np.random.default_rng(seed)
    names = sorted(names)
    order = rng.permutation(len(names))
    folds = [[] for _ in range(k)]
    for i, idx in enumerate(order):
        folds[i % k].append(names[idx])
    return [sorted(f) for f in folds]


class TileDataset:
    """Generates training tiles for one kind; optionally augmented."""

    def __init__(self, corpus_dir, label_set, kind,
                 full_size=(1280, 2400), tile_size=(1280, 896), beta0=50,
                 augmentations=1, warp_amplitude=12.0, seed=0):
        self.kind = kind
        self.label_set = label_set
        self.layout = TileLayout(full_size, tile_size, beta0)
        self.full_size = full_size
        self.tile_size = tile_size
        self.pairs = list(page_pairs(corpus_dir, kind))
        self.augmentations = augmentations
        self.warp_amplitude = warp_amplitude
        self.seed = seed

    def _load_pair(self, img_path, lab_path):
        import cv2
        w, h = self.full_size
        img = np.asarray(PIL.Image.open(str(img_path)).convert("L"))
        lab = np.asarray(PIL.Image.open(str(lab_path)))
        img = cv2.resize(img, (w, h), interpolation=cv2.INTER_AREA)
        lab = cv2.resize(lab, (w, h), interpolation=cv2.INTER_NEAREST)
        return img, lab

    def tiles(self):
        """Yield (name, tile_image (th, tw), tile_labels (th, tw))."""
        from origami_tpu.train.segment.warp import WarpAugmentation
        aug = WarpAugmentation(self.warp_amplitude, seed=self.seed) \
            if self.augmentations > 1 else None
        for img_path, lab_path in self.pairs:
            img, lab = self._load_pair(img_path, lab_path)
            variants = [("", img, lab)]
            for a in range(1, self.augmentations):
                im2, lab2 = aug(img, lab)
                variants.append((".warp%d" % a, im2, lab2))
            for suffix, im, lb in variants:
                for i, t in enumerate(self.layout.tiles):
                    x0, y0, x1, y1 = t["outer"]
                    yield ("%s%s.t%d" % (img_path.stem, suffix, i),
                           im[y0:y1, x0:x1], lb[y0:y1, x0:x1])

    def generate(self, out_dir):
        """Write tiles + weights.json + codes.json + folds.json."""
        out_dir = Path(out_dir)
        out_dir.mkdir(parents=True, exist_ok=True)
        names = []
        labels_seen = []
        for name, tile_img, tile_lab in self.tiles():
            PIL.Image.fromarray(tile_img).save(
                str(out_dir / (name + ".png")))
            PIL.Image.fromarray(tile_lab.astype(np.uint8)).save(
                str(out_dir / (name + ".labels.png")))
            names.append(name)
            labels_seen.append(tile_lab)
        n_cls = self.label_set.num_classes(self.kind)
        w = class_weights(labels_seen, n_cls)
        (out_dir / "weights.json").write_text(json.dumps(
            dict(weights=w.tolist())))
        (out_dir / "codes.json").write_text(json.dumps(
            self.label_set.classes_dict(self.kind)))
        page_names = sorted(set(n.split(".")[0] for n in names))
        (out_dir / "folds.json").write_text(json.dumps(
            dict(folds=k_folds(page_names))))
        return names


def load_tile_batch(out_dir, names, tile_hw):
    """Load a batch of generated tiles as (images, labels) arrays."""
    out_dir = Path(out_dir)
    th, tw = tile_hw
    images = np.zeros((len(names), th, tw, 1), np.float32)
    labels = np.zeros((len(names), th, tw), np.int32)
    for i, n in enumerate(names):
        im = np.asarray(PIL.Image.open(str(out_dir / (n + ".png"))))
        lb = np.asarray(PIL.Image.open(
            str(out_dir / (n + ".labels.png"))))
        images[i, : im.shape[0], : im.shape[1], 0] = im / 255.0
        labels[i, : lb.shape[0], : lb.shape[1]] = lb
    return images, labels

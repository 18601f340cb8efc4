"""utils.compare — artifact parity between two corpora.

Implements the BASELINE.md comparison protocol: run two systems (e.g.
this framework and the reference, or two versions of this framework)
over the same pages, then diff their artifacts — per-class segmentation
mask IoU, region count/area deltas, and OCR text CER — without relying
on the reference's runnable stack.
"""

from __future__ import annotations

import zipfile
from pathlib import Path

import click
import numpy as np

from origami_tpu.batch.core.io import find_data_path
from origami_tpu.batch.utils.evaluate import cer


def mask_iou(a_labels, b_labels, n_classes):
    """Per-class IoU between two label maps (resized to match)."""
    import cv2
    if a_labels.shape != b_labels.shape:
        b_labels = cv2.resize(
            b_labels, (a_labels.shape[1], a_labels.shape[0]),
            interpolation=cv2.INTER_NEAREST)
    ious = {}
    for c in range(n_classes):
        am = a_labels == c
        bm = b_labels == c
        union = np.logical_or(am, bm).sum()
        if union == 0:
            continue
        ious[c] = float(np.logical_and(am, bm).sum() / union)
    return ious


def compare_segmentation(path_a, path_b):
    from origami_tpu.core.segment import Segmentation
    seg_a = Segmentation.open(path_a)
    out = {}
    seg_b = Segmentation.open(path_b)
    for pa in seg_a.predictions:
        try:
            pb = seg_b.by_name(pa.name)
        except KeyError:
            continue
        ious = mask_iou(pa.labels, pb.labels, len(pa.classes))
        named = {pa.classes.name_of(c) or str(c): v
                 for c, v in ious.items()}
        out[pa.name] = named
    return out


def compare_ocr(path_a, path_b):
    def read(path):
        with zipfile.ZipFile(path) as zf:
            return {n: zf.read(n).decode("utf8")
                    for n in zf.namelist() if n.endswith(".txt")}
    ta = read(path_a)
    tb = read(path_b)
    joint = sorted(set(ta) | set(tb))
    if not joint:
        return dict(cer=0.0, n_lines=0, only_a=0, only_b=0)
    cers = []
    for n in sorted(set(ta) & set(tb)):
        cers.append(cer(ta[n], tb[n]))
    return dict(
        cer=float(np.mean(cers)) if cers else 1.0,
        n_lines=len(joint),
        only_a=len(set(ta) - set(tb)),
        only_b=len(set(tb) - set(ta)))


def compare_compose(path_a, path_b):
    def read(path):
        with zipfile.ZipFile(path) as zf:
            return zf.read("page.txt").decode("utf8") \
                if "page.txt" in zf.namelist() else ""
    return dict(cer=cer(read(path_a), read(path_b)))


@click.command()
@click.argument("corpus_a", type=click.Path(exists=True), required=True)
@click.argument("corpus_b", type=click.Path(exists=True), required=True)
def compare(corpus_a, corpus_b):
    """Diff artifacts of the same pages processed by two systems."""
    corpus_a = Path(corpus_a)
    corpus_b = Path(corpus_b)
    pages = sorted(p.name for p in corpus_a.glob("*.out"))
    all_iou = []
    all_cer = []
    for name in pages:
        out_a = corpus_a / name
        out_b = corpus_b / name
        if not out_b.exists():
            print("%s: missing in B" % name)
            continue
        row = [name]
        sa, sb = out_a / "segment.zip", out_b / "segment.zip"
        if sa.exists() and sb.exists():
            ious = compare_segmentation(sa, sb)
            flat = [v for d in ious.values() for v in d.values()]
            if flat:
                all_iou.extend(flat)
                row.append("seg IoU %.4f" % np.mean(flat))
        oa, ob = out_a / "ocr.zip", out_b / "ocr.zip"
        if oa.exists() and ob.exists():
            oc = compare_ocr(oa, ob)
            all_cer.append(oc["cer"])
            row.append("ocr CER %.4f (%d lines, +%d/-%d)"
                       % (oc["cer"], oc["n_lines"], oc["only_a"],
                          oc["only_b"]))
        ca, cb = out_a / "compose.zip", out_b / "compose.zip"
        if ca.exists() and cb.exists():
            row.append("compose CER %.4f"
                       % compare_compose(ca, cb)["cer"])
        print("  ".join(row))
    if all_iou:
        print("mean segment IoU: %.4f" % np.mean(all_iou))
    if all_cer:
        print("mean OCR CER:     %.4f" % np.mean(all_cer))


if __name__ == "__main__":
    compare()

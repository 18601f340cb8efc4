"""utils.evaluate — CER/WER evaluation against ground truth.

The reference shells out to the external Dinglehopper tool
(origami/batch/utils/evaluate.py:89-94); here the metrics are computed
natively: Levenshtein distance over characters (CER) and tokens (WER)
between the composed text and `<page>.gt.txt` / `<page>.gt.page.xml`
ground truth.
"""

from __future__ import annotations

import json
import zipfile
from pathlib import Path

import click
import numpy as np

from origami_tpu.batch.core.processor import Processor
from origami_tpu.batch.core.io import (
    Artifact, Input, Output, Stage, find_data_path)


def _as_codes(a, b):
    """Map two strings (chars) or token lists to int numpy arrays
    under ONE shared code mapping."""
    if isinstance(a, str):
        return (np.frombuffer(a.encode("utf-32-le"), dtype=np.uint32),
                np.frombuffer(b.encode("utf-32-le"), dtype=np.uint32))
    codes = {}
    return tuple(
        np.array([codes.setdefault(t, len(codes)) for t in seq],
                 dtype=np.int64)
        for seq in (a, b))


def levenshtein(a, b):
    """Edit distance, fully vectorized rows.

    The left-to-right dependency cur[j+1] = min(..., cur[j] + 1) is an
    exact prefix-min: cur[j] = j + cummin(u)[j] with u_0 = cur[0] and
    u_k = min(prev[k] + 1, prev[k-1] + cost_k) - k, so each row is
    O(n) numpy instead of a Python loop (full-page CER on a corpus was
    previously minutes of interpreter time)."""
    if not len(a):
        return len(b)
    if not len(b):
        return len(a)
    if isinstance(a, str) != isinstance(b, str):
        raise TypeError("mixed str/list operands")
    ca, cb = _as_codes(a, b)
    n = len(cb)
    steps = np.arange(1, n + 1, dtype=np.int64)
    prev = np.arange(n + 1, dtype=np.int64)
    u = np.empty(n + 1, dtype=np.int64)
    for i in range(len(ca)):
        base = np.minimum(prev[1:] + 1, prev[:-1] + (ca[i] != cb))
        u[0] = i + 1
        np.subtract(base, steps, out=u[1:])
        np.minimum.accumulate(u, out=u)
        prev[0] = i + 1
        np.add(u[1:], steps, out=prev[1:])
    return int(prev[-1])


def cer(gt, pred):
    gt = gt.strip()
    if not gt:
        return 0.0 if not pred.strip() else 1.0
    return levenshtein(gt, pred.strip()) / len(gt)


def wer(gt, pred):
    gw = gt.split()
    pw = pred.split()
    if not gw:
        return 0.0 if not pw else 1.0
    return levenshtein(gw, pw) / len(gw)


def match_baselines(gt_lines, detected, min_overlap=0.4):
    """Match hand-authored GT baselines to detected baseline polylines.

    ``gt_lines``: dicts with ``y`` (baseline row), ``x0``/``x1`` (ink
    extent) and ``h`` (x-height band).  ``detected``: polylines as
    (N, 2) x/y point arrays in the same (warped-page) pixel space.
    A detected line is a candidate when the x-overlap covers at least
    half of the SHORTER of the two spans (detected lines may be split
    into short segments) and at least 25 px; the reported distance is
    the vertical gap between the GT row and the polyline interpolated
    at the overlap midpoint.  Returns ``[(gt, dist-or-None), ...]``
    with the best (smallest-gap) candidate per GT line.

    Mirrors the evaluation intent of the reference's baseline
    accuracy checks (origami/batch/utils/evaluate.py) but against
    in-repo JSON GT rather than PageXML.
    """
    dets = []
    for pts in detected:
        pts = np.asarray(pts, float)
        if len(pts) < 2:
            continue
        o = np.argsort(pts[:, 0])
        dets.append(pts[o])
    out = []
    for gt in gt_lines:
        span = max(1.0, gt["x1"] - gt["x0"])
        best = None
        for pts in dets:
            lo = max(gt["x0"], pts[0, 0])
            hi = min(gt["x1"], pts[-1, 0])
            need = max(25.0, min_overlap * min(span, pts[-1, 0] - pts[0, 0]))
            if hi - lo < need:
                continue
            xm = 0.5 * (lo + hi)
            yd = float(np.interp(xm, pts[:, 0], pts[:, 1]))
            d = abs(yd - gt["y"])
            if best is None or d < best:
                best = d
        out.append((gt, best))
    return out


def gt_zones(gt_lines, pad_x=12.0, pad_y_factor=2.0):
    """Evaluation zones for partially-annotated GT.

    When GT lines carry a ``band`` key, only those sub-bands of the
    page are annotated (e.g. the 1925 BBZ fixture annotates 4 marker-
    free column bands of a page with ~6x more real text lines), so
    precision must be zone-limited: detections outside every band are
    legitimate lines the GT simply does not cover, not false
    positives. Returns ``[(x0, y0, x1, y1), ...]`` — one padded bbox
    per band — or ``None`` when the GT is full-page (no bands).
    """
    bands = {}
    for g in gt_lines:
        b = g.get("band")
        if b is None:
            return None
        bands.setdefault(b, []).append(g)
    zones = []
    for ls in bands.values():
        pad_y = pad_y_factor * float(np.median([g["h"] for g in ls]))
        zones.append((min(g["x0"] for g in ls) - pad_x,
                      min(g["y"] for g in ls) - pad_y,
                      max(g["x1"] for g in ls) + pad_x,
                      max(g["y"] for g in ls) + pad_y))
    return zones


def match_detections(gt_lines, detected, zones=None, min_overlap=0.4):
    """Per-DETECTION matching: the precision-side complement of
    match_baselines (which is per-GT-line, i.e. recall-side).

    A detection is a true positive when some GT line x-overlaps it (by
    the same criterion as match_baselines) and the vertical gap at the
    overlap midpoint is within that GT line's tolerance
    (max(0.5*h, 4) px). With ``zones`` (see gt_zones), detections
    whose midpoint falls outside every zone are excluded from the
    denominator entirely.

    Returns ``dict(n_considered, n_true, n_out_of_zone, precision)``.
    """
    n_true = 0
    n_considered = 0
    n_out = 0
    for pts in detected:
        pts = np.asarray(pts, float)
        if len(pts) < 2:
            continue
        o = np.argsort(pts[:, 0])
        pts = pts[o]
        xm_det = 0.5 * (pts[0, 0] + pts[-1, 0])
        ym_det = float(np.interp(xm_det, pts[:, 0], pts[:, 1]))
        if zones is not None and not any(
                x0 <= xm_det <= x1 and y0 <= ym_det <= y1
                for x0, y0, x1, y1 in zones):
            n_out += 1
            continue
        n_considered += 1
        for gt in gt_lines:
            span = max(1.0, gt["x1"] - gt["x0"])
            lo = max(gt["x0"], pts[0, 0])
            hi = min(gt["x1"], pts[-1, 0])
            need = max(25.0, min_overlap
                       * min(span, pts[-1, 0] - pts[0, 0]))
            if hi - lo < need:
                continue
            xm = 0.5 * (lo + hi)
            yd = float(np.interp(xm, pts[:, 0], pts[:, 1]))
            if abs(yd - gt["y"]) <= max(0.5 * gt["h"], 4.0):
                n_true += 1
                break
    return dict(
        n_considered=n_considered, n_true=n_true, n_out_of_zone=n_out,
        precision=(n_true / n_considered) if n_considered else 0.0)


def _page_xml_text(data):
    from lxml import etree
    root = etree.fromstring(data)
    lines = []
    for te in root.iter("{*}TextRegion"):
        uni = te.findall("./{*}TextEquiv/{*}Unicode")
        if uni and uni[-1].text:
            lines.append(uni[-1].text)
    return "\n".join(lines)


def find_ground_truth(page_path):
    page_path = Path(page_path)
    for suffix, parse in ((".gt.txt", lambda b: b.decode("utf8")),
                          (".gt.page.xml", _page_xml_text)):
        p = page_path.with_suffix(suffix)
        if p.exists():
            return parse(p.read_bytes())
    return None


class EvaluationProcessor(Processor):
    def __init__(self, options):
        options = dict(options)
        options.setdefault("lock_strategy", "NONE")
        super().__init__(options)
        self._results = []

    @property
    def processor_name(self):
        return "origami_tpu.batch.utils.evaluate"

    def artifacts(self):
        return [("input", Input(Artifact.COMPOSE))]

    def should_process(self, page_path):
        return find_ground_truth(page_path) is not None

    def process(self, page_path, input):
        gt = find_ground_truth(page_path)
        with zipfile.ZipFile(input.path(Artifact.COMPOSE)) as zf:
            pred = zf.read("page.txt").decode("utf8")
        c = cer(gt, pred)
        w = wer(gt, pred)
        self._results.append((str(page_path), c, w))
        return dict(cer=round(c, 4), wer=round(w, 4))

    def print(self):
        if not self._results:
            print("no pages with ground truth found.")
            return
        cs = [r[1] for r in self._results]
        ws = [r[2] for r in self._results]
        for path, c, w in self._results:
            print("%s  CER=%.4f  WER=%.4f" % (Path(path).name, c, w))
        print("mean over %d pages: CER=%.4f WER=%.4f"
              % (len(cs), np.mean(cs), np.mean(ws)))


@click.command()
@click.argument("data_path", type=click.Path(exists=True), required=True)
@Processor.options
def evaluate(data_path, **kwargs):
    """Evaluate CER/WER against ground truth in DATA_PATH."""
    p = EvaluationProcessor(kwargs)
    p.traverse(data_path)
    p.print()


if __name__ == "__main__":
    evaluate()

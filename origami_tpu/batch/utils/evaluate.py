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


def levenshtein(a, b):
    """Edit distance, O(len(a) * len(b)) with numpy rows."""
    if not a:
        return len(b)
    if not b:
        return len(a)
    prev = np.arange(len(b) + 1)
    for i, ca in enumerate(a):
        cur = np.empty(len(b) + 1, dtype=np.int64)
        cur[0] = i + 1
        sub = prev[:-1] + np.array([ca != cb for cb in b], dtype=np.int64)
        for j in range(len(b)):
            cur[j + 1] = min(cur[j] + 1, prev[j + 1] + 1, sub[j])
        prev = cur
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

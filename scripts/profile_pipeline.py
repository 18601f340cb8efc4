"""Per-stage wall-time profile of the full detect chain on synthetic
full-resolution pages (CPU backend unless AXON=1)."""
import os
import sys
import time
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))
import jax
if os.environ.get("AXON") != "1":
    jax.config.update("jax_platforms", "cpu")

import numpy as np
import PIL.Image
import tempfile

def make_page(rng, h=2400, w=1600):
    img = np.full((h, w), 235, dtype=np.uint8)
    for col in range(4):
        x0 = 60 + col * 390
        x1 = x0 + 330
        y = 120
        while y < h - 120:
            lh = 36
            xs = np.arange(x0, x1)
            mask = rng.random(len(xs)) < 0.8
            img[y:y + lh - 12, xs[mask]] = rng.integers(10, 80)
            y += lh + 16
    for col in range(1, 4):
        x = 45 + col * 390
        img[100:h - 100, x:x + 3] = 20
    img[500:503, 60:390] = 20
    return img

root = pathlib.Path(tempfile.mkdtemp()) / "corpus"
root.mkdir()
rng = np.random.default_rng(0)
N = int(os.environ.get("N_PAGES", "2"))
for i in range(N):
    PIL.Image.fromarray(make_page(rng)).save(root / ("p%04d.png" % i))

from origami_tpu.batch.detect.segment import SegmentationProcessor
from origami_tpu.batch.detect.contours import ContoursProcessor
from origami_tpu.batch.detect.flow import FlowDetectionProcessor
from origami_tpu.batch.detect.dewarp import DewarpProcessor
from origami_tpu.batch.detect.layout import LayoutDetectionProcessor
from origami_tpu.batch.detect.lines import LineDetectionProcessor
from origami_tpu.batch.detect.order import ReadingOrderProcessor
from origami_tpu.batch.detect.ocr import OCRProcessor
from origami_tpu.batch.detect.compose import ComposeProcessor

opts = dict(lock_strategy="NONE", plain=True)
stages = [
    ("segment", SegmentationProcessor("heuristic", opts)),
    ("contours", ContoursProcessor(opts)),
    ("flow", FlowDetectionProcessor(opts)),
    ("dewarp", DewarpProcessor(opts)),
    ("layout", LayoutDetectionProcessor(dict(layout="bbz", **opts))),
    ("lines", LineDetectionProcessor(opts)),
    ("order", ReadingOrderProcessor(opts)),
    ("ocr", OCRProcessor(dict(model="FAKE", **opts))),
    ("compose", ComposeProcessor(dict(page_xml=True, **opts))),
]
total = 0.0
for name, proc in stages:
    t0 = time.perf_counter()
    proc.traverse(root)
    dt = time.perf_counter() - t0
    total += dt
    print("%-10s %6.2f s  (%.2f s/page)" % (name, dt, dt / N), flush=True)
print("TOTAL      %6.2f s  (%.2f s/page, %.2f pages/s)"
      % (total, total / N, N / total))

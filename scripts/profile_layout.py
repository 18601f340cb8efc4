import sys, pathlib, cProfile, pstats, tempfile
sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np, PIL.Image

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
PIL.Image.fromarray(make_page(rng)).save(root / "p0.png")

from origami_tpu.batch.detect.segment import SegmentationProcessor
from origami_tpu.batch.detect.contours import ContoursProcessor
from origami_tpu.batch.detect.flow import FlowDetectionProcessor
from origami_tpu.batch.detect.dewarp import DewarpProcessor
from origami_tpu.batch.detect.layout import LayoutDetectionProcessor
opts = dict(lock_strategy="NONE", plain=True)
SegmentationProcessor("heuristic", opts).traverse(root)
ContoursProcessor(opts).traverse(root)
FlowDetectionProcessor(opts).traverse(root)
DewarpProcessor(opts).traverse(root)

import time
proc = LayoutDetectionProcessor(dict(layout="bbz", **opts))
pr = cProfile.Profile()
pr.enable()
proc.traverse(root)
pr.disable()
pstats.Stats(pr).sort_stats("tottime").print_stats(18)

"""detect.segment — U-Net page segmentation (CLI stage 1).

Reference contract: origami/batch/detect/segment.py (image -> segment.zip
with paletted label PNGs + class JSONs). Runs as a BatchedProcessor so a
whole lock-chunk of pages goes through the jit-compiled ensemble graph in
one device dispatch; `--model heuristic` uses the model-free device
segmenter (the pipeline's FAKE backend).
"""

from __future__ import annotations

from pathlib import Path

import click
import numpy as np

from origami_tpu.batch.core.processor import BatchedProcessor, Processor
from origami_tpu.batch.core.io import Artifact, Input, Output, Stage
from origami_tpu.core.page import Page


class SegmentationProcessor(BatchedProcessor):
    def __init__(self, model, options):
        super().__init__(options, batch_size=options.get("batch_size", 8))
        self._model_path = model
        self._target = options.get("target", "quality")
        self._predictor = None

    @property
    def processor_name(self):
        return "origami_tpu.batch.detect.segment"

    def artifacts(self):
        return [("output", Output(Artifact.SEGMENTATION))]

    def _get_predictor(self):
        if self._predictor is None:
            spec = str(self._model_path)
            if spec.lower() in ("heuristic", "fake"):
                from origami_tpu.core.predict import \
                    HeuristicSegmentationPredictor
                self._predictor = HeuristicSegmentationPredictor()
            elif spec.lower().startswith("auto:"):
                # hybrid mode: trained students + per-page heuristic
                # fallback on domain collapse (docs/migration.md)
                from origami_tpu.core.predict import \
                    AutoSegmentationPredictor
                self._predictor = AutoSegmentationPredictor(
                    spec[len("auto:"):], target=self._target)
            else:
                from origami_tpu.core.predict import SegmentationPredictor
                self._predictor = SegmentationPredictor(
                    self._model_path, target=self._target)
        return self._predictor

    def preload(self, page_path):
        # image decode happens on the feeder threads while the device
        # segments the previous batch
        return Page(page_path).warped

    def process_batch(self, pages):
        predictor = self._get_predictor()
        page_objs = [Page(p) for p, _ in pages]
        images = [kwargs.get("_preloaded") if kwargs.get("_preloaded")
                  is not None else pg.warped
                  for (p, kwargs), pg in zip(pages, page_objs)]
        segs = predictor.predict_batch(images)
        for (p, kwargs), seg in zip(pages, segs):
            kwargs["output"].segmentation(seg)
        # prefetch the Sauvola mask into the process-wide binarize LRU:
        # this stage runs in the wave runner's DEVICE side thread, so
        # the dispatch + packed transfer (~0.1 s/page) overlaps host
        # geometry instead of stalling flow (its first consumer)
        for pg in page_objs:
            try:
                pg.binarized
            except Exception:
                pass
        # auto mode: record the per-page trained/heuristic decision in
        # runtime.json so fallbacks are auditable after a corpus run
        modes = getattr(predictor, "last_modes", None)
        if modes:
            return {p: {"segmentation_mode": m}
                    for (p, _), m in zip(pages, modes)}
        return {}


@click.command()
@click.option("-m", "--model", required=True, type=str,
              help="models directory, 'heuristic' for the model-free "
                   "device segmenter, or 'auto:<dir>' for trained models "
                   "with per-page heuristic fallback on domain collapse")
@click.option("-t", "--target", type=str, default="quality",
              help="speed (1 model per net) vs quality (full ensembles)")
@click.option("-b", "--batch-size", type=int, default=8,
              help="pages per device batch")
@click.argument("data_path", type=click.Path(exists=True), required=True)
@Processor.options
def segment(data_path, model, **kwargs):
    """Segment all document images in DATA_PATH."""
    SegmentationProcessor(model, kwargs).traverse(data_path)


if __name__ == "__main__":
    segment()

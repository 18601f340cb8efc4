"""detect.flow — estimate page warp samples + detect warped lines
(CLI stage 3).

Reference contract: origami/batch/detect/flow.py (image + contours.0 ->
flow.zip with h/v angle samples, lines.0.zip with warped lines). Line
detection is Tesseract-free (core.baselines projection profiles over
device-binarized block crops); H samples come from detected baseline
angles plus H/T separator tangents, V samples from V separator tangents
plus baseline normals.
"""

from __future__ import annotations

import json
import math
from pathlib import Path

import click
import numpy as np

from origami_tpu.batch.core.processor import Processor
from origami_tpu.batch.core.io import Artifact, Input, Output, Stage
from origami_tpu.core.baselines import detect_baselines
from origami_tpu.core.block import Line, TextAreaFactory
from origami_tpu.core.flow import Samples, separator_angle_samples
from origami_tpu.core.math import Orientation


def detect_block_lines(page, regions, min_height=4, force_lines=False,
                       region_filter=None, separators=None):
    """Detect lines in all (TEXT-like) blocks of a page.

    Returns {block_path: [Line, ...]} on the page's current stage.

    With `separators` (core.separate.Separators in the same stage
    space), buffered separator geometry is subtracted from each
    non-TABULAR block's text area so extended baselines stop short of
    a column rule instead of sampling its stroke (the recognizer reads
    a bled-in rule as a stray 'l'). TABULAR blocks keep the full area:
    their V separators are the table's own dividers, and shaving them
    would truncate row lines to one column."""
    dewarped = regions is not None and _any_dewarped(regions)
    binarized = page.dewarped_binarized if dewarped else page.binarized
    blocks = regions.by_path
    obstacles = []
    if separators is not None:
        from origami_tpu.geometry.ops import buffer as _buffer
        for geom in separators.geoms:
            try:
                obstacles.append(_buffer(geom, 3.0))
            except Exception:
                pass
    text_area = TextAreaFactory(list(blocks.values()),
                                obstacles=obstacles)
    # page-level skew once (coarsely decimated), refined per block:
    # a full per-crop angle sweep for every region was ~20% of the
    # lines stage's host time
    from origami_tpu.core.baselines import estimate_skew
    # a dewarped page is deskewed by construction: hint 0 turns the
    # coarse+fine sweep into a ~7-eval hill-climb around zero (the
    # climb still walks outward if residual skew exists)
    page_skew = estimate_skew(
        (~np.asarray(binarized, dtype=bool)).astype(np.float32),
        max_ds=8, hint=0.0 if dewarped else None)
    det_by_block = {}
    for path, block in blocks.items():
        if region_filter is not None and not region_filter(path):
            continue
        x0, y0, x1, y1 = [int(v) for v in block.bounds]
        h, w = binarized.shape[:2]
        x0 = max(0, x0); y0 = max(0, y0)
        x1 = min(w, x1 + 1); y1 = min(h, y1 + 1)
        if x1 - x0 < 2 or y1 - y0 < min_height:
            det_by_block[path] = (block, [])
            continue
        crop = binarized[y0:y1, x0:x1]
        det_by_block[path] = (block, detect_baselines(
            crop, origin=(x0, y0), min_line_height=min_height,
            force_one=force_lines, skew_hint=page_skew))

    # page-median band height gates the crop-clip recovery (see
    # core.baselines.unclip_band)
    from origami_tpu.core.baselines import unclip_band
    heights = [d.ascent + d.descent
               for _, dets in det_by_block.values()
               for d in dets if not d.fake]
    page_band_h = float(np.median(heights)) if heights else 0.0

    from origami_tpu.core.baselines import extend_baselines
    out = {}
    for path, (block, detections) in det_by_block.items():
        area = text_area(
            block, avoid_obstacles="TABULAR" not in tuple(path))
        dets = [unclip_band(det, page_band_h) for det in detections]
        # one batched probe clip per block (extend_baselines) instead
        # of one _clip_line per detected line
        ext = extend_baselines(area, [(d.p, d.right, d.up)
                                      for d in dets])
        out[path] = [
            Line(block, p=p, right=right, up=det.up,
                 tesseract_data=det.data, text_area=area)
            for det, (p, right) in zip(dets, ext)]
    return out


def _any_dewarped(regions):
    for b in regions.by_path.values():
        return b.stage is not None and b.stage.is_dewarped
    return False


class FlowDetectionProcessor(Processor):
    def __init__(self, options):
        super().__init__(options)
        self._opt = options

    @property
    def processor_name(self):
        return "origami_tpu.batch.detect.flow"

    @staticmethod
    def options(f):
        opts = [
            click.option("--max-phi", type=float, default=30.0,
                         help="Max baseline angle (deg) used as sample."),
            click.option("--max-phi-std", type=float, default=0.1,
                         help="Max angle std for a trusted separator."),
            click.option("--min-line-length", type=float, default=0.05,
                         help="Min relative length of used lines."),
            click.option("--estimate-border-skew", is_flag=True,
                         default=False,
                         help="Add V samples from the page content's "
                              "side borders."),
        ]
        for o in opts:
            f = o(f)
        return f

    def artifacts(self):
        return [
            ("warped", Input(Artifact.CONTOURS, stage=Stage.WARPED)),
            ("output", Output(Artifact.FLOW, Artifact.LINES,
                              stage=Stage.WARPED)),
        ]

    def process(self, page_path, warped, output):
        page = warped.page
        geometry = page.geometry(False)
        regions = warped.regions
        separators = warped.separators

        block_lines = detect_block_lines(page, regions,
                                         separators=separators)

        max_phi = math.radians(self._opt.get("max_phi", 30.0))
        max_std = self._opt.get("max_phi_std", 0.1)
        min_len = geometry.rel_length(
            self._opt.get("min_line_length", 0.05))

        samples_h = Samples(geometry)
        samples_v = Samples(geometry)

        # separator tangents
        sep_samples = separator_angle_samples(separators)
        for (pt, phi) in sep_samples["h"]:
            if abs(phi) < max_phi:
                samples_h.append(pt, phi)
        for (pt, phi) in sep_samples["v"]:
            if abs(phi - math.pi / 2) < max_phi:
                samples_v.append(pt, phi)

        # baseline angles (H field) + orthogonals (V field)
        for path, lines in block_lines.items():
            for line in lines:
                if line.length < min_len:
                    continue
                phi = line.angle
                if abs(phi) < max_phi:
                    samples_h.append(tuple(line.center), phi)
                    samples_v.append(tuple(line.center), phi + math.pi / 2)

        if self._opt.get("estimate_border_skew"):
            from origami_tpu.core.flow import border_angle_samples
            for pt, phi in border_angle_samples(page.binarized):
                if abs(phi - math.pi / 2) < max_phi:
                    samples_v.append(pt, phi)

        # drop noisy sample sets (mixed-up separators etc.)
        if samples_h.std > max_std * 3:
            pass  # keep; the IDW field is robust to outliers

        with output.flow() as zf:
            samples_h.save(zf, "h")
            samples_v.save(zf, "v")

        with output.lines() as zf:
            zf.writestr("meta.json", json.dumps(dict(version=1)))
            for parts, lines in block_lines.items():
                for i, line in enumerate(lines):
                    zf.writestr("/".join(parts) + "/%d.json" % i,
                                json.dumps(line.info))
        return dict(n_lines=sum(map(len, block_lines.values())),
                    n_samples_h=len(samples_h),
                    n_samples_v=len(samples_v))


@click.command()
@click.argument("data_path", type=click.Path(exists=True), required=True)
@Processor.options
@FlowDetectionProcessor.options
def detect_flow(data_path, **kwargs):
    """Detect page flow and warped lines in DATA_PATH."""
    FlowDetectionProcessor(kwargs).traverse(data_path)


if __name__ == "__main__":
    detect_flow()

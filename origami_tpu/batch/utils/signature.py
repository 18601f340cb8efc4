"""utils.signature — page layout signatures for corpus clustering.

Reference contract: origami/batch/utils/signature.py (128x128 rasterized
region-layout thumbnails per predictor + grid count signature, used by
the cluster explorer tool). Rasterization runs through the geometry
raster bridge instead of Qt.
"""

from __future__ import annotations

import io as _io
import json

import click
import numpy as np
import PIL.Image

from origami_tpu import geometry as G
from origami_tpu.batch.core.processor import Processor
from origami_tpu.batch.core.io import Artifact, Input, Output, Stage


SIGNATURE_SIZE = 128
GRID_CELLS = 8


class SignatureProcessor(Processor):
    def __init__(self, options):
        super().__init__(options)

    @property
    def processor_name(self):
        return "origami_tpu.batch.utils.signature"

    def artifacts(self):
        return [
            ("input", Input(Artifact.CONTOURS, stage=Stage.RELIABLE)),
            ("output", Output(Artifact.SIGNATURE)),
        ]

    def process(self, page_path, input, output):
        page = input.page
        w, h = page.size(True)
        frame = G.raster.RasterFrame(
            (0, 0, w, h), scale=SIGNATURE_SIZE / max(w, h))

        by_pred = {}
        for parts, geom in input.contours:
            if geom.geom_type not in ("Polygon", "MultiPolygon"):
                continue
            by_pred.setdefault(parts[:2], []).append(geom)

        with output.signature() as zf:
            counts = {}
            for (pred, label), geoms in by_pred.items():
                mask = frame.zeros()
                for g in geoms:
                    G.raster.rasterize(g, frame, mask)
                im = PIL.Image.fromarray(mask * 255)
                im = im.resize((SIGNATURE_SIZE, SIGNATURE_SIZE))
                with _io.BytesIO() as buf:
                    im.save(buf, "png")
                    zf.writestr("%s.%s.png" % (pred, label),
                                buf.getvalue())
                # grid count signature: region centroid histogram
                gridc = np.zeros((GRID_CELLS, GRID_CELLS), int)
                for g in geoms:
                    c = g.centroid
                    gx = min(int(c.x / max(w, 1) * GRID_CELLS),
                             GRID_CELLS - 1)
                    gy = min(int(c.y / max(h, 1) * GRID_CELLS),
                             GRID_CELLS - 1)
                    gridc[gy, gx] += 1
                counts["%s/%s" % (pred, label)] = gridc.flatten().tolist()
            zf.writestr("signature.json", json.dumps(dict(
                version=1, size=[w, h], grid=GRID_CELLS, counts=counts)))


@click.command()
@click.argument("data_path", type=click.Path(exists=True), required=True)
@Processor.options
def signature(data_path, **kwargs):
    """Write layout signatures for pages in DATA_PATH."""
    SignatureProcessor(kwargs).traverse(data_path)


if __name__ == "__main__":
    signature()

"""One-call serving pipeline: page images in, structured text out.

`PagePipeline` drives the full nine-stage detect chain over a RAM-backed
scratch corpus (tmpfs), so callers get the batch CLIs' exact behavior —
identical artifacts, identical numerics — through a single API:

    pipe = PagePipeline(segmentation_model="heuristic", ocr_model="FAKE")
    result = pipe.process(image)          # or process_batch([...])
    result.text, result.regions, result.lines, result.page_xml

Artifact files in tmpfs cost microseconds and keep the serving path and
the batch path one code path (no drift between "server" and "batch"
outputs — the property the reference never had).
"""

from __future__ import annotations

import json
import shutil
import tempfile
import zipfile
from dataclasses import dataclass, field
from pathlib import Path

import numpy as np
import PIL.Image


def _scratch_root():
    base = Path("/dev/shm")
    if base.exists():
        return base
    return Path(tempfile.gettempdir())


@dataclass
class PageResult:
    text: str
    page_xml: bytes | None
    regions: dict = field(default_factory=dict)   # path -> wkt
    lines: dict = field(default_factory=dict)     # path -> line info
    order: list = field(default_factory=list)
    tables: dict = field(default_factory=dict)
    artifacts_dir: Path | None = None


class PagePipeline:
    def __init__(self, segmentation_model="heuristic", ocr_model="FAKE",
                 layout="bbz", page_xml=True, keep_artifacts=False,
                 stage_options=None):
        self._seg_model = segmentation_model
        self._ocr_model = ocr_model
        self._layout = layout
        self._page_xml = page_xml
        self._keep = keep_artifacts
        self._stage_options = stage_options or {}
        self._stages = None

    def _build_stages(self):
        from origami_tpu.batch.detect.segment import SegmentationProcessor
        from origami_tpu.batch.detect.contours import ContoursProcessor
        from origami_tpu.batch.detect.flow import FlowDetectionProcessor
        from origami_tpu.batch.detect.dewarp import DewarpProcessor
        from origami_tpu.batch.detect.layout import (
            LayoutDetectionProcessor)
        from origami_tpu.batch.detect.lines import LineDetectionProcessor
        from origami_tpu.batch.detect.order import ReadingOrderProcessor
        from origami_tpu.batch.detect.ocr import OCRProcessor
        from origami_tpu.batch.detect.compose import ComposeProcessor

        def opts(**extra):
            o = dict(lock_strategy="NONE", plain=True)
            o.update(self._stage_options)
            o.update(extra)
            return o

        return [
            SegmentationProcessor(self._seg_model, opts()),
            ContoursProcessor(opts()),
            FlowDetectionProcessor(opts()),
            DewarpProcessor(opts()),
            LayoutDetectionProcessor(opts(layout=self._layout)),
            LineDetectionProcessor(opts()),
            ReadingOrderProcessor(opts()),
            OCRProcessor(opts(model=self._ocr_model)),
            ComposeProcessor(opts(page_xml=self._page_xml)),
        ]

    def process(self, image, name="page0001"):
        return self.process_batch([image], names=[name])[0]

    def process_batch(self, images, names=None, overlap=None):
        """Run the full chain over a page batch.

        overlap=True (default for batches > 2) runs segmentation — the
        device-bound stage — in a feeder thread while the host-geometry
        stages consume pages as their segment.zip lands: stage
        readiness + idempotent artifacts make repeated traversals of
        the remaining stages safe, so the sweep loop simply re-runs
        them until every page composed. jax dispatch releases the GIL,
        so device and host genuinely overlap."""
        if self._stages is None:
            self._stages = self._build_stages()
        root = Path(tempfile.mkdtemp(prefix="origami_serve_",
                                     dir=_scratch_root()))
        corpus = root / "corpus"
        corpus.mkdir()
        names = names or ["page%04d" % i for i in range(len(images))]
        for img, name in zip(images, names):
            arr = np.asarray(img)
            PIL.Image.fromarray(arr).save(corpus / (name + ".png"))
        if overlap is None:
            overlap = len(images) > 2

        try:
            if overlap:
                self._run_overlapped(corpus, names)
            else:
                for stage in self._stages:
                    stage.traverse(corpus)
            results = []
            for name in names:
                results.append(self._collect(corpus, name))
            return results
        finally:
            if not self._keep:
                shutil.rmtree(root, ignore_errors=True)

    def _run_overlapped(self, corpus, names):
        import threading
        import time

        seg, rest = self._stages[0], self._stages[1:]
        err = []

        def run_seg():
            try:
                seg.traverse(corpus)
            except BaseException as e:   # surfaced in the main thread
                err.append(e)

        t = threading.Thread(target=run_seg, daemon=True)
        t.start()

        def all_done():
            return all(
                (corpus / (n + ".out") / "compose.zip").exists()
                for n in names)

        while True:
            segmenting = t.is_alive()
            for stage in rest:
                stage.traverse(corpus)
            if err:
                raise err[0]
            if all_done():
                break
            if not segmenting:
                # segmentation finished before this sweep started, so
                # that sweep saw every page — one more pass mops up
                for stage in rest:
                    stage.traverse(corpus)
                break
            time.sleep(0.05)
        t.join()

    def _collect(self, corpus, name):
        out = corpus / (name + ".out")
        text = ""
        page_xml = None
        compose = out / "compose.zip"
        if compose.exists():
            with zipfile.ZipFile(compose) as zf:
                if "page.txt" in zf.namelist():
                    text = zf.read("page.txt").decode("utf8")
                if "page.xml" in zf.namelist():
                    page_xml = zf.read("page.xml")

        regions = {}
        lines = {}
        c3 = out / "contours.3.zip"
        if c3.exists():
            with zipfile.ZipFile(c3) as zf:
                for n in zf.namelist():
                    if n.endswith(".wkt"):
                        regions[n[:-4]] = zf.read(n).decode("utf8")
        l3 = out / "lines.3.zip"
        if l3.exists():
            with zipfile.ZipFile(l3) as zf:
                for n in zf.namelist():
                    if n.endswith(".json") and n != "meta.json":
                        lines[n[:-5]] = json.loads(zf.read(n))
        order = []
        op = out / "order.json"
        if op.exists():
            order = json.loads(op.read_text())["orders"].get("*", [])
        tables = {}
        tp = out / "tables.json"
        if tp.exists():
            tables = json.loads(tp.read_text())
        return PageResult(
            text=text, page_xml=page_xml, regions=regions, lines=lines,
            order=order, tables=tables,
            artifacts_dir=out if self._keep else None)


def _main():
    import click

    @click.command()
    @click.argument("image_path", type=click.Path(exists=True),
                    required=True)
    @click.option("-m", "--model", type=str, default="heuristic")
    @click.option("--ocr-model", type=str, default="FAKE")
    @click.option("--layout", type=str, default="bbz")
    @click.option("--xml", type=click.Path(), default=None,
                  help="also write PAGE XML here")
    def serve(image_path, model, ocr_model, layout, xml):
        """Run the full pipeline on one image and print its text."""
        import PIL.Image
        img = np.asarray(PIL.Image.open(image_path).convert("L"))
        pipe = PagePipeline(segmentation_model=model,
                            ocr_model=ocr_model, layout=layout,
                            page_xml=xml is not None)
        result = pipe.process(img, name=Path(image_path).stem)
        if xml and result.page_xml:
            Path(xml).write_bytes(result.page_xml)
        click.echo(result.text)

    serve()


if __name__ == "__main__":
    _main()

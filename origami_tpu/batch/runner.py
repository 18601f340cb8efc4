"""Wave-pipelined detect-chain runner: device/host overlap for batches.

The nine detect stages split into device-bound work (segmentation,
OCR's extract+recognize chains) and host-bound work (contour/layout/
line geometry). Run strictly stage-by-stage, the chip idles during host
geometry and the (single-core) host idles during device waits. This
runner processes the corpus in WAVES of a few pages and overlaps them:

    wave i+1 segmentation  (device, side thread)
    wave i   host stages   (main thread)
    wave i-1 ocr + compose (device, side thread)

all run concurrently. jax dispatch/wait releases the GIL, so the side
threads genuinely free the host core for geometry (the bench host has
ONE core — thread overlap with device waits is the only concurrency
available). Stage processors are shared across waves, so jit caches,
device-pinned weights and page LRUs stay warm.

Artifacts, artifact formats and per-page runtime.json records are
IDENTICAL to sequential stage-by-stage traversal — the runner only
reorders page traversals, never changes them (the reference has no
counterpart; closest is origami/batch/core/processor.py's per-stage
process pool, which a 1-core host can't use).
"""

from __future__ import annotations

import threading
from pathlib import Path

from origami_tpu.core.page import is_image


def corpus_pages(path):
    import os
    pages = []
    for folder, dirs, files in os.walk(str(path)):
        folder = Path(folder)
        if folder.name.endswith(".out"):
            dirs.clear()
            continue
        dirs.sort()
        for fn in sorted(files):
            if is_image(folder / fn):
                pages.append(folder / fn)
    return pages


class PipelinedRunner:
    """stages: [(name, Processor)] in chain order; the first stage and
    the ocr/compose tail run in side threads per wave."""

    def __init__(self, stages, wave_size=3):
        names = [n for n, _ in stages]
        self._seg = [p for n, p in stages if n == "segment"]
        self._tail = [p for n, p in stages if n in ("ocr", "compose")]
        self._host = [p for n, p in stages
                      if n not in ("segment", "ocr", "compose")]
        if "segment" not in names or "ocr" not in names:
            raise ValueError("runner needs segment and ocr stages")
        self._wave = wave_size
        # three waves are alive at once (prefetch segment / host / ocr
        # tail) — size the page LRUs so cross-wave reuse never thrashes
        from origami_tpu.core import page
        page.set_cache_budget(3 * wave_size)

    def _run(self, procs, pages, errors):
        try:
            for proc in procs:
                proc.traverse(pages)
        except BaseException as e:       # surfaced by run()
            errors.append(e)

    def run(self, corpus):
        pages = corpus_pages(corpus)
        waves = [pages[i: i + self._wave]
                 for i in range(0, len(pages), self._wave)]
        if not waves:
            return
        errors = []

        def spawn(procs, wave):
            t = threading.Thread(target=self._run,
                                 args=(procs, wave, errors), daemon=True)
            t.start()
            return t

        # prologue: segment wave 0 synchronously
        self._run(self._seg, waves[0], errors)
        tail_t = None
        seg_t = None
        for i, wave in enumerate(waves):
            if errors:
                break
            # device side threads: segment the NEXT wave, ocr+compose
            # the PREVIOUS wave — both overlap this wave's host stages
            if i + 1 < len(waves):
                seg_t = spawn(self._seg, waves[i + 1])
            for proc in self._host:
                proc.traverse(wave)
            if tail_t is not None:
                tail_t.join()
            tail_t = spawn(self._tail, wave)
            if seg_t is not None:
                seg_t.join()
                seg_t = None
        if tail_t is not None:
            tail_t.join()
        if errors:
            raise errors[0]

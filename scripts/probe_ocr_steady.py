"""Probe: is the OCR stage's extract_dispatch budget compile or compute?

Builds a 6-page synthetic corpus through segment..order once, then runs
the OCR stage THREE times in one process (deleting ocr.zip between
runs). Run 1 pays in-process jit compiles; runs 2-3 are the warm steady
state. The per-run prof spans separate the two.
"""

import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from origami_tpu.parallel.cache import ensure_compilation_cache


def main():
    ensure_compilation_cache()
    from origami_tpu.batch.core import prof
    prof.enabled = True

    import PIL.Image
    from origami_tpu.train.synth import render_page
    import bench

    work = Path(tempfile.mkdtemp(prefix="origami_probe_"))
    try:
        corpus = work / "corpus"
        corpus.mkdir(parents=True)
        for i in range(6):
            page = render_page(93_000_000 + i)
            PIL.Image.fromarray(page.image).save(
                str(corpus / ("p%04d.png" % i)))

        trained = bench._find_trained_models()
        students_dir, rec_dir = trained
        stages = bench._stages(rec_dir, seg_model=students_dir,
                               seg_target="speed")
        for name, proc in stages:
            if name == "ocr":
                break
            t0 = time.perf_counter()
            proc.traverse(corpus)
            print("prep %-10s %.2f s" % (name, time.perf_counter() - t0),
                  flush=True)
        ocr = dict(stages)["ocr"]
        pred = ocr._get_predictor()
        if hasattr(pred, "warm_buckets"):
            t0 = time.perf_counter()
            pred.warm_buckets()
            print("warm_buckets %.2f s" % (time.perf_counter() - t0),
                  flush=True)

        for run in range(3):
            for out in corpus.glob("*.out"):
                for a in ("ocr.zip",):
                    p = out / a
                    if p.exists():
                        p.unlink()
            prof.reset()
            t0 = time.perf_counter()
            ocr.traverse(corpus)
            dt = time.perf_counter() - t0
            print("== ocr run %d: %.2f s/6 pages" % (run, dt), flush=True)
            for k, (s, cnt) in prof.snapshot().items():
                print("   %-40s %8.3f s  x%d" % (k, s, cnt), flush=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()

"""Steady-state phase profile of the OCR stage on the real chip.

Reproduces bench.py's end-to-end setup (same synth corpora/seeds), warms
every compile on a first corpus, then profiles the OCR stage on the
second corpus with ORIGAMI_PROF spans.
"""
import os
import sys
import time
import pathlib
import tempfile

os.environ.setdefault("ORIGAMI_PROF", "1")
sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import PIL.Image  # noqa: E402


def make_corpus(root, n_pages, seed):
    from origami_tpu.train.synth import render_page
    root.mkdir(parents=True, exist_ok=True)
    for i in range(n_pages):
        PIL.Image.fromarray(render_page(seed + i).image).save(
            str(root / ("p%04d.png" % i)))


def main():
    from origami_tpu.batch.core import prof
    from origami_tpu.models import registry
    from origami_tpu.train.synth import CHARSET
    import bench

    n_pages = int(os.environ.get("N_PAGES", "6"))
    work = pathlib.Path(tempfile.mkdtemp(prefix="origami_profocr_"))
    rec_dir = work / "recognizer"
    registry.init_and_save(rec_dir, dict(
        kind="recognizer", charset=CHARSET, height=48,
        conv_features=[64, 128, 256], lstm_features=256, version=1))

    stages = bench._stages(rec_dir)
    for i, seed in enumerate((92_000_000, 93_000_000)):
        corpus = work / ("corpus%d" % i)
        make_corpus(corpus, n_pages, seed=seed)
        if i == 1:
            prof.reset()
        for name, proc in stages:
            t0 = time.perf_counter()
            proc.traverse(corpus)
            dt = time.perf_counter() - t0
            if i == 1:
                print("%-10s %6.2f s" % (name, dt), flush=True)
    print("--- steady-state spans (corpus1) ---")
    prof.report(out=sys.stdout)


if __name__ == "__main__":
    main()

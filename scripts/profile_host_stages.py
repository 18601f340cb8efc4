"""cProfile the host-heavy stages (flow/layout/lines) at steady state.

Bench-identical corpora; corpus0 warms compiles, corpus1 is profiled.
Set STAGES=flow,layout,lines (default) to choose.
"""
import cProfile
import io
import os
import pstats
import sys
import time
import pathlib
import tempfile

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import PIL.Image  # noqa: E402


def make_corpus(root, n_pages, seed):
    from origami_tpu.train.synth import render_page
    root.mkdir(parents=True, exist_ok=True)
    for i in range(n_pages):
        PIL.Image.fromarray(render_page(seed + i).image).save(
            str(root / ("p%04d.png" % i)))


def main():
    if os.environ.get("PLATFORM"):
        import jax
        jax.config.update("jax_platforms", os.environ["PLATFORM"])
    import bench
    from origami_tpu.models import registry
    from origami_tpu.train.synth import CHARSET

    profiled = os.environ.get("STAGES", "flow,layout,lines").split(",")
    n_pages = int(os.environ.get("N_PAGES", "6"))
    work = pathlib.Path(tempfile.mkdtemp(prefix="origami_profhost_"))
    rec_dir = work / "recognizer"
    registry.init_and_save(rec_dir, dict(
        kind="recognizer", charset=CHARSET, height=48,
        conv_features=[64, 128, 256], lstm_features=256, version=1))
    stages = bench._stages(rec_dir)

    for i, seed in enumerate((92_000_000, 93_000_000)):
        corpus = work / ("corpus%d" % i)
        make_corpus(corpus, n_pages, seed=seed)
        for name, proc in stages:
            t0 = time.perf_counter()
            if i == 1 and name in profiled:
                pr = cProfile.Profile()
                pr.enable()
                proc.traverse(corpus)
                pr.disable()
                dt = time.perf_counter() - t0
                s = io.StringIO()
                ps = pstats.Stats(pr, stream=s)
                ps.sort_stats("cumulative").print_stats(28)
                print("##### %s  %.2f s" % (name, dt), flush=True)
                # keep only the table
                lines = s.getvalue().splitlines()
                for ln in lines:
                    if ln.strip():
                        print(ln)
            else:
                proc.traverse(corpus)
                if i == 1:
                    print("%-10s %6.2f s" %
                          (name, time.perf_counter() - t0), flush=True)


if __name__ == "__main__":
    main()

"""Profile the host-geometry stages on a bench-identical corpus.

Runs the detect chain over synthetic newspaper pages (train.synth, the
same generator bench.py uses) with the trained student segmenters, and
wraps each HOST stage (contours/flow/layout/lines/order) in cProfile.
Prints the top functions by cumulative time per stage.

Usage:
    python scripts/profile_host_stages.py [n_pages] [top_n]
"""
import cProfile
import io
import pstats
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

N_PAGES = int(sys.argv[1]) if len(sys.argv) > 1 else 6
TOP_N = int(sys.argv[2]) if len(sys.argv) > 2 else 25

from bench import _find_trained_models, _make_corpus, _stages  # noqa: E402

HOST_STAGES = {"contours", "flow", "layout", "lines", "order"}


def main():
    # a persistent workdir (ORIGAMI_PROF_WORK) lets an interrupted run
    # resume: completed stages are skipped via runtime.json idempotence
    import os
    wd = os.environ.get("ORIGAMI_PROF_WORK")
    work = Path(wd) if wd else Path(tempfile.mkdtemp(prefix="origami_prof_"))
    work.mkdir(parents=True, exist_ok=True)
    trained = _find_trained_models()
    assert trained is not None, "trained models required"
    students_dir, rec_dir = trained
    stages = _stages(rec_dir, seg_model=students_dir, seg_target="speed")
    # warmup pass absorbs jit compiles
    warm = work / "warmup"
    _make_corpus(warm, 2, seed=91_000_000)
    for name, proc in stages:
        proc.traverse(warm)

    corpus = work / "corpus"
    _make_corpus(corpus, N_PAGES, seed=92_000_000)
    for name, proc in stages:
        t0 = time.perf_counter()
        if name in HOST_STAGES and TOP_N > 0:
            pr = cProfile.Profile()
            pr.enable()
            proc.traverse(corpus)
            pr.disable()
            dt = time.perf_counter() - t0
            buf = io.StringIO()
            ps = pstats.Stats(pr, stream=buf)
            ps.sort_stats("cumulative").print_stats(TOP_N)
            print("=" * 72)
            print("STAGE %s: %.2f s / %d pages" % (name, dt, N_PAGES))
            # drop the preamble noise, keep the table
            lines = buf.getvalue().splitlines()
            start = next(i for i, ln in enumerate(lines)
                         if ln.lstrip().startswith("ncalls"))
            print("\n".join(lines[start - 1:start + TOP_N + 1]))
        else:
            proc.traverse(corpus)
            dt = time.perf_counter() - t0
            print("=" * 72)
            print("STAGE %s: %.2f s / %d pages (not profiled)"
                  % (name, dt, N_PAGES))
        sys.stdout.flush()


if __name__ == "__main__":
    main()

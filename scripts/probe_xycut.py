"""Trace the XY-cut decision tree the order stage takes on one page.

Wraps core.xycut._cut_idx to print, per recursion node (depth<=3), the
chosen cut (axis/score) and the best candidate on the OTHER axis, so a
wrong region order (diagnose_order.py) can be attributed to a concrete
gap-vs-gap scoring decision.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python \
    scripts/probe_xycut.py /tmp/order_diag/val synth0003
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")

    corpus = Path(sys.argv[1])
    stem = sys.argv[2]

    out = corpus / (stem + ".out")
    (out / "order.json").unlink(missing_ok=True)
    # order must rerun: drop its runtime record
    import json
    rt_path = out / "runtime.json"
    rt = json.loads(rt_path.read_text())
    rt.pop("origami_tpu.batch.detect.order", None)
    rt_path.write_text(json.dumps(rt))

    from origami_tpu.core import xycut

    orig = xycut._cut_idx
    depth = [0]

    def traced(items, bounds, idx, score, eps, min_extent):
        if depth[0] <= 3 and len(idx) > 1:
            cands = (xycut._axis_candidates(bounds, idx, 0, score, eps,
                                            min_extent)
                     + xycut._axis_candidates(bounds, idx, 1, score, eps,
                                              min_extent))
            if cands:
                best = max(cands, key=lambda c: c[0])
                by_axis = {}
                for c in cands:
                    if c[0] > by_axis.get(c[2], (-1e18,))[0]:
                        by_axis[c[2]] = c
                names = [str(items[i].name) for i in idx]
                print("depth=%d n=%d chose axis=%d x=%.0f score=%.1f ov=%s"
                      % (depth[0], len(idx), best[2], best[1], best[0],
                         best[3]))
                for ax, c in sorted(by_axis.items()):
                    print("   best[axis=%d] x=%.0f score=%.1f ov=%s"
                          % (ax, c[1], c[0], c[3]))
                if depth[0] <= 1:
                    import os
                    if os.environ.get("PROBE_BOUNDS"):
                        for i in idx:
                            b = bounds[i]
                            print("   item %-28s %5.0f %5.0f %5.0f %5.0f"
                                  % (items[i].name, *b))
                    else:
                        print("   items:", names[:12],
                              "..." if len(names) > 12 else "")
        depth[0] += 1
        try:
            return orig(items, bounds, idx, score, eps, min_extent)
        finally:
            depth[0] -= 1

    xycut._cut_idx = traced

    from origami_tpu.batch.detect.order import ReadingOrderProcessor
    proc = ReadingOrderProcessor(dict(lock_strategy="NONE", plain=True))
    proc.traverse(corpus)


if __name__ == "__main__":
    main()

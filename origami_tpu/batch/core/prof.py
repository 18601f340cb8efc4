"""Lightweight span profiler for the batch stages.

Enabled by setting ``ORIGAMI_PROF=1``; disabled it costs one dict
lookup per span. Usage::

    from origami_tpu.batch.core.prof import span, report
    with span("ocr.extract"):
        ...
    report()   # prints accumulated seconds + call counts per key

Spans nest; each key accumulates wall seconds and call count for the
process lifetime (``reset()`` clears).
"""

from __future__ import annotations

import os
import time
from contextlib import contextmanager

enabled = os.environ.get("ORIGAMI_PROF") == "1"
_acc: dict[str, list[float]] = {}


@contextmanager
def span(key):
    if not enabled:
        yield
        return
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        slot = _acc.setdefault(key, [0.0, 0])
        slot[0] += dt
        slot[1] += 1


def add(key, seconds, n=1):
    if enabled:
        slot = _acc.setdefault(key, [0.0, 0])
        slot[0] += seconds
        slot[1] += n


def reset():
    _acc.clear()


def snapshot():
    return {k: (round(v[0], 3), v[1]) for k, v in sorted(_acc.items())}


def report(out=None):
    import sys
    out = out or sys.stderr
    for k, (s, n) in snapshot().items():
        print("%-40s %8.3f s  x%d" % (k, s, n), file=out)

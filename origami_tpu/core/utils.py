"""Small shared utilities."""

from __future__ import annotations

import ast
import re


def build_func_from_string(spec, funcs):
    """Parse a mini-DSL spec like "sauvola(window_size=15)" or "otsu" into
    a configured callable (reference behavior: origami/core/utils.py:13-27,
    used for binarizers and layout hull specs)."""
    spec = spec.strip()
    m = re.match(r"^([A-Za-z_][A-Za-z0-9_]*)(\((.*)\))?$", spec, re.S)
    if not m:
        raise ValueError("cannot parse spec %r" % spec)
    name = m.group(1)
    if name not in funcs:
        raise ValueError("unknown function %r (have %s)"
                         % (name, sorted(funcs)))
    args = []
    kwargs = {}
    body = m.group(3)
    if body and body.strip():
        tree = ast.parse("f(%s)" % body, mode="eval")
        call = tree.body
        for a in call.args:
            args.append(ast.literal_eval(a))
        for k in call.keywords:
            kwargs[k.arg] = ast.literal_eval(k.value)
    return lambda *a, **kw: funcs[name](*args, *a, **kwargs, **kw)


class elapsed_timer:
    """Context manager yielding a callable that reports elapsed seconds
    (reference: origami/core/time.py:6-13)."""

    def __enter__(self):
        import time
        self._t0 = time.perf_counter()
        self._t1 = None
        return lambda: (self._t1 or time.perf_counter()) - self._t0

    def __exit__(self, *exc):
        import time
        self._t1 = time.perf_counter()
        return False

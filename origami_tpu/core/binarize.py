"""Host-facing binarization API backed by the device kernels.

Spec-string construction ("sauvola(window_size=15)") follows the
reference's mini-DSL for pluggable binarizers
(origami/core/binarize.py:38-43, origami/core/utils.py:13-27).
"""

from __future__ import annotations

import numpy as np

from origami_tpu.core.utils import build_func_from_string


def _to_device(pixels):
    import jax.numpy as jnp
    return jnp.asarray(np.asarray(pixels))


def sauvola(window_size=15, k=0.2):
    from origami_tpu.ops.binarize import sauvola as _sauvola

    def run(image):
        out = np.asarray(_sauvola(_to_device(image), int(window_size), k))
        return (out.astype(np.uint8)) * 255
    return run


def otsu():
    from origami_tpu.ops.binarize import otsu as _otsu

    def run(image):
        out = np.asarray(_otsu(_to_device(image)))
        return (out.astype(np.uint8)) * 255
    return run


def from_string(spec):
    return build_func_from_string(spec, dict(otsu=otsu, sauvola=sauvola))()

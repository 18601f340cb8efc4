"""Device morphology: dilate/erode/open/close and thinning.

Replaces the reference's cv2.morphologyEx / skimage.morphology usage in
contour and skeleton extraction (origami/core/contours.py,
origami/core/skeleton.py:117-141). reduce_window lowers straight onto the
VPU; the Zhang-Suen thinning loop is a fixed-point lax.while_loop.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax


@functools.partial(jax.jit, static_argnums=(1,))
def dilate(mask, size=3):
    """Binary/gray dilation with a (size x size) square element."""
    x = mask.astype(jnp.float32)
    out = lax.reduce_window(x, -jnp.inf, lax.max, (size, size), (1, 1), "SAME")
    return out.astype(mask.dtype) if mask.dtype != jnp.bool_ else out > 0


@functools.partial(jax.jit, static_argnums=(1,))
def erode(mask, size=3):
    x = mask.astype(jnp.float32)
    out = lax.reduce_window(x, jnp.inf, lax.min, (size, size), (1, 1), "SAME")
    return out.astype(mask.dtype) if mask.dtype != jnp.bool_ else out > 0


@functools.partial(jax.jit, static_argnums=(1,))
def opening(mask, size=3):
    return dilate(erode(mask, size), size)


@functools.partial(jax.jit, static_argnums=(1,))
def closing(mask, size=3):
    return erode(dilate(mask, size), size)


def _neighbors(img):
    """The 8 neighbours of every pixel, zero-padded, in Zhang-Suen order
    P2..P9 (N, NE, E, SE, S, SW, W, NW)."""
    z = jnp.pad(img, 1)
    h, w = img.shape
    def sh(dy, dx):
        return lax.dynamic_slice(z, (1 + dy, 1 + dx), (h, w))
    return [sh(-1, 0), sh(-1, 1), sh(0, 1), sh(1, 1),
            sh(1, 0), sh(1, -1), sh(0, -1), sh(-1, -1)]


def _zs_subiter(img, step):
    p = _neighbors(img)
    b = sum(p)
    ring = p + p[:1]
    a = sum(jnp.logical_and(ring[i] == 0, ring[i + 1] == 1).astype(jnp.int32)
            for i in range(8))
    c1 = (b >= 2) & (b <= 6) & (a == 1)
    p2, p3, p4, p5, p6, p7, p8, p9 = p
    if step == 0:
        c2 = (p2 * p4 * p6 == 0) & (p4 * p6 * p8 == 0)
    else:
        c2 = (p2 * p4 * p8 == 0) & (p2 * p6 * p8 == 0)
    remove = (img == 1) & c1 & c2
    return img * (1 - remove.astype(img.dtype))


@functools.partial(jax.jit, static_argnums=(1,))
def skeletonize(mask, max_iter=128):
    """Zhang-Suen thinning to a 1-px skeleton. Fixed-point while_loop with
    a static iteration cap (each iteration peels one boundary layer, so
    max_iter bounds the half-width of shapes fully thinned)."""
    img0 = (mask > 0).astype(jnp.int32)

    def cond(state):
        img, prev, i = state
        return (i < max_iter) & jnp.any(img != prev)

    def body(state):
        img, _, i = state
        nxt = _zs_subiter(_zs_subiter(img, 0), 1)
        return nxt, img, i + 1

    out, _, _ = lax.while_loop(cond, body, (img0, img0 - 1, 0))
    return out > 0


@jax.jit
def label_edt(mask):
    """Approximate Euclidean distance transform via separable two-pass
    chamfer on device (used for separator width estimation; reference uses
    scipy EDT in origami/core/skeleton.py:160)."""
    big = 1e6
    d = jnp.where(mask > 0, 0.0, big)

    def scan_dir(d, axis, reverse):
        def f(carry, row):
            c = jnp.minimum(row, carry + 1.0)
            return c, c
        x = d if axis == 0 else d.T
        if reverse:
            x = x[::-1]
        _, out = lax.scan(f, jnp.full((x.shape[1],), big), x)
        if reverse:
            out = out[::-1]
        return out if axis == 0 else out.T

    for axis in (0, 1):
        for rev in (False, True):
            d = jnp.minimum(d, scan_dir(d, axis, rev))
    return d

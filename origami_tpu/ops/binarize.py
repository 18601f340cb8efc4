"""Device binarization: Otsu and Sauvola thresholding.

The reference binarizes with scikit-image's threshold_sauvola/threshold_otsu
on host (origami/core/binarize.py:11-43). Here both are expressed as XLA
graphs over the page tensor: Sauvola's windowed mean/std come from integral
images (two cumsums + four gathers — O(N) and bandwidth-bound, which XLA
fuses well); Otsu is a 256-bin histogram scan.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _integral(img):
    """Summed-area table with a leading zero row/col: S[y, x] = sum of
    img[:y, :x]."""
    s = jnp.cumsum(jnp.cumsum(img, axis=0), axis=1)
    return jnp.pad(s, ((1, 0), (1, 0)))


def _window_sums(integral, window):
    """Sum over a centered (window x window) box per pixel, with edge clamp."""
    h = integral.shape[0] - 1
    w = integral.shape[1] - 1
    r = window // 2
    ys = jnp.arange(h)
    xs = jnp.arange(w)
    y0 = jnp.clip(ys - r, 0, h)
    y1 = jnp.clip(ys + r + 1, 0, h)
    x0 = jnp.clip(xs - r, 0, w)
    x1 = jnp.clip(xs + r + 1, 0, w)
    a = integral[y0][:, x0]
    b = integral[y0][:, x1]
    c = integral[y1][:, x0]
    d = integral[y1][:, x1]
    counts = (y1 - y0)[:, None] * (x1 - x0)[None, :]
    return d - b - c + a, counts


@functools.partial(jax.jit, static_argnums=(1,))
def sauvola_threshold(image, window_size=15, k=0.2, r=128.0):
    """Per-pixel Sauvola threshold T = m * (1 + k ((s / r) - 1))."""
    img = image.astype(jnp.float32)
    s1, counts = _window_sums(_integral(img), window_size)
    s2, _ = _window_sums(_integral(img * img), window_size)
    counts = counts.astype(jnp.float32)
    mean = s1 / counts
    var = jnp.maximum(s2 / counts - mean * mean, 0.0)
    std = jnp.sqrt(var)
    return mean * (1.0 + k * ((std / r) - 1.0))


@functools.partial(jax.jit, static_argnums=(1,))
def sauvola(image, window_size=15, k=0.2, r=128.0):
    """Binarize: True where pixel > threshold (ink=False, paper=True)."""
    t = sauvola_threshold(image, window_size, k, r)
    return image.astype(jnp.float32) > t


@jax.jit
def otsu_threshold(image):
    """Otsu's method over a 256-bin histogram (image in [0, 255])."""
    img = image.astype(jnp.float32)
    hist = jnp.histogram(img, bins=256, range=(0.0, 256.0))[0].astype(jnp.float32)
    total = jnp.sum(hist)
    bins = jnp.arange(256, dtype=jnp.float32)
    w0 = jnp.cumsum(hist)
    w1 = total - w0
    sum0 = jnp.cumsum(hist * bins)
    sum_all = sum0[-1]
    m0 = sum0 / jnp.maximum(w0, 1e-6)
    m1 = (sum_all - sum0) / jnp.maximum(w1, 1e-6)
    between = w0 * w1 * (m0 - m1) ** 2
    valid = (w0 > 0) & (w1 > 0)
    between = jnp.where(valid, between, -1.0)
    return jnp.argmax(between).astype(jnp.float32)


@jax.jit
def otsu(image):
    t = otsu_threshold(image)
    return image.astype(jnp.float32) > t

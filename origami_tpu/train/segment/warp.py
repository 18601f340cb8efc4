"""Synthetic page-warp augmentation on device.

Counterpart of the reference's page_dewarp-derived cubic-sheet warping
(origami/train/segment/gen/warp.py): training images and label maps are
deformed by a smooth random displacement field so the segmentation nets
learn warp robustness. Here the field is a low-frequency random spline
surface evaluated and applied fully on device (bilinear remap for the
image, nearest for labels) — one jit graph per augmentation batch.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("shape",))
def _displacement_field(key, shape, cells=4, amplitude=12.0):
    """Smooth random (H, W, 2) displacement: random coarse grid upsampled
    bilinearly (the continuous analogue of a bent cubic sheet)."""
    h, w = shape
    k1, k2 = jax.random.split(key)
    coarse = jax.random.normal(k1, (cells + 1, cells + 1, 2)) * amplitude
    # zero displacement at the page border so content stays inside
    coarse = coarse.at[0].set(0).at[-1].set(0)
    coarse = coarse.at[:, 0].set(0).at[:, -1].set(0)
    field = jax.image.resize(coarse, (h, w, 2), method="linear")
    return field


@functools.partial(jax.jit, static_argnames=())
def warp_pair(key, image, labels, amplitude=12.0):
    """Warp an image (H, W) and its label map (H, W) with one shared
    random field. Returns (image', labels')."""
    from origami_tpu.ops.remap import bilinear_sample
    h, w = image.shape
    field = _displacement_field(key, (h, w), amplitude=amplitude)
    ys, xs = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    coords = jnp.stack([xs + field[..., 0], ys + field[..., 1]], axis=-1)
    im2 = bilinear_sample(image.astype(jnp.float32), coords, fill=255.0)
    # nearest sampling for labels
    xi = jnp.clip(jnp.round(coords[..., 0]).astype(jnp.int32), 0, w - 1)
    yi = jnp.clip(jnp.round(coords[..., 1]).astype(jnp.int32), 0, h - 1)
    lab2 = labels[yi, xi]
    return im2, lab2


class WarpAugmentation:
    def __init__(self, amplitude=12.0, seed=0):
        self._amplitude = amplitude
        self._key = jax.random.PRNGKey(seed)

    def __call__(self, image, labels):
        self._key, sub = jax.random.split(self._key)
        im2, lab2 = warp_pair(sub, jnp.asarray(image), jnp.asarray(labels),
                              self._amplitude)
        return (np.clip(np.asarray(im2), 0, 255).astype(np.uint8),
                np.asarray(lab2))

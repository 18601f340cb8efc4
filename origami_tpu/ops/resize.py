"""Device image resizing.

Replaces the reference's cv2.resize calls (INTER_AREA for network input,
origami/core/predict.py:266; INTER_LINEAR/INTER_AREA elsewhere) with
jit-compatible JAX ops. Downscaling uses an anti-aliased linear filter
(the continuous analogue of INTER_AREA's box average — equivalent for the
mask-IoU purposes of this pipeline); upscaling is plain bilinear.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnums=(1, 2))
def resize(image, out_hw, method="area"):
    """Resize HW or HWC image to `out_hw` (static shape).

    method: "area" (anti-aliased, for downscale), "linear", "nearest".
    """
    squeeze = False
    if image.ndim == 2:
        image = image[..., None]
        squeeze = True
    h, w = out_hw
    if method == "area":
        out = jax.image.resize(
            image.astype(jnp.float32), (h, w, image.shape[-1]),
            method="linear", antialias=True)
    elif method == "linear":
        out = jax.image.resize(
            image.astype(jnp.float32), (h, w, image.shape[-1]),
            method="linear", antialias=False)
    elif method == "nearest":
        out = jax.image.resize(image, (h, w, image.shape[-1]),
                               method="nearest")
    else:
        raise ValueError(method)
    if squeeze:
        out = out[..., 0]
    return out


@functools.partial(jax.jit, static_argnums=(1, 2))
def resize_batch(images, out_hw, method="area"):
    """Resize a batch (N, H, W[, C]) on device with one vmapped graph."""
    return jax.vmap(lambda im: resize(im, out_hw, method))(images)


def resize_labels(labels, out_hw):
    """Nearest-neighbour resize for integer label maps (palette PNGs)."""
    return resize(labels, out_hw, method="nearest")

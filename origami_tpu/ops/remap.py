"""Device remap / grid sampling.

The workhorse behind dewarping (reference: cv2.remap over the full-res
dewarp grid, origami/core/dewarp.py:608-627) and line-strip extraction
(origami/core/block.py:223-259). Implemented as a bilinear gather that XLA
lowers to vectorized dynamic-slices; a Pallas variant with explicit VMEM
blocking lives in ops/pallas/remap.py for the hot batched path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@jax.jit
def bilinear_sample(image, coords, fill=0.0):
    """Sample `image` (H, W) at float `coords` (..., 2) given as (x, y).

    Out-of-bounds samples return `fill`. Returns array shaped like
    coords[..., 0].
    """
    img = image.astype(jnp.float32)
    h, w = img.shape
    x = coords[..., 0]
    y = coords[..., 1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    tx = x - x0
    ty = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def gather(yi, xi):
        yc = jnp.clip(yi, 0, h - 1)
        xc = jnp.clip(xi, 0, w - 1)
        return img[yc, xc]

    v00 = gather(y0i, x0i)
    v01 = gather(y0i, x0i + 1)
    v10 = gather(y0i + 1, x0i)
    v11 = gather(y0i + 1, x0i + 1)
    top = v00 * (1 - tx) + v01 * tx
    bot = v10 * (1 - tx) + v11 * tx
    out = top * (1 - ty) + bot * ty

    inb = (x >= 0) & (x <= w - 1) & (y >= 0) & (y <= h - 1)
    return jnp.where(inb, out, fill)


@jax.jit
def remap(image, map_xy, fill=0.0):
    """cv2.remap equivalent: map_xy (H', W', 2) holds source (x, y) per
    output pixel."""
    return bilinear_sample(image, map_xy, fill)


@jax.jit
def remap_batch(images, maps_xy, fill=0.0):
    """Batched remap: images (N, H, W), maps (N, H', W', 2)."""
    return jax.vmap(lambda im, m: bilinear_sample(im, m, fill))(images, maps_xy)


@functools.partial(jax.jit, static_argnums=(2,))
def affine_warp(image, matrix, out_hw, fill=0.0):
    """Inverse-map affine warp: `matrix` (2, 3) maps OUTPUT (x, y, 1) to
    source coordinates (like cv2.warpAffine with WARP_INVERSE_MAP)."""
    h, w = out_hw
    ys, xs = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    src_x = matrix[0, 0] * xs + matrix[0, 1] * ys + matrix[0, 2]
    src_y = matrix[1, 0] * xs + matrix[1, 1] * ys + matrix[1, 2]
    return bilinear_sample(image, jnp.stack([src_x, src_y], axis=-1), fill)


def invert_affine(matrix):
    """Invert a (2, 3) forward affine into the inverse-map form."""
    m = jnp.asarray(matrix, dtype=jnp.float32)
    a = m[:, :2]
    t = m[:, 2]
    ai = jnp.linalg.inv(a)
    ti = -ai @ t
    return jnp.concatenate([ai, ti[:, None]], axis=1)


@functools.partial(jax.jit, static_argnums=(3, 4))
def extract_line_strips(image, frames, heights, out_h, out_w, fill=255.0):
    """Batched oriented line-strip extraction.

    For each line i, `frames` (N, 2, 3) is an affine mapping output strip
    pixel (x, y, 1) -> source page (x, y); `heights` (N,) unused here but
    kept for masking. Returns (N, out_h, out_w) strips.

    This is the TPU-native replacement for the reference's per-line
    cv2.warpAffine/remap loop over an 8-way thread pool
    (origami/batch/core/lines.py:148, origami/core/block.py:129-143).
    """
    ys, xs = jnp.meshgrid(jnp.arange(out_h, dtype=jnp.float32),
                          jnp.arange(out_w, dtype=jnp.float32), indexing="ij")

    def one(frame):
        sx = frame[0, 0] * xs + frame[0, 1] * ys + frame[0, 2]
        sy = frame[1, 0] * xs + frame[1, 1] * ys + frame[1, 2]
        return bilinear_sample(image, jnp.stack([sx, sy], axis=-1), fill)

    return jax.vmap(one)(frames)

"""Overlapping tile layout + device tile batch extraction/merging.

The segmentation nets run on fixed-size tiles cut from the resized page
with a guaranteed minimum overlap; each tile "owns" an inner region whose
boundaries sit midway between neighbouring tile edges, and the label map is
stitched from the inner regions (reference semantics: origami/core/
predict.py:66-113, tile 1280x896 over 1280x2400 with beta0=50).

Tile boxes are static Python data (shapes must be static under jit); the
extraction and stitch are single device ops over a (T, th, tw, C) batch.
"""

from __future__ import annotations


import itertools
import math

import jax
import jax.numpy as jnp
import numpy as np


def _axis_tiles(full, tile, beta0):
    """1-D tile layout: returns list of ((outer0, outer1), (inner0, inner1)).

    Chooses the smallest number of tiles such that consecutive tiles overlap
    by at least `beta0` pixels; inner boundaries are midpoints of the
    overlaps.
    """
    if tile >= full:
        return [((0, full), (0, full))]
    n = math.ceil(full / tile)
    # increase tile count until overlap >= beta0
    while True:
        if n == 1:
            break
        step = (full - tile) / (n - 1)
        if tile - step >= beta0:
            break
        n += 1
    starts = []
    for i in range(n):
        s = round(i * (full - tile) / max(n - 1, 1))
        s = min(s, full - tile)
        starts.append(s)
    out = []
    for i, s in enumerate(starts):
        o0, o1 = s, s + tile
        i0 = 0 if i == 0 else (starts[i - 1] + tile + s) // 2
        i1 = full if i == n - 1 else (o1 + starts[i + 1]) // 2
        out.append(((o0, o1), (i0, i1)))
    return out


class TileLayout:
    """Static tile layout over a (W, H) canvas with (tw, th) tiles."""

    def __init__(self, full_size, tile_size, beta0=50):
        self.full_size = tuple(full_size)    # (W, H)
        self.tile_size = tuple(tile_size)    # (tw, th)
        self.beta0 = beta0
        xs = _axis_tiles(full_size[0], tile_size[0], beta0)
        ys = _axis_tiles(full_size[1], tile_size[1], beta0)
        self.tiles = []
        for (yo, yi), (xo, xi) in itertools.product(ys, xs):
            self.tiles.append(dict(
                outer=(xo[0], yo[0], xo[1], yo[1]),
                inner=(xi[0], yi[0], xi[1], yi[1])))

    def __len__(self):
        return len(self.tiles)

    @property
    def outer_origins(self):
        return np.array([[t["outer"][1], t["outer"][0]] for t in self.tiles],
                        dtype=np.int32)  # (T, 2) as (y, x)

    def extract(self, image):
        """Cut the (H, W, C) image into a (T, th, tw, C) tile batch."""
        tw, th = self.tile_size
        origins = jnp.asarray(self.outer_origins)

        def cut(o):
            return jax.lax.dynamic_slice(
                image, (o[0], o[1], 0), (th, tw, image.shape[-1]))
        return jax.vmap(cut)(origins)

    def stitch_labels(self, tile_labels):
        """Merge per-tile label maps (T, th, tw) into the (H, W) label map,
        each tile writing only its inner region."""
        W, H = self.full_size
        out = jnp.zeros((H, W), dtype=tile_labels.dtype)
        for i, t in enumerate(self.tiles):
            x0, y0, x1, y1 = t["inner"]
            ox0, oy0 = t["outer"][0], t["outer"][1]
            piece = jax.lax.dynamic_slice(
                tile_labels[i], (y0 - oy0, x0 - ox0), (y1 - y0, x1 - x0))
            out = jax.lax.dynamic_update_slice(out, piece, (y0, x0))
        return out

    def stitch_logits(self, tile_logits, num_classes):
        """Merge per-tile logits (T, th, tw, C) into (H, W, C), inner
        regions only (for downstream softmax voting across models)."""
        W, H = self.full_size
        out = jnp.zeros((H, W, num_classes), dtype=tile_logits.dtype)
        for i, t in enumerate(self.tiles):
            x0, y0, x1, y1 = t["inner"]
            ox0, oy0 = t["outer"][0], t["outer"][1]
            piece = jax.lax.dynamic_slice(
                tile_logits[i], (y0 - oy0, x0 - ox0, 0),
                (y1 - y0, x1 - x0, num_classes))
            out = jax.lax.dynamic_update_slice(out, piece, (y0, x0, 0))
        return out

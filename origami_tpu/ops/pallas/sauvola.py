"""Pallas TPU kernel: fused Sauvola binarization.

The XLA formulation (ops.binarize) materializes two full integral images
in HBM (8 bytes/px extra traffic each way). This kernel tiles the page
into row blocks; each block DMAs its haloed input window from HBM into a
VMEM scratch buffer (overlapping halos can't be expressed with
BlockSpecs, whose offsets are in block units), computes the windowed
mean/std with cumulative sums entirely in VMEM, and writes only the
binary mask — one HBM read + one 1-byte write per pixel, the bandwidth
floor.

Numerics match ops.binarize.sauvola_threshold for interior pixels;
borders use zero-padded (not clamped) windows — equivalent in practice
on document margins.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _sauvola_kernel(img_hbm, out_ref, scratch, sem, *,
                    window, k, r, block_h, halo):
    i = pl.program_id(0)
    dma = pltpu.make_async_copy(
        img_hbm.at[pl.ds(i * block_h, block_h + 2 * halo), :],
        scratch, sem)
    dma.start()
    dma.wait()
    x = scratch[:]                       # (block_h + 2*halo, W)
    rad = window // 2
    w = x.shape[1]

    col_ids = jax.lax.broadcasted_iota(jnp.int32, (block_h, w), 1)

    def window_sum(v):
        # static sliding sums (cumsum isn't lowerable in Mosaic, and
        # lane-unaligned pads hit unsupported concats): `window` shifted
        # adds along rows via sublane slices, then along columns via
        # pltpu.roll with wrap masking
        rows = v[halo - rad: halo - rad + block_h]
        for dy in range(1, window):
            rows = rows + v[halo - rad + dy: halo - rad + dy + block_h]
        out = rows
        for dx in range(1, rad + 1):
            right = pltpu.roll(rows, -dx, axis=1)
            out = out + jnp.where(col_ids < w - dx, right, 0.0)
            left = pltpu.roll(rows, dx, axis=1)
            out = out + jnp.where(col_ids >= dx, left, 0.0)
        return out

    counts = jnp.maximum(window_sum(jnp.ones_like(x)), 1.0)
    s1 = window_sum(x)
    s2 = window_sum(x * x)
    mean = s1 / counts
    var = jnp.maximum(s2 / counts - mean * mean, 0.0)
    std = jnp.sqrt(var)
    thresh = mean * (1.0 + k * ((std / r) - 1.0))
    center = x[halo: halo + block_h]
    out_ref[:] = (center > thresh).astype(jnp.uint8)


@functools.partial(jax.jit,
                   static_argnames=("window", "block_h", "interpret"))
def sauvola_pallas(image, window=15, k=0.2, r=128.0, block_h=256,
                   interpret=False):
    """Fused Sauvola binarization. image (H, W) -> uint8 mask
    (1 = paper)."""
    img = image.astype(jnp.float32)
    h, w = img.shape
    halo = window // 2 + 1
    n_blocks = -(-h // block_h)
    pad_h = n_blocks * block_h - h
    img_p = jnp.pad(img, ((halo, halo + pad_h), (0, 0)))

    kernel = functools.partial(
        _sauvola_kernel, window=window, k=k, r=r,
        block_h=block_h, halo=halo)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_blocks * block_h, w),
                                       jnp.uint8),
        grid=(n_blocks,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (block_h, w), lambda i: (i, 0),
            memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((block_h + 2 * halo, w), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(img_p)
    return out[:h]

"""Pallas TPU kernel: fused Sauvola binarization.

The XLA formulation (ops.binarize) materializes two full integral images
in HBM (8 bytes/px extra traffic each way). This kernel tiles the page
into (block_h x block_w) tiles; each tile DMAs its haloed window from
HBM into VMEM scratch (overlapping halos can't be expressed with
BlockSpecs, whose offsets are in block units), computes windowed
mean/std with static sliding-window adds held in VMEM, and writes only
the binary mask.

Mosaic constraints shaped the implementation: no cumsum lowering, no
lane-unaligned concats (jnp.pad), non-negative roll shifts only — so
both window axes use static halo slices of the scratch buffer, and tile
sizes are kept small enough that the ~15 live (block_h, block_w) f32
temporaries fit the 16 MB VMEM budget.

Borders use zero-padded windows (the XLA version clamps) — equivalent in
practice on document margins; tests compare interiors.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _sauvola_kernel(img_hbm, out_ref, scratch, sem, *,
                    window, k, r, block_h, block_w, halo_y, halo_x,
                    double_buffer):
    i = pl.program_id(0)
    j = pl.program_id(1)
    n_bx = pl.num_programs(1)

    def dma_for(linear, buf_slot):
        bi = linear // n_bx
        bj = jax.lax.rem(linear, n_bx)
        return pltpu.make_async_copy(
            img_hbm.at[pl.ds(bi * block_h, block_h + 2 * halo_y),
                       pl.ds(bj * block_w, block_w + 2 * halo_x)],
            scratch.at[buf_slot], sem.at[buf_slot])

    step = i * n_bx + j
    if double_buffer:
        # pipelined: each grid step waits for the DMA the previous step
        # started for it and kicks off the next block's transfer first
        n_steps = pl.num_programs(0) * n_bx
        slot = jax.lax.rem(step, 2)
        nxt = jax.lax.rem(step + 1, 2)

        @pl.when(step == 0)
        def _():
            dma_for(0, 0).start()

        @pl.when(step + 1 < n_steps)
        def _():
            dma_for(step + 1, nxt).start()

        dma_for(step, slot).wait()
        x = scratch[slot]
    else:
        slot = 0
        dma = dma_for(step, 0)
        dma.start()
        dma.wait()
        x = scratch[0]
    rad = window // 2

    def window_sum(v):
        # v: haloed array; static sliding sums along rows then columns
        rows = v[halo_y - rad: halo_y - rad + block_h, :]
        for dy in range(1, window):
            rows = rows + v[halo_y - rad + dy:
                            halo_y - rad + dy + block_h, :]
        out = rows[:, halo_x - rad: halo_x - rad + block_w]
        for dx in range(1, window):
            out = out + rows[:, halo_x - rad + dx:
                             halo_x - rad + dx + block_w]
        return out

    counts = jnp.maximum(window_sum(jnp.ones_like(x)), 1.0)
    s1 = window_sum(x)
    s2 = window_sum(x * x)
    mean = s1 / counts
    var = jnp.maximum(s2 / counts - mean * mean, 0.0)
    std = jnp.sqrt(var)
    thresh = mean * (1.0 + k * ((std / r) - 1.0))
    center = x[halo_y: halo_y + block_h, halo_x: halo_x + block_w]
    out_ref[:] = (center > thresh).astype(jnp.uint8)


@functools.partial(jax.jit,
                   static_argnames=("window", "block_h", "block_w",
                                    "interpret", "double_buffer"))
def sauvola_pallas(image, window=15, k=0.2, r=128.0, block_h=128,
                   block_w=512, interpret=False, double_buffer=True):
    """Fused Sauvola binarization. image (H, W) -> uint8 mask
    (1 = paper)."""
    img = image.astype(jnp.float32)
    h, w = img.shape
    rad1 = window // 2 + 1
    # DMA slice shapes must align to the (8, 128) f32 tiling
    halo_y = -(-rad1 // 8) * 8
    halo_x = -(-rad1 // 128) * 128
    n_by = -(-h // block_h)
    n_bx = -(-w // block_w)
    pad_h = n_by * block_h - h
    pad_w = n_bx * block_w - w
    img_p = jnp.pad(img, ((halo_y, halo_y + pad_h),
                          (halo_x, halo_x + pad_w)))

    kernel = functools.partial(
        _sauvola_kernel, window=window, k=k, r=r,
        block_h=block_h, block_w=block_w, halo_y=halo_y, halo_x=halo_x,
        double_buffer=double_buffer)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(
            (n_by * block_h, n_bx * block_w), jnp.uint8),
        grid=(n_by, n_bx),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (block_h, block_w), lambda i, j: (i, j),
            memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, block_h + 2 * halo_y,
                        block_w + 2 * halo_x), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(img_p)
    return out[:h, :w]

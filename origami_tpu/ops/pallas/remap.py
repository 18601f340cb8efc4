"""Pallas TPU kernels: grid-sampled remap (dewarp) + line-strip warp.

These are the two hot gathers of the pipeline (reference:
origami/core/dewarp.py:608-627 cv2.remap of the full page,
origami/core/block.py:223-259 per-line warpAffine) — replacing the
XLA gather formulation in ops/remap.py with explicit VMEM windowing:

  * ``remap_pallas`` — full-page dewarp remap.  Output is tiled; each
    tile computes the bounding window of its source coordinates (the
    dewarp field is smooth, so the window is the tile plus a small
    pad), DMAs that window HBM->VMEM once, and resolves the bilinear
    gather with a banded row loop (exact: per 8-row output group only
    K source rows can carry non-zero bilinear weight) + a lane gather
    for the x axis.  The XLA version issues 4 full-page HBM gathers.

  * ``extract_line_strips_pallas`` — batched oriented line strips.
    One program per strip; the affine frame is scalar-prefetched, the
    strip's source bbox window is DMA'd to VMEM, and the warp runs as
    the classic two-shear decomposition (x-resample then y-resample,
    both via take_along_axis).  For an affine map this two-pass form
    is the exact affine resample; it differs from composed 2D
    bilinear by O(|b/e|) sub-pixel sampling offsets (tested <=1e-2 of
    the value range for pipeline-realistic frames).

Both kernels gather via ``jnp.take_along_axis`` inside the kernel
(Mosaic's dynamic-gather lowering); ``gather_mode="tiled"`` splits the
gather into 128-lane tiles with select-merging for hardware where only
within-tile lane gathers lower.  Out-of-bounds sampling returns
``fill`` exactly like ops.remap: the host pads the image with a fill
margin and coordinates are clamped into the margin.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fiota(shape, dim):
    """float32 iota via int32 + cast: this toolchain's Mosaic rejects
    `tpu.iota` with a float result type."""
    return jax.lax.broadcasted_iota(jnp.int32, shape, dim).astype(
        jnp.float32)


def _lane_gather(arr, idx, mode):
    """arr (R, W) gathered along lanes at idx (R, C) -> (R, C).

    This toolchain's Mosaic lowers ``take_along_axis`` only when the
    index shape equals the operand shape (tpu.dynamic_gather's
    same-shape form; jax gather lowering asserts
    ``indices.shape == operand.shape + (1,)``), so the direct mode
    pads idx/operand to a common width and slices the result."""
    r, w = arr.shape
    idx = jnp.clip(idx, 0, w - 1)
    c = idx.shape[1]
    if mode == "direct":
        if c < w:
            idx = jnp.pad(idx, ((0, 0), (0, w - c)))
        elif c > w:
            arr = jnp.pad(arr, ((0, 0), (0, c - w)))
        return jnp.take_along_axis(arr, idx, axis=1)[:, :c]
    # Mosaic's dynamic_gather needs indices.shape == operand.shape AND
    # a single vreg along the gather dimension: gather in (R, 128)
    # chunks of BOTH the index and the source, accumulating over source
    # tiles with a selection mask
    chunks = []
    for c0 in range(0, c, 128):
        ic = idx[:, c0:c0 + 128]
        cw = ic.shape[1]
        if cw < 128:
            ic = jnp.pad(ic, ((0, 0), (0, 128 - cw)))
        o = jnp.zeros((r, 128), arr.dtype)
        for t in range(0, w, 128):
            tile = arr[:, t:t + 128]
            if tile.shape[1] < 128:
                tile = jnp.pad(tile, ((0, 0), (0, 128 - tile.shape[1])))
            loc = ic - t
            sel = (loc >= 0) & (loc < 128)
            g = jnp.take_along_axis(tile, jnp.clip(loc, 0, 127), axis=1)
            o = jnp.where(sel, g, o)
        chunks.append(o[:, :cw] if cw < 128 else o)
    return chunks[0] if len(chunks) == 1 else jnp.concatenate(chunks, axis=1)


def _sublane_gather(arr, idx, mode):
    """arr (H, C) gathered along sublanes at idx (R, C) -> (R, C)."""
    h, c = arr.shape
    idx = jnp.clip(idx, 0, h - 1)
    r = idx.shape[0]
    if mode == "direct":
        if r < h:
            idx = jnp.pad(idx, ((0, h - r), (0, 0)))
        elif r > h:
            arr = jnp.pad(arr, ((0, r - h), (0, 0)))
        return jnp.take_along_axis(arr, idx, axis=0)[:r]
    out = jnp.zeros(idx.shape, arr.dtype)
    for t in range(0, h, 8):
        loc = idx - t
        sel = (loc >= 0) & (loc < 8)
        g = jnp.take_along_axis(arr[t:t + 8], jnp.clip(loc, 0, 7), axis=0)
        out = jnp.where(sel, g, out)
    return out


def _align_down(v, m):
    return (v // m) * m


# ---------------------------------------------------------------- strips


def _strips_kernel(frames_ref, img_hbm, out_ref, win, sem, *,
                   out_h, out_w, win_h, win_w, pad_y, pad_x,
                   img_h, img_w, gather_mode):
    i = pl.program_id(0)
    a = frames_ref[i, 0]
    b = frames_ref[i, 1]
    c = frames_ref[i, 2] + pad_x   # translate into padded coords
    d = frames_ref[i, 3]
    e = frames_ref[i, 4]
    f = frames_ref[i, 5] + pad_y

    # clamp range: inside the fill margin, >=1 px from the padded edge
    lo_x, hi_x = float(pad_x - 2), float(img_w + pad_x + 1)
    lo_y, hi_y = float(pad_y - 2), float(img_h + pad_y + 1)

    def cl(v, lo, hi):
        return jnp.minimum(jnp.maximum(v, lo), hi)

    # source bbox of the strip (over the 4 output corners)
    xs = [cl(a * cx + b * cy + c, lo_x, hi_x)
          for cx in (0.0, float(out_w)) for cy in (0.0, float(out_h))]
    ys = [cl(d * cx + e * cy + f, lo_y, hi_y)
          for cx in (0.0, float(out_w)) for cy in (0.0, float(out_h))]
    min_x = jnp.minimum(jnp.minimum(xs[0], xs[1]),
                        jnp.minimum(xs[2], xs[3]))
    min_y = jnp.minimum(jnp.minimum(ys[0], ys[1]),
                        jnp.minimum(ys[2], ys[3]))
    hp = img_h + 2 * pad_y
    wp = img_w + 2 * pad_x
    oy = _align_down(jnp.clip(jnp.floor(min_y).astype(jnp.int32) - 2,
                              0, hp - win_h), 8)
    ox = _align_down(jnp.clip(jnp.floor(min_x).astype(jnp.int32) - 2,
                              0, wp - win_w), 128)

    dma = pltpu.make_async_copy(
        img_hbm.at[pl.ds(oy, win_h), pl.ds(ox, win_w)], win, sem)
    dma.start()

    # two-shear decomposition M = U @ L (exact for affine):
    #   I2(qx, qy) = src(u1*qx + u2*qy + c2, qy)   [x-pass]
    #   out(x, y)  = I2(x, l1*x + l2*y + f)        [y-pass]
    u2 = b / e
    u1 = a - u2 * d
    c2 = c - u2 * f

    dma.wait()
    src = win[:]

    # x-pass on the window rows, evaluated at the out_w output columns
    vcol = _fiota((win_h, out_w), 0)
    xrow = _fiota((win_h, out_w), 1)
    px = u1 * xrow + u2 * (vcol + oy.astype(jnp.float32)) + c2
    px = cl(px, lo_x, hi_x) - ox.astype(jnp.float32)
    x0 = jnp.floor(px)
    tx = px - x0
    x0i = x0.astype(jnp.int32)
    g0 = _lane_gather(src, x0i, gather_mode)
    g1 = _lane_gather(src, x0i + 1, gather_mode)
    i2 = g0 * (1.0 - tx) + g1 * tx

    # y-pass
    yout = _fiota((out_h, out_w), 0)
    xout = _fiota((out_h, out_w), 1)
    qy = d * xout + e * yout + f
    qy = cl(qy, lo_y, hi_y) - oy.astype(jnp.float32)
    y0 = jnp.floor(qy)
    ty = qy - y0
    y0i = y0.astype(jnp.int32)
    h0 = _sublane_gather(i2, y0i, gather_mode)
    h1 = _sublane_gather(i2, y0i + 1, gather_mode)
    out_ref[0] = h0 * (1.0 - ty) + h1 * ty


def _strip_window(frames, out_h, out_w):
    """Static (win_h, win_w) covering every strip's source bbox."""
    fr = np.asarray(frames, np.float32)
    span_x = (np.abs(fr[:, 0, 0]) * out_w + np.abs(fr[:, 0, 1]) * out_h)
    span_y = (np.abs(fr[:, 1, 0]) * out_w + np.abs(fr[:, 1, 1]) * out_h)
    win_h = int(-(-(span_y.max() + 14) // 8) * 8)
    win_w = int(-(-(span_x.max() + 134) // 128) * 128)
    return max(win_h, 16), max(win_w, 256)


@functools.partial(jax.jit, static_argnames=(
    "out_h", "out_w", "win_h", "win_w", "interpret", "gather_mode"))
def _strips_call(image, frames6, out_h, out_w, win_h, win_w, fill,
                 interpret, gather_mode):
    img = image.astype(jnp.float32)
    h, w = img.shape
    pad_y, pad_x = win_h, win_w
    img_p = jnp.pad(img, ((pad_y, pad_y), (pad_x, pad_x)),
                    constant_values=fill)
    n = frames6.shape[0]

    kernel = functools.partial(
        _strips_kernel, out_h=out_h, out_w=out_w,
        win_h=win_h, win_w=win_w, pad_y=pad_y, pad_x=pad_x,
        img_h=h, img_w=w, gather_mode=gather_mode)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, out_h, out_w), lambda i, s: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((win_h, win_w), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ])
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, out_h, out_w), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(frames6, img_p)


def extract_line_strips_pallas(image, frames, heights, out_h, out_w,
                               fill=255.0, interpret=False,
                               gather_mode="direct"):
    """Drop-in for ops.remap.extract_line_strips (same frame format).

    `heights` is accepted for signature parity and unused (as in the
    XLA path). Falls back implicitly to small static windows; callers
    should fall back to the XLA path when frames are degenerate
    (|e| ~ 0, i.e. near-vertical lines).
    """
    fr = np.asarray(frames, np.float32)
    win_h, win_w = _strip_window(fr, out_h, out_w)
    frames6 = jnp.asarray(fr.reshape(fr.shape[0], 6))
    return _strips_call(jnp.asarray(image), frames6, int(out_h),
                        int(out_w), win_h, win_w, float(fill),
                        bool(interpret), gather_mode)


def strips_frames_ok(frames, out_h, out_w, max_window=(256, 4096)):
    """True when every frame is within the kernel's static envelope."""
    fr = np.asarray(frames, np.float32)
    if fr.size == 0 or not np.all(np.isfinite(fr)):
        return False
    if np.any(np.abs(fr[:, 1, 1]) < 1e-3):   # |e| ~ 0: vertical lines
        return False
    win_h, win_w = _strip_window(fr, out_h, out_w)
    return win_h <= max_window[0] and win_w <= max_window[1]


# ------------------------------------------------------------- full page


def _remap_kernel(img_hbm, mx_ref, my_ref, out_ref, win, sem, *,
                  block_h, block_w, win_h, win_w, band_k,
                  hp, wp, gather_mode):
    mx = mx_ref[:]
    my = my_ref[:]
    oy = _align_down(jnp.clip(
        jnp.floor(jnp.min(my)).astype(jnp.int32) - 2, 0, hp - win_h), 8)
    ox = _align_down(jnp.clip(
        jnp.floor(jnp.min(mx)).astype(jnp.int32) - 2, 0, wp - win_w), 128)

    dma = pltpu.make_async_copy(
        img_hbm.at[pl.ds(oy, win_h), pl.ds(ox, win_w)], win, sem)
    dma.start()

    relx = mx - ox.astype(jnp.float32)
    x0 = jnp.floor(relx)
    tx = relx - x0
    x0i = x0.astype(jnp.int32)
    rely = my - oy.astype(jnp.float32)

    dma.wait()

    # Mosaic requires dynamic sublane offsets to be provably 8-aligned:
    # align the band base down (8-row granularity) and widen the slab
    # so the original rows stay covered
    band_ext = band_k + 8
    for g in range(block_h // 8):
        rows = slice(g * 8, (g + 1) * 8)
        ry = rely[rows]
        x0g = x0i[rows]
        txg = tx[rows]
        base = _align_down(jnp.clip(
            jnp.floor(jnp.min(ry)).astype(jnp.int32),
            0, win_h - band_ext), 8)
        slab = win[pl.ds(base, band_ext), :]
        acc = jnp.zeros((8, block_w), jnp.float32)
        basef = base.astype(jnp.float32)
        for k in range(band_ext):
            row = jnp.broadcast_to(slab[k:k + 1, :], (8, win_w))
            g0 = _lane_gather(row, x0g, gather_mode)
            g1 = _lane_gather(row, x0g + 1, gather_mode)
            xv = g0 * (1.0 - txg) + g1 * txg
            wy = jnp.maximum(0.0, 1.0 - jnp.abs(ry - (basef + float(k))))
            acc = acc + wy * xv
        out_ref[rows, :] = acc


def _remap_stats(map_xy, block_h, block_w, img_h, img_w):
    """Host stats: (pad, band_k) buckets for the given dewarp map.
    Coordinates are clamped to the image extent first (the kernel
    clamps out-of-bounds samples into the fill margin the same way),
    so far-off-page maps don't inflate the window."""
    m = np.asarray(map_xy, np.float32)
    oh, ow = m.shape[:2]
    gy = np.clip(m[..., 1], -2.0, img_h + 1.0)
    gx = np.clip(m[..., 0], -2.0, img_w + 1.0)
    # within-tile source spans (coarse, sampled on the tile grid)
    pad = 16
    band = 8
    for y0 in range(0, oh, block_h):
        for x0 in range(0, ow, block_w):
            ty = gy[y0:y0 + block_h, x0:x0 + block_w]
            tx = gx[y0:y0 + block_h, x0:x0 + block_w]
            if ty.size == 0:
                continue
            span_y = float(ty.max() - ty.min())
            span_x = float(tx.max() - tx.min())
            pad = max(pad, int(span_y - block_h + 8),
                      int(span_x - block_w + 8))
            for gy0 in range(0, ty.shape[0], 8):
                grp = ty[gy0:gy0 + 8]
                band = max(band, int(np.ceil(grp.max() - grp.min())) + 3)
    pad_b = 16
    while pad_b < pad:
        pad_b *= 2
    band_b = 8
    while band_b < band:
        band_b *= 2
    return pad_b, band_b


@functools.partial(jax.jit, static_argnames=(
    "block_h", "block_w", "pad", "band_k", "interpret", "gather_mode"))
def _remap_call(image, mx, my, fill, block_h, block_w, pad, band_k,
                interpret, gather_mode):
    img = image.astype(jnp.float32)
    h, w = img.shape
    oh, ow = mx.shape
    win_h = block_h + 2 * pad + 16
    # DMA slice widths must be 128-lane aligned on hardware
    win_w = -(-(block_w + 2 * pad + 144) // 128) * 128
    # fill margin: covers the pad, and keeps the padded image at least
    # one DMA window large (small pages)
    margin_y = max(pad + 8, -(-(win_h - h) // 2) + 8 if win_h > h else 0)
    margin_x = max(pad + 8, -(-(win_w - w) // 2) + 8 if win_w > w else 0)
    # the padded image dims must themselves be aligned (8 sublanes /
    # 128 lanes): the kernel clamps window origins to hp-win_h / wp-win_w
    # and then aligns DOWN — with unaligned dims the clamped-at-the-edge
    # case loses up to a full tile of coverage at the image's far side
    extra_y = (-(h + 2 * margin_y)) % 8
    extra_x = (-(w + 2 * margin_x)) % 128
    img_p = jnp.pad(img, ((margin_y, margin_y + extra_y),
                          (margin_x, margin_x + extra_x)),
                    constant_values=fill)
    hp, wp = h + 2 * margin_y + extra_y, w + 2 * margin_x + extra_x
    # shift into padded coords; clamp OOB into the fill margin
    mxp = jnp.clip(mx + margin_x, margin_x - 2.0, w + margin_x + 1.0)
    myp = jnp.clip(my + margin_y, margin_y - 2.0, h + margin_y + 1.0)

    n_by = -(-oh // block_h)
    n_bx = -(-ow // block_w)
    py, px_ = n_by * block_h - oh, n_bx * block_w - ow
    # edge-replicate: a constant pad value near the image origin would
    # drag an edge tile's min() (the DMA window origin) away from its
    # real samples, which then fall outside the static VMEM window and
    # read clamped garbage. Replicated coords keep every tile's
    # min/max — and therefore _remap_stats' pad/band spans — identical
    # to the unpadded map; the extra rows/cols are sliced off below.
    mxp = jnp.pad(mxp, ((0, py), (0, px_)), mode="edge")
    myp = jnp.pad(myp, ((0, py), (0, px_)), mode="edge")

    kernel = functools.partial(
        _remap_kernel, block_h=block_h, block_w=block_w,
        win_h=win_h, win_w=win_w, band_k=band_k, hp=hp, wp=wp,
        gather_mode=gather_mode)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(
            (n_by * block_h, n_bx * block_w), jnp.float32),
        grid=(n_by, n_bx),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((block_h, block_w), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_h, block_w), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_h, block_w), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((win_h, win_w), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(img_p, mxp, myp)
    return out[:oh, :ow]


def remap_pallas(image, map_xy, fill=0.0, block_h=64, block_w=256,
                 interpret=False, gather_mode="direct"):
    """Drop-in for ops.remap.remap (exact bilinear, same fill
    semantics). Window pad and row band are sized from the map on the
    host (power-of-two buckets, so recompiles stay rare)."""
    m = jnp.asarray(map_xy)
    pad, band_k = _remap_stats(map_xy, block_h, block_w,
                               image.shape[0], image.shape[1])
    return _remap_call(jnp.asarray(image), m[..., 0], m[..., 1],
                       float(fill), block_h, block_w, pad, band_k,
                       bool(interpret), gather_mode)

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
    return bilinear_sample_xy(image, coords[..., 0], coords[..., 1], fill)


def bilinear_sample_xy(image, x, y, fill=0.0):
    """bilinear_sample with the coordinate planes passed separately.

    Use this INSIDE fused jit graphs: a stacked (..., 2) coordinate
    tensor materialized on TPU is tiled to 128 lanes on the trailing
    axis — a 64x memory blowup that OOMs full-page/strip-batch maps.
    Separate (..., ) planes keep the last axis wide and dense.
    """
    img = image.astype(jnp.float32)
    h, w = img.shape
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


def _upsample_lattice(c, step, out_h, out_w):
    """Bilinearly upsample a lattice `c` ((ch, cw), values at positions
    (i*step, j*step)) to a dense (out_h, out_w) plane — pure reshapes
    and lerps, no gather."""
    w = jnp.arange(step, dtype=jnp.float32) / step
    ch, cw = c.shape
    r = (c[:-1, None, :] * (1.0 - w)[None, :, None]
         + c[1:, None, :] * w[None, :, None])
    r = r.reshape((ch - 1) * step, cw)[:out_h]
    r = (r[:, :-1, None] * (1.0 - w)[None, None, :]
         + r[:, 1:, None] * w[None, None, :])
    return r.reshape(out_h, (cw - 1) * step)[:, :out_w]


@functools.partial(jax.jit, static_argnums=(5, 6, 8))
def extract_dewarped_strips(image, hv, res, frames, widths, out_h, out_w,
                            fill=255.0, x_margin=0):
    """Fused batched line extraction through the inverse dewarp grid.

    For each line i, `frames` (N, 2, 3) is an affine mapping strip
    pixel (x, y, 1) -> DEWARPED page coords; those are pushed through
    the dewarp sample grid `hv` ((gh, gw, 2), cell size `res` — the
    exact device twin of Grid.inverse_points) and the warped page is
    gathered at the result. Columns past `widths[i]` return `fill`,
    as do the first/last `x_margin` columns inside each width — a
    FILL margin, not extra page sampling, so a neighboring separator
    or table-divider stroke can never enter the strip (training
    strips carry such margins; a glyph flush against the strip edge
    decodes poorly). Returns (N, out_h, out_w) uint8.

    Replaces the host loop of per-line grid builds + inverse_points
    (reference: origami/core/block.py:223-259 line warps +
    origami/core/dewarp.py inverse transform) with ONE dispatch whose
    inputs are tiny (frames + the coarse grid).

    The inverse-grid correction is evaluated on a coarse 8-px lattice
    per strip and bilinearly upsampled (reshape+lerp, gather-free):
    XLA's elementwise gather is the dominant device cost of this op
    (~6 M samples/s on v5e through the tunnel), and evaluating the
    smooth grid at every strip pixel tripled it. The grid itself is
    piecewise-bilinear over ~25-px cells, so an 8-px lattice stays
    sub-0.1-px accurate (exact for the identity grid).
    """
    img = image.astype(jnp.float32)
    xs = jnp.arange(out_w, dtype=jnp.float32)
    # keep the coordinate planes separate end to end: a stacked
    # (..., 2) intermediate is lane-padded 2 -> 128 on TPU (64x
    # memory; OOMs a full page of strips)
    hvx = hv[..., 0]
    hvy = hv[..., 1]

    step = 8
    ch = out_h // step + 2
    cw = out_w // step + 2
    ys_c = jnp.arange(ch, dtype=jnp.float32) * step
    xs_c = jnp.arange(cw, dtype=jnp.float32) * step

    def one(frame, width):
        dx = frame[0, 0] * xs_c[None, :] + frame[0, 1] * ys_c[:, None] \
            + frame[0, 2]
        dy = frame[1, 0] * xs_c[None, :] + frame[1, 1] * ys_c[:, None] \
            + frame[1, 2]
        # inverse dewarp: bilinear in the sample grid (matches
        # Grid.inverse_points' clamp semantics), on the coarse lattice
        gh, gw = hvx.shape
        gx = jnp.clip(dx / res, 0.0, gw - 1 - 1e-6)
        gy = jnp.clip(dy / res, 0.0, gh - 1 - 1e-6)
        x0 = jnp.floor(gx).astype(jnp.int32)
        y0 = jnp.floor(gy).astype(jnp.int32)
        tx = gx - x0
        ty = gy - y0
        w00 = (1 - tx) * (1 - ty)
        w01 = tx * (1 - ty)
        w10 = (1 - tx) * ty
        w11 = tx * ty

        def interp(g):
            return (g[y0, x0] * w00 + g[y0, x0 + 1] * w01
                    + g[y0 + 1, x0] * w10 + g[y0 + 1, x0 + 1] * w11)

        cx = _upsample_lattice(interp(hvx), step, out_h, out_w)
        cy = _upsample_lattice(interp(hvy), step, out_h, out_w)
        # pad columns -> far out of bounds -> fill
        pad = (xs[None, :] >= width - x_margin) | (xs[None, :] < x_margin)
        cx = jnp.where(pad, -1e6, cx)
        cy = jnp.where(pad, -1e6, cy)
        return bilinear_sample_xy(img, cx, cy, fill)

    out = jax.vmap(one)(frames, widths.astype(jnp.float32))
    return jnp.clip(out, 0.0, 255.0).astype(jnp.uint8)


def _resample_rows_banded(img, my, d_lo, n_taps, fill):
    """T[i, x] = linear interp of `img` at (row=my[i, x], col=x).

    Gather-free: `my[i, x] - i` must lie in [d_lo, d_lo + n_taps - 1]
    (the caller derives the band from the dewarp lattice, whose
    bilinear extremes sit at the nodes). Each tap is one static-size
    dynamic slice of the fill-padded image times a hat weight —
    replacing XLA's elementwise gather, which this chip serves at only
    ~6 M samples/s (0.45 s for one full page)."""
    out_h, w = my.shape
    h = img.shape[0]
    pad_top = max(0, -d_lo)
    pad_bot = max(0, out_h - 1 + d_lo + n_taps - 1 - (h - 1))
    padded = jnp.pad(img, ((pad_top, pad_bot), (0, 0)),
                     constant_values=fill)
    rel = my - jnp.arange(out_h, dtype=jnp.float32)[:, None]
    rel = jnp.clip(rel, d_lo, d_lo + n_taps - 1)

    def body(acc, k):
        d = d_lo + k
        sh = jax.lax.dynamic_slice(padded, (d + pad_top, 0), (out_h, w))
        wgt = jnp.maximum(0.0, 1.0 - jnp.abs(rel - d.astype(jnp.float32)))
        return acc + sh * wgt, None

    acc, _ = jax.lax.scan(body, jnp.zeros((out_h, w), jnp.float32),
                          jnp.arange(n_taps, dtype=jnp.int32))
    return acc


def _resample_cols_banded(img, mx, d_lo, n_taps, fill):
    """out[i, j] = linear interp of `img` at (row=i, col=mx[i, j]);
    the column twin of _resample_rows_banded."""
    out_h, out_w = mx.shape
    w = img.shape[1]
    pad_l = max(0, -d_lo)
    pad_r = max(0, out_w - 1 + d_lo + n_taps - 1 - (w - 1))
    padded = jnp.pad(img, ((0, 0), (pad_l, pad_r)),
                     constant_values=fill)
    rel = mx - jnp.arange(out_w, dtype=jnp.float32)[None, :]
    rel = jnp.clip(rel, d_lo, d_lo + n_taps - 1)

    def body(acc, k):
        d = d_lo + k
        sh = jax.lax.dynamic_slice(padded, (0, d + pad_l), (out_h, out_w))
        wgt = jnp.maximum(0.0, 1.0 - jnp.abs(rel - d.astype(jnp.float32)))
        return acc + sh * wgt, None

    acc, _ = jax.lax.scan(body, jnp.zeros((out_h, out_w), jnp.float32),
                          jnp.arange(n_taps, dtype=jnp.int32))
    return acc


@functools.partial(jax.jit, static_argnums=(3, 4, 5, 6, 7, 8, 9))
def dewarp_banded(image, lat_my, lat_mx, step, d1, n1, d2, n2,
                  out_h, out_w, fill=255.0):
    """Full-page dewarp as two gather-free banded 1-D resamples.

    Replaces remap()'s 4-point gather for the dewarp case (reference:
    cv2.remap over the dense grid, origami/core/dewarp.py:608-627).
    `lat_my` ((gh+1, cw1)) is the intermediate vertical map my'(i, x)
    on a `step`-px lattice — my evaluated where the horizontal map
    crosses source column x, so the two-pass composition equals the
    direct bilinear sample for smooth grids (Catmull–Smith
    decomposition; see Grid.banded_plan). `lat_mx` ((gh+1, gw+1)) is
    the horizontal map on the output lattice. (d1, n1)/(d2, n2) are
    the static displacement bands of each pass.

    Pass 1 resamples rows at source columns -> T (out_h, W_src);
    pass 2 resamples T's columns -> (out_h, out_w) float32.
    """
    img = image.astype(jnp.float32)
    my = _upsample_lattice(lat_my, step, out_h, img.shape[1])
    t = _resample_rows_banded(img, my, d1, n1, fill)
    mx = _upsample_lattice(lat_mx, step, out_h, out_w)
    return _resample_cols_banded(t, mx, d2, n2, fill)


@functools.partial(jax.jit, static_argnums=(3, 4, 5, 6, 7, 8, 9))
def dewarp_banded_u8(image, lat_my, lat_mx, step, d1, n1, d2, n2,
                     out_h, out_w, fill=255.0):
    """dewarp_banded + clip/cast to uint8 fused in the same graph."""
    out = dewarp_banded.__wrapped__(image, lat_my, lat_mx, step,
                                    d1, n1, d2, n2, out_h, out_w, fill)
    # round before the cast: the hat-weight sum leaves exact values a
    # few ulp short (92 * 0.999999 floors to 91 under a plain cast)
    return jnp.clip(jnp.round(out), 0.0, 255.0).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnums=(3, 4, 5, 6, 7, 8))
def extract_strips_banded(dew, frames, widths, out_h, out_w, slab_k,
                          slab_w, n_shear=6, fill=255.0):
    """Gather-free line-strip extraction from the DEWARPED page.

    The gather formulation (extract_dewarped_strips) pays XLA's
    elementwise-gather rate (~6 M samples/s on v5e — ~0.8 s/page of
    strips, the dominant OCR-stage device cost). Post-dewarp, lines are
    near-axis-aligned, so each strip is an affine resample of a small
    page window; this formulation never gathers:

      1. one dynamic-slice pulls the strip's (slab_k, slab_w) source
         window from the fill-padded dewarped page;
      2. a K-tap scan of hat-weighted row FMAs vertically resamples the
         slab through the exact Catmull-Smith intermediate map
         Y'(y, j) = Y at the strip x that lands on source column j
         (affine in (y, j) — same composition dewarp_banded uses);
      3. a static 6-tap banded column pass corrects the horizontal
         shear term a1*(y - yc);
      4. an MXU matmul with an iota-built hat-weight matrix applies
         the horizontal scale u(x) = a0*x + (a2 - sx0) + a1*yc.

    frames: (N, 2, 3) strip (x, y, 1) -> DEWARPED page coords (NOT
    pushed through the inverse grid — the source is the dewarped page
    itself, which layout already materialized device-side via the
    banded dewarp). Rows past the real count are padding; callers
    discard their output. Caller guarantees per the eligibility rules
    in batch/core/lines.py: a0*out_w + 2 <= slab_w and the vertical
    footprint fits slab_k (else the gather path takes the line).

    Reference: origami/core/block.py:223-259 extracts via per-line
    cv2 warps from the dewarped page; this is the batched device twin.
    Returns (N, out_h, out_w) uint8.
    """
    img = dew.astype(jnp.float32)
    h, w = img.shape
    pad = 16
    # the padded page must fit a whole slab (a narrow page can be
    # smaller than a wide strip bucket's slab)
    extra_y = max(0, slab_k - (h + 2 * pad))
    extra_x = max(0, slab_w - (w + 2 * pad))
    padded = jnp.pad(img, ((pad, pad + extra_y), (pad, pad + extra_x)),
                     constant_values=fill)
    ys = jnp.arange(out_h, dtype=jnp.float32)
    xs = jnp.arange(out_w, dtype=jnp.float32)
    js = jnp.arange(slab_w, dtype=jnp.float32)
    yc = (out_h - 1) / 2.0

    def one(_, fw):
        frame, width = fw
        a0 = jnp.maximum(frame[0, 0], 1e-6)
        a1, a2 = frame[0, 1], frame[0, 2]
        b0, b1, b2 = frame[1, 0], frame[1, 1], frame[1, 2]
        wf = jnp.maximum(width.astype(jnp.float32), 2.0)
        # source footprint over the REAL width (padded columns are
        # fill anyway) — corners of the affine image of the strip
        xc = a0 * jnp.stack([0.0, wf - 1])
        x_all = (xc[:, None] + a1 * jnp.stack([0.0, out_h - 1.0]))\
            .reshape(-1) + a2
        y_all = (b0 * jnp.stack([0.0, wf - 1])[:, None]
                 + b1 * jnp.stack([0.0, out_h - 1.0])[None, :])\
            .reshape(-1) + b2
        sx0 = jnp.floor(jnp.min(x_all)) - 1.0
        sy0 = jnp.floor(jnp.min(y_all)) - 1.0
        # clamp the slab into the padded page (off-page reads fill)
        r0 = jnp.clip(sy0 + pad, 0, h + 2 * pad + extra_y - slab_k)\
            .astype(jnp.int32)
        c0 = jnp.clip(sx0 + pad, 0, w + 2 * pad + extra_x - slab_w)\
            .astype(jnp.int32)
        sy0 = r0.astype(jnp.float32) - pad
        sx0 = c0.astype(jnp.float32) - pad
        slab = jax.lax.dynamic_slice(padded, (r0, c0), (slab_k, slab_w))

        # pass 1: vertical through the intermediate map
        #   Y'(y, j) = r*(sx0 + j - a2) + (b1 - r*a1)*y + b2,  r = b0/a0
        r = b0 / a0
        m = (r * (sx0 + js[None, :] - a2) + (b1 - r * a1) * ys[:, None]
             + b2 - sy0)
        m = jnp.clip(m, 0.0, slab_k - 1.0)

        def vtap(acc, k):
            row = jax.lax.dynamic_slice(slab, (k, 0), (1, slab_w))
            wgt = jnp.maximum(0.0, 1.0 - jnp.abs(m - k.astype(jnp.float32)))
            return acc + row * wgt, None

        t, _ = jax.lax.scan(vtap, jnp.zeros((out_h, slab_w), jnp.float32),
                            jnp.arange(slab_k, dtype=jnp.int32))

        # pass 2a: shear correction, T2[y, j] = T[y, j + a1*(y - yc)]
        mx = js[None, :] + a1 * (ys[:, None] - yc)
        t = _resample_cols_banded(t, mx, -(n_shear // 2), n_shear, fill)

        # pass 2b: horizontal scale as an MXU matmul
        u = a0 * xs + (a2 - sx0) + a1 * yc
        wm = jnp.maximum(0.0, 1.0 - jnp.abs(u[None, :] - js[:, None]))
        out = t @ wm

        # fill semantics: true page coords out of bounds, or columns
        # past the real width, return fill (hard-edged, vs the gather
        # path's blended border taps — differs only on page borders)
        px = a0 * xs[None, :] + a1 * ys[:, None] + a2
        py = b0 * xs[None, :] + b1 * ys[:, None] + b2
        valid = ((px > -0.5) & (px < w - 0.5) & (py > -0.5)
                 & (py < h - 0.5) & (xs[None, :] < wf))
        return None, jnp.where(valid, out, fill)

    _, out = jax.lax.scan(one, None,
                          (frames, widths.astype(jnp.float32)))
    return jnp.clip(jnp.round(out), 0.0, 255.0).astype(jnp.uint8)


def identity_grid(page_w, page_h):
    """A 2x2 dewarp sample grid whose inverse transform is the
    identity (bilinear interpolation of a linear map is exact)."""
    import numpy as np
    res = float(max(page_w, page_h))
    hv = np.array([[[0.0, 0.0], [res, 0.0]],
                   [[0.0, res], [res, res]]], np.float32)
    return hv, res


@functools.lru_cache(maxsize=1)
def pallas_gather_mode():
    """Probe which in-kernel gather formulation this backend's Mosaic
    lowers; returns ``"direct"``, ``"tiled"`` or ``None``.

    The Pallas grid-sample kernels (ops/pallas/remap.py) gather via
    ``jnp.take_along_axis``, which needs ``tpu.dynamic_gather``; some
    libtpu/Mosaic versions (e.g. the v5e remote-compile toolchain
    measured 2026-08) reject that op, but DO lower the ``"tiled"``
    variant (128-lane-windowed gathers + select merge) built for
    exactly this case. Two tiny compiles decide per process (the
    compiles are disk-cached thereafter); ``None`` keeps the XLA
    gather formulation as the route.
    """
    import numpy as np
    try:
        from origami_tpu.ops.pallas.remap import extract_line_strips_pallas
    except Exception:
        return None
    frames = jnp.asarray(
        np.array([[[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]], np.float32))
    # the probe image carries structure so the probe checks NUMERICS,
    # not just lowering: on the 2026-08 v5e toolchain the tiled-mode
    # kernel compiles and runs but the hardware dynamic_gather returns
    # wrong values for ~16% of pixels (interpret mode is exact) — a
    # lowering-only probe would auto-route a corrupting kernel
    img = np.arange(64 * 256, dtype=np.float32).reshape(64, 256) % 251.0
    want = img[:8, :128]
    # tiled first: on the 2026-08 v5e toolchain the direct-mode strips
    # kernel takes ~12 min to FAIL in the remote Mosaic compiler, while
    # tiled compiles and validates in ~1 s
    for mode in ("tiled", "direct"):
        try:
            out = extract_line_strips_pallas(
                jnp.asarray(img), frames,
                jnp.asarray([8], jnp.int32), 8, 128, gather_mode=mode)
            got = np.asarray(out)[0]
            if np.abs(got - want).max() <= 1e-3:
                return mode
        except Exception:
            continue
    return None


def pallas_gather_supported():
    return pallas_gather_mode() is not None


def remap_auto(image, map_xy, fill=0.0):
    """Full-page remap through the Pallas kernel when the toolchain
    supports it (VMEM-windowed; see ops/pallas/remap.py), else the XLA
    gather path."""
    mode = pallas_gather_mode()
    if mode is not None:
        from origami_tpu.ops.pallas.remap import remap_pallas
        return remap_pallas(image, map_xy, fill, gather_mode=mode)
    return remap(image, map_xy, fill)


def extract_line_strips_auto(image, frames, heights, out_h, out_w,
                             fill=255.0):
    """Batched strip warp via Pallas when supported (+ frame bounds
    admissible), else XLA."""
    mode = pallas_gather_mode()
    if mode is not None:
        from origami_tpu.ops.pallas.remap import (
            extract_line_strips_pallas, strips_frames_ok)
        import numpy as np
        if strips_frames_ok(np.asarray(frames), out_h, out_w):
            return extract_line_strips_pallas(
                image, frames, heights, out_h, out_w, fill,
                gather_mode=mode)
    return extract_line_strips(image, frames, heights, out_h, out_w, fill)


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

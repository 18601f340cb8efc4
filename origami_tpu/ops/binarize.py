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
    """Sum over a centered (window x window) box per pixel, with edge clamp.

    The four clamped corner lookups are expressed as edge-replicated
    pad + STATIC slices, not index-vector gathers: full-page 2D
    gathers send the remote TPU compiler into minutes-long
    autotuning (116 s cold for one page shape), while pad+slice
    compiles in seconds and fuses.
    """
    h = integral.shape[0] - 1
    w = integral.shape[1] - 1
    r = window // 2
    # padded[i] == integral[clip(i - r, 0, h)] (rows; columns alike)
    padded = jnp.pad(integral, ((r, r + 1), (r, r + 1)), mode="edge")
    a = padded[0:h, 0:w]
    b = padded[0:h, 2 * r + 1: 2 * r + 1 + w]
    c = padded[2 * r + 1: 2 * r + 1 + h, 0:w]
    d = padded[2 * r + 1: 2 * r + 1 + h, 2 * r + 1: 2 * r + 1 + w]
    ys = jnp.arange(h)
    xs = jnp.arange(w)
    y0 = jnp.clip(ys - r, 0, h)
    y1 = jnp.clip(ys + r + 1, 0, h)
    x0 = jnp.clip(xs - r, 0, w)
    x1 = jnp.clip(xs + r + 1, 0, w)
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


@functools.partial(jax.jit, static_argnums=(1, 5, 6))
def binarize_with_separators(image, window_size, sep_mask, hv, res,
                             warp_h=None, warp_w=None):
    """Layout-stage page binarization fused into ONE dispatch
    (gather formulation — the fallback when a grid has no banded plan;
    the hot path is binarize_sep_banded_packed).

    Sauvola-binarize the dewarped page and whiten separator pixels so
    whitespace-split detection treats separator lines as gaps
    (reference origami/batch/detect/layout.py:158-186 does this as
    skimage sauvola + cv2.resize + cv2.remap + cv2.dilate on host).

    `sep_mask` (lh, lw) bool lives in label space of the WARPED page
    ((warp_h, warp_w); defaults to the output shape for the identity-
    grid case); each dewarped output pixel maps through the dewarp
    sample grid `hv`/`res` (pass ops.remap.identity_grid for no
    dewarping) to warped page coords, scaled into label space, and
    nearest-gathered; the gathered mask is 3x3-dilated and OR'd into
    the binary page. Returns (H, W) bool, True = paper/gap.
    """
    binary = sauvola(image, window_size)
    h, w = binary.shape
    if warp_h is None:
        warp_h, warp_w = h, w
    gh, gw = hv.shape[:2]
    lh, lw = sep_mask.shape
    ys = jnp.arange(h, dtype=jnp.float32) / res
    xs = jnp.arange(w, dtype=jnp.float32) / res
    gy = jnp.clip(ys, 0.0, gh - 1 - 1e-6)
    gx = jnp.clip(xs, 0.0, gw - 1 - 1e-6)
    y0 = jnp.floor(gy).astype(jnp.int32)
    x0 = jnp.floor(gx).astype(jnp.int32)
    ty = (gy - y0)[:, None]
    tx = (gx - x0)[None, :]

    def interp(g):
        top = g[y0][:, x0] * (1 - tx) + g[y0][:, x0 + 1] * tx
        bot = g[y0 + 1][:, x0] * (1 - tx) + g[y0 + 1][:, x0 + 1] * tx
        return top * (1 - ty) + bot * ty

    # warped-page coords per dewarped pixel (separable: the upsampled
    # map is bilinear in the grid, so interpolate rows x cols directly)
    wx = interp(hv[..., 0])
    wy = interp(hv[..., 1])
    # label space: the mask was rendered at (lw, lh) for the warped page
    # scaled by (lw / w, lh / h) of the WARPED size == mask's own shape
    # over the warped page shape; the warped page has the same shape as
    # the dewarped output here (dewarp preserves size).
    mi = jnp.clip(jnp.round(wy * (lh / warp_h)).astype(jnp.int32),
                  0, lh - 1)
    mj = jnp.clip(jnp.round(wx * (lw / warp_w)).astype(jnp.int32),
                  0, lw - 1)
    sep = sep_mask.astype(jnp.float32)[mi, mj]
    sep = jax.lax.reduce_window(
        sep, -jnp.inf, jax.lax.max, (3, 3), (1, 1), "SAME")
    return binary | (sep > 0.5)


def pack_bits(mask):
    """(H, W) bool -> (H, ceil(W/8)) uint8, bit 7-i of byte j =
    mask[:, 8j+i] (numpy.packbits big-endian convention). Packing on
    device cuts a full-page boolean transfer 8x — the axon tunnel
    moves ~10 MB/s, so a 4 MB page mask costs ~0.4 s raw."""
    h, w = mask.shape
    pw = -(-w // 8) * 8
    m = jnp.pad(mask.astype(jnp.uint8), ((0, 0), (0, pw - w)))
    m = m.reshape(h, pw // 8, 8)
    weights = jnp.asarray([128, 64, 32, 16, 8, 4, 2, 1], jnp.uint8)
    return jnp.sum(m * weights, axis=-1, dtype=jnp.uint8)


@functools.partial(jax.jit, static_argnums=(1, 5, 6))
def binarize_with_separators_packed(image, window_size, sep_mask, hv,
                                    res, warp_h=None, warp_w=None):
    """binarize_with_separators with the result bit-packed on device."""
    return pack_bits(
        binarize_with_separators.__wrapped__(image, window_size,
                                             sep_mask, hv, res,
                                             warp_h, warp_w))


def unpack_bits(packed, out_w):
    """Inverse of pack_bits: (H, PW) uint8 -> (H, out_w) bool."""
    h, pw = packed.shape
    shifts = jnp.asarray([7, 6, 5, 4, 3, 2, 1, 0], jnp.uint8)
    bits = (packed[:, :, None] >> shifts) & jnp.uint8(1)
    return bits.reshape(h, pw * 8)[:, :out_w].astype(bool)


@functools.partial(jax.jit,
                   static_argnums=(1, 5, 6, 7, 8, 9, 10, 11, 12))
def binarize_sep_banded_packed(image, window_size, sep_packed, lat_my,
                               lat_mx, sep_w, warp_h, warp_w,
                               step, d1, n1, d2, n2):
    """Layout-stage binarization, all gather-free, bit-packed.

    `image` is the DEWARPED gray page (H, W). `sep_packed` is the
    separator label mask in warped-page LABEL space, host-bit-packed
    (8x smaller through the ~10-17 MB/s tunnel; `sep_w` = its true
    width). On device it is unpacked, conv-resized onto the warped
    page ((warp_h, warp_w) — the label raster's own frame), then
    mapped into dewarped space by the gather-free banded dewarp
    (`lat_my`/`lat_mx`/bands from Grid.banded_plan at scale 1,
    src_shape=(warp_h, warp_w)). Sauvola-binarize the page, 3x3-dilate
    the dewarped mask, OR, pack.

    Replaces binarize_with_separators_packed, whose full-page
    elementwise gather ran at ~6 M samples/s on this chip AND scaled
    warped coords by the dewarped canvas height (label rasters live
    in warped-page space — separators whitened ~10% off position).
    Reference behavior: origami/batch/detect/layout.py:158-186.
    """
    from origami_tpu.ops.remap import dewarp_banded
    binary = sauvola.__wrapped__(image, window_size)
    h, w = binary.shape
    sep = unpack_bits(sep_packed, sep_w).astype(jnp.float32)
    sep = jax.image.resize(sep, (warp_h, warp_w), method="linear")
    sepd = dewarp_banded.__wrapped__(sep, lat_my, lat_mx, step,
                                     d1, n1, d2, n2, h, w, 0.0)
    sepd = jax.lax.reduce_window((sepd > 0.2).astype(jnp.float32),
                                 -jnp.inf, jax.lax.max,
                                 (3, 3), (1, 1), "SAME")
    return pack_bits(binary | (sepd > 0.5))


@functools.partial(jax.jit, static_argnums=(1, 3))
def binarize_sep_resized_packed(image, window_size, sep_packed, sep_w):
    """No-grid variant of binarize_sep_banded_packed: the separator
    label mask is only SCALED (conv-based linear resize, gather-free)
    onto the warped page, then dilated and OR'd into the sauvola
    binarization; result bit-packed."""
    binary = sauvola.__wrapped__(image, window_size)
    h, w = binary.shape
    sep = unpack_bits(sep_packed, sep_w).astype(jnp.float32)
    sep = jax.image.resize(sep, (h, w), method="linear")
    sep = jax.lax.reduce_window((sep > 0.2).astype(jnp.float32),
                                -jnp.inf, jax.lax.max,
                                (3, 3), (1, 1), "SAME")
    return pack_bits(binary | (sep > 0.5))


@functools.partial(jax.jit, static_argnums=(1,))
def sauvola_packed(image, window_size=15, k=0.2, r=128.0):
    return pack_bits(sauvola.__wrapped__(image, window_size, k, r))

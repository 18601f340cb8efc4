"""Flow-field page dewarping — the numeric heart of the pipeline.

Algorithm family: interpolated-vector-field document warping (Schneider,
Block & Rojas, ICDAR 2007), as in the reference (origami/core/dewarp.py).
The reference builds the grid on host with scipy/shapely: scattered linear
interpolation of sampled angles, a per-column Python integration loop, and
STRtree-based ray/polyline intersection across two worker threads
(origami/core/dewarp.py:292-493). Here the whole construction is ONE jit
graph with static shapes:

  * angle fields are evaluated by masked inverse-distance weighting over
    the (padded) sample set — a dense (points x samples) computation that
    XLA maps onto the MXU, replacing scattered-hull interpolation;
  * the horizontal grid integrates the H field with a `lax.scan` over
    columns (reference hot loop dewarp.py:421-439);
  * the vertical pass marches V-field rays across H-streamline rows with
    an all-pairs segment-intersection solve per row inside a second scan
    (replacing ShapelyBatchIntersections, dewarp.py:220-264);
  * page borders are covered up-front by starting the integration a pad
    margin outside the page instead of the reference's data-dependent
    while-loop border extension (dewarp.py:341-419) — shapes stay static.

The resulting sample grid is stored in the reference's dewarp.zip format
(data.npy (H, W, 2) float32 + meta.json {"version", "cell", "shape"}),
so both systems read each other's grids.
"""

from __future__ import annotations

import functools
import io as _io
import json
import math
import zipfile
from functools import cached_property, lru_cache

import numpy as np

from origami_tpu.core.math import Geometry


# ---------------------------------------------------------------------------
# device field + grid construction
# ---------------------------------------------------------------------------

def _field_eval(points, sample_xy, sample_phi, sample_mask, phi0):
    """Masked IDW interpolation of angles at `points` (N, 2).

    Returns unit direction vectors (N, 2). With no valid samples, the
    constant fallback angle phi0 is used.
    """
    import jax.numpy as jnp
    d2 = jnp.sum(
        (points[:, None, :] - sample_xy[None, :, :]) ** 2, axis=-1)
    w = sample_mask[None, :] / (d2 + 25.0)        # soften at ~5px scale
    wsum = jnp.sum(w, axis=1)
    # interpolate angles via their unit vectors to avoid wrap issues
    cphi = jnp.cos(sample_phi)[None, :]
    sphi = jnp.sin(sample_phi)[None, :]
    cx = jnp.sum(w * cphi, axis=1)
    sx = jnp.sum(w * sphi, axis=1)
    have = wsum > 1e-12
    cx = jnp.where(have, cx, jnp.cos(phi0))
    sx = jnp.where(have, sx, jnp.sin(phi0))
    n = jnp.sqrt(cx * cx + sx * sx) + 1e-12
    return jnp.stack([cx / n, sx / n], axis=-1)


@functools.partial(
    __import__("jax").jit,
    static_argnames=("n_gy", "n_gx", "res", "pad_cells"))
def build_grid_device(h_xy, h_phi, h_mask, v_xy, v_phi, v_mask,
                      n_gy, n_gx, res, pad_cells=2):
    """Construct the dewarp sample grid (n_gy, n_gx, 2) on device.

    h_*: padded H-field samples (points (S,2), angles (S,), mask (S,));
    v_*: same for the V field. Static: grid shape, cell size, pad.
    """
    import jax
    import jax.numpy as jnp

    res_f = jnp.float32(res)
    origin = -pad_cells * res_f

    # --- horizontal pass: integrate H streamlines column by column -------
    ys = origin + jnp.arange(n_gy, dtype=jnp.float32) * res_f
    pts0 = jnp.stack([jnp.full((n_gy,), origin), ys], axis=-1)

    def h_step(pts, _):
        d = _field_eval(pts, h_xy, h_phi, h_mask, 0.0)
        return pts + d * res_f, pts

    _, grid_h = jax.lax.scan(h_step, pts0, None, length=n_gx)
    grid_h = jnp.transpose(grid_h, (1, 0, 2))      # (n_gy, n_gx, 2)

    # --- vertical pass: march V rays, snapping to each H row -------------
    # per-row max step length (worst-case 60 degree shear, like the
    # reference's max_angle bound)
    row_dy = jnp.max(grid_h[1:, :, 1] - grid_h[:-1, :, 1])
    max_len = row_dy / jnp.cos(jnp.deg2rad(60.0)) + res_f

    def intersect_row(p0, d, row):
        """Intersect rays (p0 + t*d*max_len) with the row polyline.

        p0: (n_gx, 2), d: (n_gx, 2), row: (n_gx, 2) points of the next
        H row. Border segments are extrapolated far out so a solution
        always exists; picks the intersection closest to p0.
        """
        a = row[:-1]                                  # (S, 2) seg start
        b = row[1:]                                   # (S, 2) seg end
        # extrapolate the two border segments outwards
        big = 1e5
        dir0 = a[0] - b[0]
        dirn = b[-1] - a[-1]
        n0 = dir0 / (jnp.linalg.norm(dir0) + 1e-12)
        nn = dirn / (jnp.linalg.norm(dirn) + 1e-12)
        a = a.at[0].set(a[0] + n0 * big)
        b = b.at[-1].set(b[-1] + nn * big)

        r = d * max_len                               # (n_gx, 2)
        s = (b - a)                                   # (S, 2)
        qp = a[None, :, :] - p0[:, None, :]           # (n_gx, S, 2)
        denom = r[:, None, 0] * s[None, :, 1] - r[:, None, 1] * s[None, :, 0]
        t = (qp[..., 0] * s[None, :, 1] - qp[..., 1] * s[None, :, 0]) \
            / jnp.where(jnp.abs(denom) < 1e-9, 1e-9, denom)
        u = (qp[..., 0] * r[:, None, 1] - qp[..., 1] * r[:, None, 0]) \
            / jnp.where(jnp.abs(denom) < 1e-9, 1e-9, denom)
        valid = (u >= -1e-6) & (u <= 1 + 1e-6) & (t > 1e-6)
        t_sel = jnp.where(valid, t, jnp.inf)
        best = jnp.argmin(t_sel, axis=1)              # (n_gx,)
        t_best = jnp.take_along_axis(t_sel, best[:, None], axis=1)[:, 0]
        # no intersection at all -> fall back to a plain field step
        ok = jnp.isfinite(t_best)
        p_hit = p0 + r * t_best[:, None]
        p_fallback = p0 + d * res_f
        return jnp.where(ok[:, None], p_hit, p_fallback)

    def v_step(p0, row_next):
        d = _field_eval(p0, v_xy, v_phi, v_mask, jnp.pi / 2)
        p1 = intersect_row(p0, d, row_next)
        return p1, p0

    p_last, rows = jax.lax.scan(v_step, grid_h[0], grid_h[1:])
    grid_hv = jnp.concatenate([rows, p_last[None]], axis=0)
    return grid_hv.astype(jnp.float32)


def _pad_samples(points, values, max_n):
    pts = np.zeros((max_n, 2), dtype=np.float32)
    phi = np.zeros((max_n,), dtype=np.float32)
    mask = np.zeros((max_n,), dtype=np.float32)
    n = min(len(points), max_n)
    if n:
        pts[:n] = np.asarray(points, dtype=np.float32)[:n]
        phi[:n] = np.asarray(values, dtype=np.float32)[:n]
        mask[:n] = 1.0
    return pts, phi, mask


def _round_up(x, m):
    return int(-(-x // m) * m)


class GridFactory:
    """Host wrapper choosing static shapes and invoking the device build.

    Grid shape is derived from the page size with a fixed pad margin
    (instead of the reference's runtime estimate_extent + border
    extension), then bucketed so pages of similar size share a compile.
    """

    def __init__(self, page_size, samples_h, samples_v, grid_res=25,
                 max_grid_size=1000, max_samples=1024):
        self._size = page_size
        self._res = int(grid_res)
        self._max_grid = max_grid_size
        self._max_samples = max_samples
        self._samples_h = samples_h
        self._samples_v = samples_v

    @property
    def res(self):
        return self._res

    @property
    def std(self):
        return max(self._samples_h.std, self._samples_v.std)

    def __call__(self):
        import jax.numpy as jnp
        w, h = self._size
        pad = 2
        # bucket static grid dims to multiples of 8 cells
        n_gx = _round_up(math.ceil(w / self._res) + 2 * pad + 2, 8)
        n_gy = _round_up(math.ceil(h / self._res) + 2 * pad + 2, 8)
        if max(n_gx, n_gy) > self._max_grid:
            raise RuntimeError("grid too big: (%d, %d)" % (n_gy, n_gx))
        hs = _pad_samples(self._samples_h.points, self._samples_h.values,
                          self._max_samples)
        vs = _pad_samples(self._samples_v.points, self._samples_v.values,
                          self._max_samples)
        grid = build_grid_device(
            jnp.asarray(hs[0]), jnp.asarray(hs[1]), jnp.asarray(hs[2]),
            jnp.asarray(vs[0]), jnp.asarray(vs[1]), jnp.asarray(vs[2]),
            n_gy=n_gy, n_gx=n_gx, res=self._res, pad_cells=pad)
        return Grid(np.asarray(grid), self._res)


# ---------------------------------------------------------------------------
# host-facing Grid (artifact IO + coordinate transforms)
# ---------------------------------------------------------------------------

class Grid:
    def __init__(self, hv, res):
        self._hv = np.asarray(hv, dtype=np.float32)
        self._res = int(res)
        self._banded_plans = {}

    def banded_plan(self, src_shape, scale=(1.0, 1.0)):
        """Host-side plan for the gather-free banded dewarp
        (ops.remap.dewarp_banded): the two pass lattices plus static
        displacement bands, bucketed so similar grids share a compile.

        `src_shape` (H, W) is the source image (may live in a SCALED
        coordinate space — e.g. a label raster — with `scale` =
        (sx, sy) such that source coords = (sx * mx, sy * my)).

        The pass-1 lattice is the Catmull–Smith intermediate map:
        my'(i, x) = my at the output column where mx crosses source
        column x (solved by 1-D interpolation per lattice row), which
        makes the two-pass composition agree with the direct bilinear
        sample for smooth monotone grids. Returns None when the grid
        is not column-monotone (caller falls back to the gather path).
        """
        key = (tuple(src_shape), (float(scale[0]), float(scale[1])))
        if key in self._banded_plans:
            return self._banded_plans[key]
        plan = self._build_banded_plan(src_shape, key[1])
        self._banded_plans[key] = plan
        return plan

    def _build_banded_plan(self, src_shape, scale):
        hv = self._hv.astype(np.float64)
        res = self._res
        gh, gw = hv.shape[:2]
        src_h, src_w = int(src_shape[0]), int(src_shape[1])
        sx, sy = scale
        if sx <= 0 or sy <= 0:
            return None
        mxr = hv[..., 0]
        # pass-1 inversion needs mx monotone along each lattice row
        if not np.all(np.diff(mxr, axis=1) > 1e-3):
            return None
        # two-pass twist error is bounded by the grid's vertical shear
        # (~shear/4 px; measured real-scan grids sit at |dmy/dx| <=
        # 0.003, deskewed-by-grid pages ~0.04) — only a pathological
        # grid falls back to the gather path
        if np.abs(np.diff(hv[..., 1], axis=1)).max() / res > 0.25:
            return None
        out_h = gh * res
        out_w = gw * res
        # pass-1 lattice: my'(i, x) at source-column nodes every `res`
        # px (one replicated pad row/col reproduces the nearest-clamp
        # semantics of _upsample_hv_planes beyond the last node)
        cw1 = int(np.ceil(src_w / res)) + 2
        x_nodes = np.arange(cw1, dtype=np.float64) * res
        lat_my = np.empty((gh + 1, cw1), np.float32)
        for r in range(gh):
            lat_my[r] = sy * np.interp(x_nodes / sx, mxr[r], hv[r, :, 1])
        lat_my[gh] = lat_my[gh - 1]
        # pass-2 lattice: mx on the output lattice
        lat_mx = np.empty((gh + 1, gw + 1), np.float32)
        lat_mx[:gh, :gw] = sx * mxr
        lat_mx[:gh, gw] = lat_mx[:gh, gw - 1]
        lat_mx[gh] = lat_mx[gh - 1]

        # displacement bands: the upsampled planes are bilinear, and
        # (plane - position) is bilinear too, so extremes sit at nodes
        def band(lat, positions):
            rel = lat.astype(np.float64) - positions
            d_lo = int(np.floor(rel.min()))
            d_hi = int(np.floor(rel.max())) + 1
            # bucket to multiples of 4 to bound jit variants
            d_lo = (d_lo // 4) * 4
            n = -(-(d_hi - d_lo + 1) // 4) * 4
            # a very wide band (e.g. scale far from 1 makes the
            # displacement grow linearly across the page) loses to
            # the gather path — bail out
            if n > 768:
                return None
            return d_lo, n

        rows1 = (np.arange(gh + 1, dtype=np.float64) * res)[:, None]
        b1 = band(lat_my, rows1)
        cols2 = (np.arange(gw + 1, dtype=np.float64) * res)[None, :]
        b2 = band(lat_mx, cols2)
        if b1 is None or b2 is None:
            return None
        return dict(lat_my=lat_my, lat_mx=lat_mx, step=res,
                    d1=b1[0], n1=b1[1], d2=b2[0], n2=b2[1],
                    out_h=out_h, out_w=out_w)

    @staticmethod
    def create(page_size, samples_h, samples_v, grid_res=25, **kwargs):
        return GridFactory(page_size, samples_h, samples_v,
                           grid_res=grid_res, **kwargs)()

    @property
    def geometry(self):
        h, w = self._hv.shape[:2]
        return Geometry(w * self._res, h * self._res)

    @property
    def resolution(self):
        return self._res

    @property
    def warping(self):
        """Warp magnitude: spread of the grid's local distortions."""
        pts = self._hv
        dy = (pts[1:, :, 1] - pts[:-1, :, 1]).flatten()
        dx = (pts[:, 1:, 0] - pts[:, :-1, 0]).flatten()
        return float(max(np.std(dx), np.std(dy)))

    @lru_cache(maxsize=2)
    def points(self, resolution="full"):
        """The dewarped->warped map: 'sample' = the cell grid, 'full' =
        per-pixel (upsampled by `res`)."""
        if resolution == "sample":
            return self._hv
        if resolution == "full":
            import jax.numpy as jnp
            # one device dispatch; the (H, W, 2) stack happens on
            # device and transfers once (the earlier host-side
            # stack+astype of two full-page channels cost ~2 s/page)
            return np.asarray(
                _upsample_hv_device(jnp.asarray(self._hv), self._res))
        raise ValueError(resolution)

    # -- transforms --------------------------------------------------------
    def inverse_points(self, dewarped_pts):
        """Map dewarped (x, y) points to warped coordinates (bilinear in
        the sample grid — the direction stored in the artifact)."""
        pts = np.asarray(dewarped_pts, dtype=np.float64).reshape(-1, 2)
        gx = pts[:, 0] / self._res
        gy = pts[:, 1] / self._res
        h, w = self._hv.shape[:2]
        gx = np.clip(gx, 0, w - 1 - 1e-6)
        gy = np.clip(gy, 0, h - 1 - 1e-6)
        x0 = np.floor(gx).astype(int)
        y0 = np.floor(gy).astype(int)
        tx = (gx - x0)[:, None]
        ty = (gy - y0)[:, None]
        g = self._hv
        out = (g[y0, x0] * (1 - tx) * (1 - ty)
               + g[y0, x0 + 1] * tx * (1 - ty)
               + g[y0 + 1, x0] * (1 - tx) * ty
               + g[y0 + 1, x0 + 1] * tx * ty)
        return out

    # reference-compatible aliases
    @property
    def inverse(self):
        return self.inverse_points

    def transformer_points(self, warped_pts):
        """Map warped (x, y) points into dewarped space.

        Newton inversion of the structured bilinear grid map (the
        exact inverse of inverse_points' interpolation), fully
        vectorized — replaces the earlier per-page Delaunay
        triangulation + simplex-walk scattered interpolator
        (~0.25 s/page of qhull work in the layout/contours stages)."""
        pts = np.asarray(warped_pts, dtype=np.float64).reshape(-1, 2)
        if not len(pts):
            return pts
        g = np.asarray(self._hv, dtype=np.float64)
        h, w = g.shape[:2]
        # initial guess: identity (the displacement field is smooth
        # and bounded, so Newton from here converges in a few steps)
        p = pts / self._res
        for _ in range(12):
            x0 = np.clip(np.floor(p[:, 0]).astype(int), 0, w - 2)
            y0 = np.clip(np.floor(p[:, 1]).astype(int), 0, h - 2)
            tx = (p[:, 0] - x0)[:, None]
            ty = (p[:, 1] - y0)[:, None]
            g00 = g[y0, x0]
            g01 = g[y0, x0 + 1]
            g10 = g[y0 + 1, x0]
            g11 = g[y0 + 1, x0 + 1]
            f = (g00 * (1 - tx) * (1 - ty) + g01 * tx * (1 - ty)
                 + g10 * (1 - tx) * ty + g11 * tx * ty) - pts
            if np.max(np.abs(f)) < 1e-3 * self._res:
                break
            dfdx = (g01 - g00) * (1 - ty) + (g11 - g10) * ty
            dfdy = (g10 - g00) * (1 - tx) + (g11 - g01) * tx
            det = dfdx[:, 0] * dfdy[:, 1] - dfdx[:, 1] * dfdy[:, 0]
            det = np.where(np.abs(det) < 1e-12, 1.0, det)
            dx = (f[:, 0] * dfdy[:, 1] - f[:, 1] * dfdy[:, 0]) / det
            dy = (f[:, 1] * dfdx[:, 0] - f[:, 0] * dfdx[:, 1]) / det
            p[:, 0] -= dx
            p[:, 1] -= dy
        return p * self._res

    @property
    def transformer(self):
        """(xs, ys) -> (xs', ys') callable for geometry.transform."""
        def f(x, y):
            out = self.transformer_points(np.c_[x, y])
            return out[:, 0], out[:, 1]
        return f

    # -- artifact IO (docs/formats.md#dewarpzip) ---------------------------
    @staticmethod
    def open(path):
        with zipfile.ZipFile(path, "r") as zf:
            info = json.loads(zf.read("meta.json").decode("utf8"))
            grid = np.load(_io.BytesIO(zf.read("data.npy")),
                           allow_pickle=False)
        return Grid(grid.reshape(info["shape"]), info["cell"])

    def save(self, file_or_path, compression=zipfile.ZIP_DEFLATED):
        buf = _io.BytesIO()
        np.save(buf, self._hv.astype(np.float32), allow_pickle=False)
        info = dict(version=1, cell=self._res,
                    shape=list(self._hv.shape))
        if hasattr(file_or_path, "write"):
            zf = zipfile.ZipFile(file_or_path, "w", compression)
        else:
            zf = zipfile.ZipFile(str(file_or_path), "w", compression)
        with zf:
            zf.writestr("data.npy", buf.getvalue())
            zf.writestr("meta.json", json.dumps(info))


def _upsample_hv_planes(hv, res):
    """Index-aligned upsampling: full[y, x] == bilinear(hv at
    (x/res, y/res)), the SAME convention inverse_points uses.
    (jax.image.resize's half-pixel-center convention would shift the
    rendered dewarped image by res/2 px against every coordinate
    mapped back through inverse_points — half a line height at the
    default 25 px cells.)

    Returns the x and y planes SEPARATELY: a stacked (H, W, 2) array
    on TPU is lane-padded 2 -> 128 on the trailing axis (64x memory
    for a full-page map)."""
    import jax.numpy as jnp
    from jax.scipy.ndimage import map_coordinates
    h, w = hv.shape[:2]
    ys = jnp.arange(h * res, dtype=jnp.float32) / res
    xs = jnp.arange(w * res, dtype=jnp.float32) / res
    yy, xx = jnp.meshgrid(ys, xs, indexing="ij")
    return tuple(
        map_coordinates(hv[..., k], [yy, xx], order=1,
                        mode="nearest").astype(jnp.float32)
        for k in (0, 1))


@lru_cache(maxsize=1)
def _jitted_dewarp_fns():
    import jax

    def upsample_impl(hv, res):
        import jax.numpy as jnp
        mx, my = _upsample_hv_planes(hv, res)
        return jnp.stack([mx, my], axis=-1)

    up = jax.jit(upsample_impl, static_argnames=("res",))

    def dewarp_impl(image, hv, scale, res):
        import jax.numpy as jnp
        from origami_tpu.ops.remap import bilinear_sample_xy
        mx, my = _upsample_hv_planes(hv, res)
        out = bilinear_sample_xy(image.astype(jnp.float32),
                                 mx * scale[0], my * scale[1],
                                 fill=255.0)
        return jnp.clip(out, 0, 255).astype(jnp.uint8)

    dw = jax.jit(dewarp_impl, static_argnames=("res",))
    return up, dw


def _upsample_hv_device(hv, res):
    return _jitted_dewarp_fns()[0](hv, res)


class Dewarper:
    """Applies a grid to images: upsample + remap + u8 cast fused in
    one device dispatch (the map never round-trips to host)."""

    def __init__(self, image, grid, shape=None):
        # accepts a device array (preferred: the page uploads once per
        # process via Page.device_pixels) or host pixels
        self._image = image if hasattr(image, "devices") \
            else np.asarray(image)
        self._shape = tuple(shape) if shape is not None \
            else tuple(self._image.shape)
        self._grid = grid

    @property
    def grid(self):
        return self._grid

    def _dewarp_dev(self, image, scale):
        import jax.numpy as jnp
        scale = np.asarray(scale, dtype=np.float32)
        shape = tuple(image.shape[:2])
        plan = self._grid.banded_plan(shape,
                                      (float(scale[0]), float(scale[1])))
        if plan is not None:
            from origami_tpu.ops.remap import dewarp_banded_u8
            return dewarp_banded_u8(
                jnp.asarray(image), jnp.asarray(plan["lat_my"]),
                jnp.asarray(plan["lat_mx"]), plan["step"],
                plan["d1"], plan["n1"], plan["d2"], plan["n2"],
                plan["out_h"], plan["out_w"])
        dw = _jitted_dewarp_fns()[1]
        return dw(jnp.asarray(image), jnp.asarray(self._grid._hv),
                  jnp.asarray(scale, dtype=jnp.float32),
                  self._grid.resolution)

    def _dewarp(self, image, scale):
        return np.asarray(self._dewarp_dev(image, scale))

    @cached_property
    def dewarped_dev(self):
        """Device-resident dewarped page (jax array, uint8): consumers
        that keep computing on device (layout binarization, line
        extraction) must not round-trip the full page through the
        ~10-17 MB/s tunnel."""
        return self._dewarp_dev(self._image, np.ones(2, np.float32))

    @cached_property
    def dewarped(self):
        return np.asarray(self.dewarped_dev)

    def dewarp_image(self, image, scale_to=None):
        image = np.asarray(image)
        h0, w0 = self._shape[:2]
        h1, w1 = image.shape[:2]
        scale = np.array([w1 / w0, h1 / h0], dtype=np.float32)
        return self._dewarp(image, scale)

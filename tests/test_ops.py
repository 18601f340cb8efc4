import numpy as np
import pytest

import jax
import jax.numpy as jnp

from origami_tpu.ops import resize, binarize, remap, morphology, tiling


def test_resize_area_vs_cv2(synthetic_page):
    import cv2
    out = np.asarray(resize.resize(jnp.asarray(synthetic_page), (300, 200)))
    ref = cv2.resize(synthetic_page, (200, 300), interpolation=cv2.INTER_AREA)
    # anti-aliased linear vs true box filter: close but not identical on
    # high-frequency content
    assert out.shape == (300, 200)
    assert np.mean(np.abs(out - ref.astype(np.float32))) < 16.0
    # on smooth content the two are nearly identical
    smooth = cv2.GaussianBlur(synthetic_page, (31, 31), 8)
    out_s = np.asarray(resize.resize(jnp.asarray(smooth), (300, 200)))
    ref_s = cv2.resize(smooth, (200, 300), interpolation=cv2.INTER_AREA)
    assert np.mean(np.abs(out_s - ref_s.astype(np.float32))) < 1.5


def test_resize_linear_roundtrip():
    img = np.arange(64, dtype=np.float32).reshape(8, 8)
    up = np.asarray(resize.resize(jnp.asarray(img), (16, 16), "linear"))
    assert up.shape == (16, 16)
    assert abs(up.mean() - img.mean()) < 1.0


def test_sauvola_binarization(synthetic_page):
    b = np.asarray(binarize.sauvola(jnp.asarray(synthetic_page), 15))
    # paper is True, ink is False
    assert b.dtype == bool
    # ink fraction should be substantial but minority
    ink = 1.0 - b.mean()
    assert 0.05 < ink < 0.6
    # separator pixels must be ink
    assert not b[100, 200]


def test_sauvola_matches_reference_formula():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (40, 50)).astype(np.float64)
    t = np.asarray(binarize.sauvola_threshold(jnp.asarray(img), 5, 0.2, 128.0))
    # direct NumPy computation of windowed mean/std with clamped windows
    r = 2
    for y, x in [(10, 10), (0, 0), (39, 49), (20, 0)]:
        y0, y1 = max(0, y - r), min(40, y + r + 1)
        x0, x1 = max(0, x - r), min(50, x + r + 1)
        win = img[y0:y1, x0:x1]
        m, s = win.mean(), win.std()
        expect = m * (1 + 0.2 * ((s / 128.0) - 1))
        assert t[y, x] == pytest.approx(expect, rel=1e-4)


def test_otsu_bimodal():
    rng = np.random.default_rng(0)
    img = np.concatenate([rng.normal(50, 10, 5000),
                          rng.normal(200, 10, 5000)]).clip(0, 255)
    t = float(np.asarray(binarize.otsu_threshold(jnp.asarray(img))))
    assert 80 < t < 170


def test_bilinear_sample_identity():
    img = np.arange(20, dtype=np.float32).reshape(4, 5)
    ys, xs = np.meshgrid(np.arange(4), np.arange(5), indexing="ij")
    coords = np.stack([xs, ys], axis=-1).astype(np.float32)
    out = np.asarray(remap.bilinear_sample(jnp.asarray(img), jnp.asarray(coords)))
    np.testing.assert_allclose(out, img, atol=1e-5)


def test_bilinear_sample_interp():
    img = np.array([[0.0, 10.0], [20.0, 30.0]], dtype=np.float32)
    coords = jnp.asarray([[0.5, 0.5]])
    out = np.asarray(remap.bilinear_sample(jnp.asarray(img), coords))
    assert out[0] == pytest.approx(15.0)
    # out of bounds -> fill
    out2 = np.asarray(remap.bilinear_sample(
        jnp.asarray(img), jnp.asarray([[5.0, 0.0]]), fill=-1.0))
    assert out2[0] == -1.0


def test_affine_warp_translation():
    img = np.zeros((10, 10), np.float32)
    img[2, 3] = 7.0
    # inverse map: output (x,y) samples source (x+3, y+2) => feature at (0,0)
    m = jnp.asarray([[1, 0, 3], [0, 1, 2]], dtype=jnp.float32)
    out = np.asarray(remap.affine_warp(jnp.asarray(img), m, (10, 10)))
    assert out[0, 0] == pytest.approx(7.0)


def test_extract_line_strips():
    img = np.tile(np.arange(100, dtype=np.float32), (20, 1))
    # two "lines": offsets at x=10 and x=50, identity orientation
    frames = jnp.asarray([
        [[1, 0, 10], [0, 1, 5]],
        [[1, 0, 50], [0, 1, 5]],
    ], dtype=jnp.float32)
    strips = np.asarray(remap.extract_line_strips(
        jnp.asarray(img), frames, jnp.asarray([8, 8]), 8, 30))
    assert strips.shape == (2, 8, 30)
    assert strips[0, 0, 0] == pytest.approx(10.0)
    assert strips[1, 0, 0] == pytest.approx(50.0)


def test_morphology_roundtrip():
    m = np.zeros((20, 20), np.uint8)
    m[5:15, 5:15] = 1
    d = np.asarray(morphology.dilate(jnp.asarray(m), 3))
    e = np.asarray(morphology.erode(jnp.asarray(d), 3))
    np.testing.assert_array_equal(e, m)


def test_skeletonize_bar():
    m = np.zeros((30, 30), np.uint8)
    m[10:16, 2:28] = 1  # thick horizontal bar
    sk = np.asarray(morphology.skeletonize(jnp.asarray(m)))
    # thin: each interior column has exactly 1 pixel
    cols = sk[:, 8:22].sum(axis=0)
    assert (cols <= 2).all() and cols.max() >= 1
    assert sk.sum() < m.sum() / 2


def test_edt():
    m = np.zeros((21, 21), np.float32)
    m[10, 10] = 1
    d = np.asarray(morphology.label_edt(jnp.asarray(m)))
    assert d[10, 10] == 0
    assert d[10, 15] == pytest.approx(5.0)
    assert d[15, 10] == pytest.approx(5.0)


def test_tile_layout_coverage():
    lay = tiling.TileLayout((1280, 2400), (1280, 896), beta0=50)
    # inner regions exactly partition the canvas
    cover = np.zeros((2400, 1280), np.int32)
    for t in lay.tiles:
        x0, y0, x1, y1 = t["inner"]
        cover[y0:y1, x0:x1] += 1
    assert (cover == 1).all()
    # outer tiles overlap by >= beta0
    for t in lay.tiles:
        x0, y0, x1, y1 = t["outer"]
        assert x1 - x0 == 1280 and y1 - y0 == 896


def test_tile_extract_stitch():
    lay = tiling.TileLayout((64, 100), (64, 48), beta0=8)
    img = np.random.default_rng(0).random((100, 64, 1)).astype(np.float32)
    tiles = lay.extract(jnp.asarray(img))
    assert tiles.shape == (len(lay), 48, 64, 1)
    # stitch the tiles' own pixels back: identity
    labels = jax.vmap(lambda t: t[..., 0])(tiles)
    out = np.asarray(lay.stitch_labels(labels))
    np.testing.assert_allclose(out, img[..., 0], atol=1e-6)


def _smooth_test_image(h, w, seed=3):
    """Natural-ish smooth image (noise images amplify the sub-0.1-px
    two-pass twist of the banded dewarp into large value diffs)."""
    rng = np.random.default_rng(seed)
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    img = (128 + 90 * np.sin(xs / 17.0) * np.cos(ys / 23.0)
           + 30 * np.sin((xs + ys) / 41.0))
    return np.clip(img + rng.normal(0, 2, (h, w)), 0, 255).astype(np.uint8)


def _dewarp_test_grid(res=25, gh=24, gw=16, warp=3.0):
    base_y, base_x = np.meshgrid(np.arange(gh) * res, np.arange(gw) * res,
                                 indexing="ij")
    hv = np.stack([base_x - 50 + warp * np.sin(base_y / 600.0),
                   base_y - 50 + warp * np.cos(base_x / 700.0)],
                  axis=-1).astype(np.float32)
    return hv, res


def test_dewarp_banded_matches_gather():
    from origami_tpu.core.dewarp import Grid, Dewarper, _jitted_dewarp_fns
    hv, res = _dewarp_test_grid()
    g = Grid(hv, res)
    img = _smooth_test_image(520, 370)
    plan = g.banded_plan(img.shape)
    assert plan is not None
    banded = np.asarray(Dewarper(jnp.asarray(img), g).dewarped_dev)
    dw = _jitted_dewarp_fns()[1]
    ref = np.asarray(dw(jnp.asarray(img), jnp.asarray(hv),
                        jnp.ones(2, np.float32), res))
    assert banded.shape == ref.shape == (24 * 25, 16 * 25)
    diff = np.abs(banded.astype(int) - ref.astype(int))
    # interior agreement (boundary blend semantics differ: banded
    # fill-blends the padded edge, gather hard-fills past it)
    interior = ref < 250
    assert diff[interior].max() <= 2
    assert (diff > 2).mean() < 0.02


def test_dewarp_banded_translation_exact():
    from origami_tpu.core.dewarp import Grid, Dewarper
    hv, res = _dewarp_test_grid(warp=0.0)
    g = Grid(hv, res)
    # keep the image inside the last lattice node (the grid itself
    # edge-clamps beyond (gw-1)*res, in both the banded and gather
    # formulations)
    img = _smooth_test_image(500, 300, seed=4)
    out = np.asarray(Dewarper(jnp.asarray(img), g).dewarped_dev)
    # pure translation by +50: out[y, x] == img[y - 50, x - 50]
    np.testing.assert_array_equal(out[50:50 + 500, 50:50 + 300], img)
    assert (out[:49] == 255).all()


def test_dewarp_banded_falls_back_on_pathological_grid():
    from origami_tpu.core.dewarp import Grid
    hv, res = _dewarp_test_grid()
    hv2 = hv.copy()
    hv2[..., 0] = hv2[::, ::-1, 0]  # non-monotone mx
    assert Grid(hv2, res).banded_plan((520, 370)) is None


def test_unpack_bits_roundtrip():
    rng = np.random.default_rng(1)
    m = rng.random((37, 101)) > 0.5
    packed = jnp.asarray(np.packbits(m, axis=1))
    out = np.asarray(binarize.unpack_bits(packed, 101))
    np.testing.assert_array_equal(out, m)


def test_binarize_sep_banded_whitens_at_true_position():
    """The separator label raster lives in WARPED-page label space;
    whitening must land at the label's dewarped position (the old
    gather op scaled by the dewarped canvas size — ~10% off)."""
    from origami_tpu.core.dewarp import Grid
    hv, res = _dewarp_test_grid(warp=0.0)   # translate +50
    g = Grid(hv, res)
    wh, ww = 520, 370
    rng = np.random.default_rng(2)
    gray = rng.integers(0, 255, (600, 400)).astype(np.uint8)
    lh, lw = 650, 463                        # label raster at 1.25x
    sep = np.zeros((lh, lw), bool)
    wy = 100                                 # separator at warped y=100
    ly = int(round(wy * lh / wh))
    sep[ly - 1:ly + 2, :] = True
    plan = g.banded_plan((wh, ww))
    packed = binarize.binarize_sep_banded_packed(
        jnp.asarray(gray), 15, jnp.asarray(np.packbits(sep, axis=1)),
        jnp.asarray(plan["lat_my"]), jnp.asarray(plan["lat_mx"]),
        sep.shape[1], wh, ww, plan["step"], plan["d1"], plan["n1"],
        plan["d2"], plan["n2"])
    binary = np.unpackbits(np.asarray(packed), axis=1)[:, :400]
    # the warped page lands at +50 in the canvas; the whitened band
    # covers dewarped x in [50, 400)
    rows = np.where(binary[:, 50:400].all(axis=1))[0]
    assert len(rows) and abs(rows.mean() - (wy + 50)) <= 2


def test_binarize_sep_resized_no_grid():
    rng = np.random.default_rng(5)
    wh, ww = 520, 370
    gray = rng.integers(0, 255, (wh, ww)).astype(np.uint8)
    lh, lw = 650, 463
    sep = np.zeros((lh, lw), bool)
    sep[int(100 * lh / wh) - 1:int(100 * lh / wh) + 2, :] = True
    packed = binarize.binarize_sep_resized_packed(
        jnp.asarray(gray), 15, jnp.asarray(np.packbits(sep, axis=1)),
        sep.shape[1])
    binary = np.unpackbits(np.asarray(packed), axis=1)[:, :ww]
    rows = np.where(binary.sum(axis=1) >= ww - 4)[0]
    assert len(rows) and abs(rows.mean() - 100) <= 2


def test_extract_strips_x_margin():
    """x_margin columns inside each width are FILL, and the frame
    convention (caller shifts origin by -x_margin * dx) keeps the
    content aligned after the margin."""
    img = np.tile(np.arange(100, dtype=np.float32), (20, 1))
    hv, res = remap.identity_grid(100, 20)
    xm = 4
    frame = np.array([[1, 0, 10 - xm], [0, 1, 5]], np.float32)
    strips = np.asarray(remap.extract_dewarped_strips(
        jnp.asarray(img), jnp.asarray(hv), res,
        jnp.asarray(frame[None]), jnp.asarray([20 + 2 * xm]),
        8, 40, 255.0, xm))
    s = strips[0]
    assert (s[:, :xm] == 255).all()          # leading fill margin
    assert s[0, xm] == 10                    # content starts after it
    assert s[0, xm + 19] == 29               # ...and spans the width
    assert (s[:, xm + 20: xm + 24] == 255).all()   # trailing margin
    assert (s[:, 28:] == 255).all()          # past width: fill


def _strip_frame(x0, y0, w_src, h_band, th=48, slope=0.0):
    """Affine strip frame the way Line.dewarped_frame builds one:
    xres = th / h_band (aspect-true magnification)."""
    xres = th / h_band
    width = int(np.ceil(w_src * xres))
    right = np.array([w_src, slope * w_src], np.float32)
    n = 1.0 / np.hypot(1.0, slope)
    up = np.array([-slope * h_band, -h_band], np.float32) * n
    p0 = np.array([x0, y0], np.float32)
    dx = right / (width - 1)
    dy = -up / (th - 1)
    origin = p0 + up
    return (np.array([[dx[0], dy[0], origin[0]],
                      [dx[1], dy[1], origin[1]]], np.float32), width)


def test_extract_strips_banded_matches_gather():
    """The gather-free banded extractor agrees with the inverse-grid
    gather on an identity grid (where dewarped == warped page). The
    gather path floor-casts while banded rounds, so exact agreement
    shows up as a <= 1 gray-level difference."""
    rng = np.random.default_rng(11)
    H, W = 400, 600
    # smooth content (like page imagery): the sheared cases carry a
    # ~0.05 px two-pass composition error, which white noise would
    # amplify into arbitrary value differences
    img = rng.random((H, W)) * 255
    k = np.ones(5) / 5
    img = np.apply_along_axis(lambda r: np.convolve(r, k, "same"), 1, img)
    img = np.apply_along_axis(lambda c: np.convolve(c, k, "same"), 0, img)
    img = img.astype(np.uint8)
    th, out_w = 48, 256
    hv, res = remap.identity_grid(W, H)
    frames, widths = zip(
        _strip_frame(50, 100, 100, 20),            # body text, xres 2.4
        _strip_frame(200, 200, 90, 20, slope=0.02),   # slight slope
        _strip_frame(30, 300, 110, 16, slope=-0.015))
    frames = np.stack(frames)
    widths = np.array([min(w, out_w) for w in widths], np.int32)
    ref = np.asarray(remap.extract_dewarped_strips(
        jnp.asarray(img), jnp.asarray(hv), res, jnp.asarray(frames),
        jnp.asarray(widths), th, out_w, 255.0, 0)).astype(float)
    got = np.asarray(remap.extract_strips_banded(
        jnp.asarray(img), jnp.asarray(frames), jnp.asarray(widths),
        th, out_w, 64, out_w + 8, 6, 255.0)).astype(float)
    d0 = np.abs(ref[0, :, :widths[0]] - got[0, :, :widths[0]])
    assert d0.max() <= 1.0          # no shear: floor-vs-round only
    for i in (1, 2):                # sheared: 2-pass composition error
        di = np.abs(ref[i, :, :widths[i]] - got[i, :, :widths[i]])
        assert di.mean() <= 1.5 and np.percentile(di, 99) <= 8
    # columns past each width are fill in both paths
    assert (np.asarray(got)[0, :, widths[0]:] == 255).all()


def test_extract_strips_banded_integer_crop_exact():
    """An integer-aligned unit-scale frame is a pure crop."""
    img = (np.arange(200 * 300) % 251).reshape(200, 300).astype(np.uint8)
    th, out_w = 48, 256
    frame = np.array([[1, 0, 40], [0, 1, 60]], np.float32)
    got = np.asarray(remap.extract_strips_banded(
        jnp.asarray(img), jnp.asarray(frame[None]),
        jnp.asarray([128], jnp.int32), th, out_w, 64, out_w + 8,
        6, 255.0))
    assert (got[0, :, :128] == img[60:60 + th, 40:40 + 128]).all()


def test_extract_strips_banded_large_text_profile():
    """Large text (band taller than the strip, xres < 1) takes the
    K=128 profile and still matches the gather path."""
    rng = np.random.default_rng(12)
    H, W = 500, 700
    img = rng.integers(0, 255, (H, W)).astype(np.uint8)
    th, out_w = 48, 256
    hv, res = remap.identity_grid(W, H)
    frame, width = _strip_frame(60, 200, 300, 90)   # xres ~0.53
    frames = frame[None]
    widths = np.array([min(width, out_w)], np.int32)
    ref = np.asarray(remap.extract_dewarped_strips(
        jnp.asarray(img), jnp.asarray(hv), res, jnp.asarray(frames),
        jnp.asarray(widths), th, out_w, 255.0, 0)).astype(float)
    got = np.asarray(remap.extract_strips_banded(
        jnp.asarray(img), jnp.asarray(frames), jnp.asarray(widths),
        th, out_w, 128, 2 * out_w + 8, 6, 255.0)).astype(float)
    d = np.abs(ref[0, :, :widths[0]] - got[0, :, :widths[0]])
    assert d.max() <= 1.0


def test_extract_profile_partition():
    from origami_tpu.batch.core.lines import LineExtractor
    th = 48
    body, wb = _strip_frame(50, 100, 100, 20)
    big, wg = _strip_frame(60, 200, 300, 90)
    sheared, ws = _strip_frame(50, 100, 100, 20, slope=0.35)
    dew = object()
    assert LineExtractor._extract_profile(body, wb, th, dew) == "p1"
    assert LineExtractor._extract_profile(big, wg, th, dew) == "p2"
    assert LineExtractor._extract_profile(
        sheared, ws, th, dew) == "gather"
    assert LineExtractor._extract_profile(body, wb, th, None) == "gather"


def test_extract_strips_banded_through_real_grid():
    """Production semantics: the banded path samples the DEWARPED
    canvas (one extra bilinear pass) where the gather path samples the
    warped page through the inverse grid. On smooth content the double
    resample stays within a few gray levels."""
    from origami_tpu.core.dewarp import Grid, Dewarper
    hv, res = _dewarp_test_grid()
    g = Grid(hv, res)
    img = _smooth_test_image(520, 370)
    dew = Dewarper(jnp.asarray(img), g).dewarped_dev
    th, out_w = 48, 256
    frames, widths = zip(_strip_frame(80, 150, 100, 20),
                         _strip_frame(120, 300, 90, 16))
    frames = np.stack(frames)
    widths = np.array([min(w, out_w) for w in widths], np.int32)
    ref = np.asarray(remap.extract_dewarped_strips(
        jnp.asarray(img), jnp.asarray(g.points("sample")), float(res),
        jnp.asarray(frames), jnp.asarray(widths), th, out_w,
        255.0, 0)).astype(float)
    got = np.asarray(remap.extract_strips_banded(
        dew, jnp.asarray(frames), jnp.asarray(widths),
        th, out_w, 64, out_w + 8, 6, 255.0)).astype(float)
    for i in range(len(widths)):
        d = np.abs(ref[i, :, :widths[i]] - got[i, :, :widths[i]])
        assert d.mean() <= 2.0 and np.percentile(d, 99) <= 8


def test_extract_strips_banded_page_narrower_than_slab():
    """A wide strip bucket's slab can exceed a small page; the padded
    page must still fit the dynamic slice (regression: 600x400 test
    page with a 768-wide bucket)."""
    img = np.full((200, 150), 200, np.uint8)
    img[100, 10:140] = 30
    frame = np.array([[1, 0, 5], [0, 1, 90]], np.float32)
    got = np.asarray(remap.extract_strips_banded(
        jnp.asarray(img), jnp.asarray(frame[None]),
        jnp.asarray([140], jnp.int32), 48, 768, 64, 776, 6, 255.0))
    assert got.shape == (1, 48, 768)
    assert (got[0, 10, 5:135] == 30).all()     # the dark row
    assert (got[0, :, 140:] == 255).all()      # past width: fill

"""Pallas remap/strip kernels vs the XLA gather path (interpret mode).

Boundary semantics differ by design at sub-pixel out-of-bounds
coordinates: the XLA path hard-cuts to `fill` for any coordinate past
the last pixel, while the Pallas kernels blend with the fill margin
(cv2.remap BORDER_CONSTANT behavior, reference
origami/core/dewarp.py:608-627). Tests therefore use in-bounds maps
plus a dedicated fully-out-of-bounds fill test.
"""

import numpy as np
import jax.numpy as jnp
import pytest


def _page(h=400, w=640, seed=0):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 255, (h, w)).astype(np.float32)
    return img


def test_remap_pallas_matches_xla_interior():
    from origami_tpu.ops.remap import remap
    from origami_tpu.ops.pallas.remap import remap_pallas

    img = _page()
    h, w = img.shape
    oh, ow = 256, 512
    rng = np.random.default_rng(1)
    ys, xs = np.meshgrid(np.linspace(8, h - 9, oh),
                         np.linspace(8, w - 9, ow), indexing="ij")
    # smooth warp, a few px of displacement
    dx = 5.0 * np.sin(ys / 37.0) + 2.0 * np.cos(xs / 53.0)
    dy = 4.0 * np.cos(xs / 41.0) + 2.0 * np.sin(ys / 29.0)
    m = np.stack([xs + dx, ys + dy], axis=-1).astype(np.float32)

    ref = np.asarray(remap(jnp.asarray(img), jnp.asarray(m)))
    out = np.asarray(remap_pallas(img, m, interpret=True))
    assert out.shape == ref.shape
    # padded-coordinate f32 rounding: well below the uint8 LSB
    np.testing.assert_allclose(out, ref, atol=0.05)


def test_remap_pallas_non_multiple_output():
    """Edge tiles (output not a multiple of block_h/block_w) must agree
    with the XLA path — regression for the constant-pad window bug
    (padding coords with a near-origin constant dragged edge tiles'
    DMA window away from their real samples)."""
    from origami_tpu.ops.remap import remap
    from origami_tpu.ops.pallas.remap import remap_pallas

    img = _page(320, 520, seed=11)
    h, w = img.shape
    oh, ow = 250, 500     # 250 % 64 != 0, 500 % 256 != 0
    ys, xs = np.meshgrid(np.linspace(8, h - 9, oh),
                         np.linspace(8, w - 9, ow), indexing="ij")
    dx = 4.0 * np.sin(ys / 31.0)
    dy = 3.0 * np.cos(xs / 47.0)
    m = np.stack([xs + dx, ys + dy], axis=-1).astype(np.float32)

    ref = np.asarray(remap(jnp.asarray(img), jnp.asarray(m)))
    out = np.asarray(remap_pallas(img, m, interpret=True))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=0.05)


def test_remap_pallas_tiled_gather_matches():
    from origami_tpu.ops.pallas.remap import remap_pallas

    img = _page(200, 384, seed=3)
    oh, ow = 128, 256
    ys, xs = np.meshgrid(np.linspace(4, 195, oh),
                         np.linspace(4, 379, ow), indexing="ij")
    m = np.stack([xs, ys], axis=-1).astype(np.float32)
    a = np.asarray(remap_pallas(img, m, interpret=True,
                                gather_mode="direct"))
    b = np.asarray(remap_pallas(img, m, interpret=True,
                                gather_mode="tiled"))
    np.testing.assert_allclose(a, b, atol=1e-4)


def test_remap_pallas_oob_fill():
    from origami_tpu.ops.pallas.remap import remap_pallas

    img = _page(128, 256, seed=2)
    oh, ow = 64, 128
    m = np.full((oh, ow, 2), -50.0, np.float32)     # far out of bounds
    m[:, 64:, 0] = 10_000.0
    out = np.asarray(remap_pallas(img, m, fill=7.0, interpret=True))
    np.testing.assert_allclose(out, 7.0, atol=1e-4)


def test_strips_pallas_matches_xla():
    from origami_tpu.ops.remap import extract_line_strips
    from origami_tpu.ops.pallas.remap import (
        extract_line_strips_pallas, strips_frames_ok)

    img = _page(480, 800, seed=5)
    n, sh, sw = 6, 48, 512
    frames = np.zeros((n, 2, 3), np.float32)
    rng = np.random.default_rng(7)
    for i in range(n):
        th = rng.uniform(-0.04, 0.04)           # residual skew
        s = rng.uniform(0.4, 1.4)               # line-height scale
        frames[i] = [[s * np.cos(th), -s * np.sin(th),
                      rng.uniform(60, 120)],
                     [s * np.sin(th), s * np.cos(th),
                      rng.uniform(40, 380)]]
    assert strips_frames_ok(frames, sh, sw)

    ref = np.asarray(extract_line_strips(
        jnp.asarray(img), jnp.asarray(frames), jnp.zeros(n), sh, sw))
    out = np.asarray(extract_line_strips_pallas(
        img, frames, np.zeros(n), sh, sw, interpret=True))
    assert out.shape == ref.shape
    # two-shear vs direct bilinear: sub-pixel sampling offsets of
    # O(|b/e|) px; compare within the in-page interior
    inb = ref != 255.0
    diff = np.abs(out - ref)[inb]
    assert np.percentile(diff, 99) < 6.0
    assert diff.mean() < 1.0


def test_strips_pallas_axis_aligned_exact():
    """With b == 0 the two-shear form equals direct bilinear."""
    from origami_tpu.ops.remap import extract_line_strips
    from origami_tpu.ops.pallas.remap import extract_line_strips_pallas

    img = _page(300, 640, seed=9)
    frames = np.array([
        [[0.75, 0.0, 30.5], [0.0, 0.75, 40.25]],
        [[1.5, 0.0, 10.0], [0.02, 1.5, 100.0]],   # l1 != 0 still exact
    ], np.float32)
    ref = np.asarray(extract_line_strips(
        jnp.asarray(img), jnp.asarray(frames), jnp.zeros(2), 48, 256))
    out = np.asarray(extract_line_strips_pallas(
        img, frames, np.zeros(2), 48, 256, interpret=True))
    inb = ref != 255.0
    np.testing.assert_allclose(out[inb], ref[inb], atol=1e-2)


def test_strips_frames_ok_rejects_degenerate():
    from origami_tpu.ops.pallas.remap import strips_frames_ok
    bad = np.array([[[1.0, 0.0, 0.0], [1.0, 0.0, 0.0]]], np.float32)
    assert not strips_frames_ok(bad, 48, 512)
    assert not strips_frames_ok(np.zeros((0, 2, 3), np.float32), 48, 512)

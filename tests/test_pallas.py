"""Pallas kernel tests (interpret mode on the CPU backend)."""

import numpy as np
import pytest

import jax.numpy as jnp


def test_sauvola_pallas_matches_xla(synthetic_page):
    from origami_tpu.ops.binarize import sauvola
    from origami_tpu.ops.pallas.sauvola import sauvola_pallas
    img = synthetic_page[:256, :384]  # lane-friendly width
    ref = np.asarray(sauvola(jnp.asarray(img), 15))
    out = np.asarray(sauvola_pallas(jnp.asarray(img), 15, block_h=128,
                                    interpret=True))
    # borders differ (zero-pad vs clamp); interior must match
    r = 8
    inner_ref = ref[r:-r, r:-r]
    inner_out = out[r:-r, r:-r] > 0
    agreement = (inner_ref == inner_out).mean()
    assert agreement > 0.999


def test_sauvola_pallas_odd_height():
    from origami_tpu.ops.pallas.sauvola import sauvola_pallas
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (197, 256)).astype(np.uint8)
    out = np.asarray(sauvola_pallas(jnp.asarray(img), 15, block_h=64,
                                    interpret=True))
    assert out.shape == (197, 256)
    assert out.dtype == np.uint8


def test_sauvola_pallas_double_buffered(synthetic_page):
    from origami_tpu.ops.pallas.sauvola import sauvola_pallas
    import jax.numpy as jnp
    img = synthetic_page[:256, :384]
    a = np.asarray(sauvola_pallas(jnp.asarray(img), 15, block_h=64,
                                  block_w=128, interpret=True))
    b = np.asarray(sauvola_pallas(jnp.asarray(img), 15, block_h=64,
                                  block_w=128, interpret=True,
                                  double_buffer=True))
    np.testing.assert_array_equal(a, b)

"""Test configuration.

Tests run on a virtual 8-device CPU mesh so multi-chip sharding logic is
exercised without TPU hardware (the driver separately dry-runs the
multi-chip path; see __graft_entry__.py).
"""

import os

# must happen before jax backends initialize anywhere in the test process
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# the axon TPU-tunnel plugin (sitecustomize) sets jax_platforms
# programmatically, which overrides the env var — force CPU via config.
import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)


@pytest.fixture(scope="session")
def synthetic_page(rng):
    """A synthetic 'newspaper page' grayscale image with text-ish rows,
    column separators and a dark border — enough structure for the whole
    detect pipeline to produce non-trivial output."""
    h, w = 600, 400
    img = np.full((h, w), 235, dtype=np.uint8)
    # two columns of fake text lines
    for col_x0, col_x1 in [(30, 180), (220, 370)]:
        y = 40
        while y < h - 40:
            # a text line: dark pixels with varying run lengths
            lh = 12
            xs = np.arange(col_x0, col_x1)
            mask = (rng.random(len(xs)) < 0.8)
            for dy in range(lh - 4):
                img[y + dy, xs[mask]] = rng.integers(10, 80)
            y += lh + 6
    # vertical separator between the columns
    img[30:570, 199:201] = 20
    # horizontal separator midway in second column
    img[300:302, 220:370] = 20
    return img

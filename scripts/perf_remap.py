"""Measure the XLA gather-based remap paths on the chip — the data for
the Pallas grid-sample decision (docs/performance.md roadmap item 3).

  * full-page dewarp remap: 2432x1280 output sampled from a 2432x1664
    source through a per-pixel map (core/dewarp.py Dewarper),
  * batched line-strip extraction: 128 strips of 48x512 via affine
    frames (ops/remap.py extract_line_strips).

Timing forces completion via scalar materialization (axon tunnel).
"""

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from origami_tpu.ops.remap import bilinear_sample, remap_batch

    h, w = 2432, 1664
    oh, ow = 2432, 1280
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.integers(0, 255, (h, w)).astype(np.float32))
    ys, xs = np.meshgrid(np.arange(oh, dtype=np.float32),
                         np.arange(ow, dtype=np.float32), indexing="ij")
    map_xy = np.stack([xs + rng.normal(0, 3, xs.shape),
                       ys + rng.normal(0, 3, ys.shape)],
                      axis=-1).astype(np.float32)
    map_d = jnp.asarray(map_xy)

    f = jax.jit(bilinear_sample)
    float(f(img, map_d)[0, 0])
    times = []
    for i in range(5):
        img2 = img + i
        t0 = time.perf_counter()
        float(f(img2, map_d)[-1, -1])
        times.append(time.perf_counter() - t0)
    dt = min(times)
    gb = (oh * ow * 5 * 4) / 1e9
    print("full-page remap: %.2f ms  (%.1f GB/s effective)"
          % (dt * 1e3, gb / dt))

    # batched strips
    n, sh, sw = 128, 48, 512
    frames = np.zeros((n, 2, 3), np.float32)
    for i in range(n):
        frames[i] = [[1.0, 0.02, 100 + i * 3],
                     [-0.02, 1.0, 15 * (i % 120)]]
    from origami_tpu.ops.remap import extract_line_strips
    g = jax.jit(extract_line_strips, static_argnums=(3, 4))
    float(g(img, jnp.asarray(frames), jnp.zeros(n), sh, sw)[0, 0, 0])
    times = []
    for i in range(5):
        img2 = img + i
        t0 = time.perf_counter()
        float(g(img2, jnp.asarray(frames), jnp.zeros(n), sh, sw)
              [-1, -1, -1])
        times.append(time.perf_counter() - t0)
    dt = min(times)
    print("128 line strips 48x512: %.2f ms (%.0f strips/s)"
          % (dt * 1e3, n / dt))


if __name__ == "__main__":
    main()

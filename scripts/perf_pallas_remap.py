"""A/B the Pallas grid-sample kernels against the XLA gather paths on
the real chip — the data for making Pallas the default in ops/remap.

  * full-page dewarp remap 2432x1280 from a 2432x1664 source
    (Dewarper's gather): remap_pallas vs bilinear_sample
  * batched line strips 128 x 48x512 via affine frames:
    extract_line_strips_pallas vs extract_line_strips

Timing forces completion via scalar materialization and perturbs
inputs (axon tunnel; see CLAUDE.md).
"""
import sys
import pathlib
import time

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))
import numpy as np


def bench(fn, perturb, n=6):
    ts = []
    fn(0)                      # compile + settle
    for i in range(1, n + 1):
        t0 = time.perf_counter()
        fn(i * perturb)
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    import jax
    import jax.numpy as jnp
    from origami_tpu.ops.remap import (bilinear_sample,
                                       extract_line_strips,
                                       pallas_gather_mode)
    from origami_tpu.ops.pallas.remap import (
        extract_line_strips_pallas as _strips_pallas,
        remap_pallas as _remap_pallas, strips_frames_ok)

    mode = pallas_gather_mode()
    if mode is None:
        print("this backend's Mosaic lowers neither the direct nor the "
              "tiled in-kernel gather — Pallas grid-sample kernels "
              "cannot run here (the XLA gather path is the production "
              "default; see docs/performance.md).")
        return
    print("gather_mode:", mode)

    def remap_pallas(*a, **kw):
        return _remap_pallas(*a, gather_mode=mode, **kw)

    def extract_line_strips_pallas(*a, **kw):
        return _strips_pallas(*a, gather_mode=mode, **kw)

    rng = np.random.default_rng(0)
    h, w = 2432, 1664
    oh, ow = 2432, 1280
    img = jnp.asarray(rng.integers(0, 255, (h, w)).astype(np.float32))
    ys, xs = np.meshgrid(np.arange(oh, dtype=np.float32),
                         np.arange(ow, dtype=np.float32), indexing="ij")
    map_xy = np.stack([
        np.clip(xs + rng.normal(0, 3, xs.shape), 0, w - 1),
        np.clip(ys + rng.normal(0, 3, ys.shape), 0, h - 1),
    ], axis=-1).astype(np.float32)
    map_d = jnp.asarray(map_xy)

    f_xla = jax.jit(bilinear_sample)
    a = np.asarray(f_xla(img, map_d))
    b = np.asarray(remap_pallas(img, map_d))
    print("full-page agreement: max|d| = %.4f" % np.abs(a - b).max())

    t_xla = bench(lambda i: float(f_xla(img + i, map_d)[-1, -1]), 1)
    t_pal = bench(lambda i: float(remap_pallas(img + i, map_d)[-1, -1]), 1)
    print("full-page remap 2432x1280: xla %.4f s | pallas %.4f s (%.2fx)"
          % (t_xla, t_pal, t_xla / t_pal))

    n, sh, sw = 128, 48, 512
    frames = np.zeros((n, 2, 3), np.float32)
    for i in range(n):
        ang = rng.normal(0, 0.02)
        c, s = np.cos(ang), np.sin(ang)
        frames[i] = [[c, -s, rng.uniform(0, w - sw - 60)],
                     [s, c, rng.uniform(60, h - sh - 60)]]
    frames_d = jnp.asarray(frames)
    heights = jnp.full((n,), sh, jnp.int32)
    print("frames_ok:", strips_frames_ok(frames, sh, sw))

    a = np.asarray(extract_line_strips(img, frames_d, heights, sh, sw))
    b = np.asarray(extract_line_strips_pallas(img, frames_d, heights,
                                              sh, sw))
    print("strips agreement: max|d| = %.4f (range 255)" %
          np.abs(a - b).max())

    f_s = jax.jit(extract_line_strips, static_argnums=(3, 4))
    t_xla = bench(
        lambda i: float(f_s(img + i, frames_d, heights, sh, sw)[-1, -1, -1]),
        1)
    t_pal = bench(
        lambda i: float(extract_line_strips_pallas(
            img + i, frames_d, heights, sh, sw)[-1, -1, -1]), 1)
    print("128 strips 48x512: xla %.4f s | pallas %.4f s (%.2fx)"
          % (t_xla, t_pal, t_xla / t_pal))


if __name__ == "__main__":
    main()

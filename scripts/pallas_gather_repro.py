"""Minimal Mosaic repro for the wrong hardware gather numerics behind
the Pallas tiled-mode remap (VERDICT r3 weak-6 / next-round item 8).

Round 3 measured: `remap_pallas(gather_mode="tiled")` disagrees with
interpret mode / XLA on ~16% of pixels at full-page remap shapes, while
the strips-kernel probe (8x128 identity) is exact — so SOME shape of
the same-shape `tpu.dynamic_gather` that `_lane_gather`/`_sublane_gather`
emit returns wrong values on this v5e toolchain. This script bisects:
it runs each gather primitive alone, inside a trivial pallas_call, over
a sweep of (rows, width, index-pattern) and prints PASS/FAIL vs the
NumPy truth per cell.

Run on the chip:
    PYTHONPATH=/root/repo:/root/.axon_site python scripts/pallas_gather_repro.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from origami_tpu.ops.pallas.remap import _lane_gather, _sublane_gather
    from origami_tpu.parallel.cache import ensure_compilation_cache

    ensure_compilation_cache()
    print("devices:", jax.devices())

    def run_case(kind, mode, r, w, c, pattern, seed=0):
        rng = np.random.default_rng(seed)
        if kind == "lane":
            arr = (np.arange(r * w, dtype=np.float32)
                   .reshape(r, w) % 251.0)
            if pattern == "random":
                idx = rng.integers(0, w, size=(r, c)).astype(np.int32)
            elif pattern == "affine":
                # remap-like: monotone ramp + per-row offset (what the
                # dewarp map looks like inside one block)
                base = np.linspace(0, w - 1, c)[None, :]
                off = rng.uniform(-3, 3, size=(r, 1))
                idx = np.clip(base + off, 0, w - 1).astype(np.int32)
            else:  # identity
                idx = np.tile(np.arange(c, dtype=np.int32) % w, (r, 1))
            want = np.take_along_axis(arr, np.clip(idx, 0, w - 1), axis=1)
            f = lambda a, i: _lane_gather(a, i, mode)  # noqa: E731
            out_shape = (r, c)
        else:
            arr = (np.arange(w * c, dtype=np.float32)
                   .reshape(w, c) % 251.0)
            if pattern == "random":
                idx = rng.integers(0, w, size=(r, c)).astype(np.int32)
            elif pattern == "affine":
                base = np.linspace(0, w - 1, r)[:, None]
                off = rng.uniform(-3, 3, size=(1, c))
                idx = np.clip(base + off, 0, w - 1).astype(np.int32)
            else:
                idx = np.tile(
                    (np.arange(r, dtype=np.int32) % w)[:, None], (1, c))
            want = np.take_along_axis(arr, np.clip(idx, 0, w - 1), axis=0)[:r]
            f = lambda a, i: _sublane_gather(a, i, mode)  # noqa: E731
            out_shape = (r, c)

        def kernel(a_ref, i_ref, o_ref):
            o_ref[...] = f(a_ref[...], i_ref[...])

        try:
            out = pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
            )(jnp.asarray(arr), jnp.asarray(idx))
            got = np.asarray(out)
            bad = np.abs(got - want) > 1e-3
            frac = float(bad.mean())
            status = "PASS" if frac == 0.0 else "FAIL %5.1f%%" % (
                100 * frac)
            detail = ""
            if frac:
                ii = np.argwhere(bad)[0]
                detail = " first-bad@%s want=%.0f got=%.0f idx=%d" % (
                    tuple(ii), want[tuple(ii)], got[tuple(ii)],
                    idx[tuple(ii)])
        except Exception as e:
            msg = str(e).splitlines() or [type(e).__name__]
            status = "ERROR %s: %s" % (type(e).__name__, msg[0][:70])
            detail = ""
        print("%-8s %-6s r=%-3d w=%-4d c=%-4d %-8s %s%s" % (
            kind, mode, r, w, c, pattern, status, detail), flush=True)

    for kind in ("lane", "sublane"):
        for pattern in ("identity", "affine", "random"):
            for (r, w, c) in ((8, 128, 128), (8, 256, 128),
                              (8, 384, 256), (32, 384, 256),
                              (64, 384, 256), (64, 512, 256)):
                run_case(kind, "tiled", r, w, c, pattern)


if __name__ == "__main__":
    main()

"""Localize the Pallas tiled-remap hardware corruption (VERDICT r3
item 8, follow-on to pallas_gather_repro.py which proved the gather
primitives exact at all remap-relevant shapes).

Runs remap_pallas(gather_mode="tiled") against the XLA remap on smooth
synthetic dewarp-like grids at a ladder of shapes, hardware vs
interpret, printing the mismatch fraction per case.

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/pallas_remap_bisect.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np  # noqa: E402


def smooth_map(oh, ow, h, w, amp, seed=0):
    """Dewarp-like map: near-identity + smooth low-frequency warp."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:oh, 0:ow].astype(np.float32)
    ph = rng.uniform(0, 2 * np.pi, 4)
    mx = xx * (w - 1) / max(ow - 1, 1) + amp * np.sin(
        yy / 97.0 + ph[0]) * np.cos(xx / 131.0 + ph[1])
    my = yy * (h - 1) / max(oh - 1, 1) + amp * np.sin(
        xx / 89.0 + ph[2]) * np.cos(yy / 113.0 + ph[3])
    return np.stack([mx, my], axis=-1).astype(np.float32)


def np_bilinear(img, m, fill=0.0):
    """Host bilinear reference with the ops.remap fill semantics."""
    h, w = img.shape
    gx = m[..., 0].astype(np.float64)
    gy = m[..., 1].astype(np.float64)
    x0 = np.floor(gx).astype(np.int64)
    y0 = np.floor(gy).astype(np.int64)
    tx = gx - x0
    ty = gy - y0
    out = np.zeros(gx.shape, np.float64)
    for dy in (0, 1):
        for dx in (0, 1):
            xi = x0 + dx
            yi = y0 + dy
            inb = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
            v = np.where(inb, img[np.clip(yi, 0, h - 1),
                                  np.clip(xi, 0, w - 1)], fill)
            wgt = (tx if dx else 1 - tx) * (ty if dy else 1 - ty)
            out += wgt * v
    return out.astype(np.float32)


def run_case(img, m, want, note=""):
    from origami_tpu.ops.pallas.remap import remap_pallas
    h, w = img.shape
    oh, ow = m.shape[:2]
    try:
        got = np.asarray(remap_pallas(img, m, 0.0, gather_mode="tiled"))
        err = np.abs(got - want)
        bad = err > 1e-2
        frac = float(bad.mean())
        msg = "PASS" if frac == 0 else "FAIL %5.2f%%" % (100 * frac)
        if frac:
            ii = np.argwhere(bad)
            ys, xs = ii[:, 0], ii[:, 1]
            msg += (" rows[%d..%d] cols[%d..%d] n=%d"
                    % (ys.min(), ys.max(), xs.min(), xs.max(), len(ii)))
            msg += (" maxerr=%.4f p99.9=%.4f n>0.5=%d"
                    % (float(err.max()), float(np.quantile(err, 0.999)),
                       int((err > 0.5).sum())))
    except Exception as e:
        ln = str(e).splitlines() or [type(e).__name__]
        msg = "ERROR %s: %s" % (type(e).__name__, ln[0][:70])
    print("h=%-5d w=%-5d oh=%-5d ow=%-5d %-9s %s"
          % (h, w, oh, ow, note, msg), flush=True)


def main():
    from origami_tpu.parallel.cache import ensure_compilation_cache

    ensure_compilation_cache()

    rng = np.random.default_rng(1)
    for (h, w, oh, ow, amp, oob) in (
            (256, 384, 256, 384, 0.0, 0.0),
            (256, 384, 256, 384, 5.0, 0.0),
            (512, 640, 576, 768, 5.0, 0.0),
            (512, 640, 576, 768, 5.0, 60.0),     # out-of-bounds band
            (512, 640, 576, 768, 40.0, 0.0),     # strong warp band
            (1312, 1920, 1600, 2200, 8.0, 0.0),
            (1312, 1920, 1600, 2200, 8.0, 120.0),
            (1312, 1920, 1600, 2200, 40.0, 40.0),
    ):
        img = (rng.integers(0, 256, size=(h, w))
               .astype(np.float32))
        m = smooth_map(oh, ow, h, w, amp)
        if oob:
            # shift so a band of samples falls outside the image on
            # all four sides (the real dewarp grid's border extension
            # reads the fill margin)
            m[..., 0] -= oob
            m[..., 1] -= oob
            m[..., 0] *= (w - 1 + 2 * oob) / max(w - 1, 1)
            m[..., 1] *= (h - 1 + 2 * oob) / max(h - 1, 1)
        want = np_bilinear(img, m, 0.0)
        run_case(img, m, want, note="a%go%g" % (amp, oob))

    # the EXACT r3 A/B configuration (scripts/perf_pallas_remap.py):
    # identity + per-pixel N(0, 3) jitter — NOT a smooth field
    h, w = 2432, 1664
    oh, ow = 2432, 1280
    img = (rng.integers(0, 255, (h, w)).astype(np.float32))
    ys, xs = np.meshgrid(np.arange(oh, dtype=np.float32),
                         np.arange(ow, dtype=np.float32), indexing="ij")
    m = np.stack([
        np.clip(xs + rng.normal(0, 3, xs.shape), 0, w - 1),
        np.clip(ys + rng.normal(0, 3, ys.shape), 0, h - 1),
    ], axis=-1).astype(np.float32)
    want = np_bilinear(img, m, 0.0)
    run_case(img, m, want, note="r3-noise")


if __name__ == "__main__":
    main()

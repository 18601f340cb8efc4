"""Split OCR-stage device time: strip extraction gather vs recognizer.

Times, on the real chip, for realistic group shapes:
  * extract_dewarped_strips alone (blocking)
  * recognize_u8 (normalize+infer+greedy) alone per (batch, bucket)
  * the fused deferred chain as the OCR stage runs it
"""
import sys
import time
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import numpy as np
import jax
import jax.numpy as jnp


def fence(x):
    return float(np.asarray(x).ravel()[0])


def main():
    from origami_tpu.ops.remap import extract_dewarped_strips, identity_grid
    from origami_tpu.train.synth import render_page, CHARSET
    from origami_tpu.models import registry
    from origami_tpu.batch.detect.ocr import RecognizerPredictor
    import tempfile

    page = render_page(93_000_000).image
    h, w = page.shape
    hv, res = identity_grid(w, h)
    img_dev = jnp.asarray(page)
    hv_dev = jnp.asarray(hv)
    th = 48

    rec_dir = pathlib.Path(tempfile.mkdtemp()) / "rec"
    registry.init_and_save(rec_dir, dict(
        kind="recognizer", charset=CHARSET, height=48,
        conv_features=[64, 128, 256], lstm_features=256, version=1))
    pred = RecognizerPredictor([rec_dir])

    for nb, wmax in [(32, 512), (64, 512), (32, 1024), (32, 2048)]:
        fr = np.zeros((nb, 2, 3), np.float32)
        rng = np.random.default_rng(0)
        for i in range(nb):
            s = 0.8
            fr[i] = [[1 / s, 0.0, rng.uniform(50, 200)],
                     [0.0, 1 / s, rng.uniform(100, h - 200)]]
        wd = np.full(nb, min(wmax, 480), np.int32)
        frd, wdd = jnp.asarray(fr), jnp.asarray(wd)

        # extraction alone
        strips = extract_dewarped_strips(img_dev, hv_dev, res, frd, wdd,
                                         th, wmax)
        fence(strips)  # compile
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            s2 = extract_dewarped_strips(img_dev, hv_dev, res, frd, wdd,
                                         th, wmax)
            fence(s2)
            ts.append(time.perf_counter() - t0)
        t_extract = min(ts)

        # banded (gather-free) extraction from the dewarped page —
        # here dewarped == warped (identity grid), frames unchanged.
        # These frames are a0=1.25 (downscale) -> the K=128 profile;
        # body text (a0~0.4) runs the cheaper K=64 profile below.
        from origami_tpu.ops.remap import extract_strips_banded
        t_banded = {}
        for prof, k, sw in [("p2", 128, 2 * wmax + 8)]:
            sb = extract_strips_banded(img_dev, frd, wdd, th, wmax,
                                       k, sw, 6, 255.0)
            fence(sb)
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                s3 = extract_strips_banded(img_dev, frd, wdd, th,
                                           wmax, k, sw, 6, 255.0)
                fence(s3)
                ts.append(time.perf_counter() - t0)
            t_banded[prof] = min(ts)

        # body-text-like frames (xres ~2.4 magnification, p1 profile)
        fr1 = np.zeros((nb, 2, 3), np.float32)
        for i in range(nb):
            xres = 2.4
            fr1[i] = [[1 / xres, 0.0, rng.uniform(50, 200)],
                      [0.0, (20.0 / th), rng.uniform(100, h - 200)]]
        fr1d = jnp.asarray(fr1)
        sb = extract_strips_banded(img_dev, fr1d, wdd, th, wmax,
                                   64, wmax + 8, 6, 255.0)
        fence(sb)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            s3 = extract_strips_banded(img_dev, fr1d, wdd, th, wmax,
                                       64, wmax + 8, 6, 255.0)
            fence(s3)
            ts.append(time.perf_counter() - t0)
        t_banded["p1"] = min(ts)

        # recognition alone (deferred path pads to full 128 chunk)
        d = pred.predict_device_deferred(strips, wd.astype(np.float32), nb)
        pred.finalize_device(d)  # compile
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            d = pred.predict_device_deferred(strips,
                                             wd.astype(np.float32), nb)
            pred.finalize_device(d)
            ts.append(time.perf_counter() - t0)
        t_rec = min(ts)
        print("nb=%-3d wmax=%-5d extract %6.3f s   banded_p2 %6.3f s"
              "   banded_p1 %6.3f s   recognize %6.3f s"
              % (nb, wmax, t_extract, t_banded["p2"], t_banded["p1"],
                 t_rec), flush=True)


if __name__ == "__main__":
    main()

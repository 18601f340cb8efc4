"""Verify the Pallas Sauvola kernel compiles + runs on the real chip.

Correctness vs a direct numpy windowed computation (no second XLA graph
to compile over the slow remote-compile tunnel); timing pallas-only.
"""
import sys, pathlib, time
sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))
import numpy as np
import jax.numpy as jnp
from origami_tpu.ops.pallas.sauvola import sauvola_pallas

rng = np.random.default_rng(0)
img_np = rng.integers(0, 255, (2432, 1664)).astype(np.float32)
img = jnp.asarray(img_np)
out = np.asarray(sauvola_pallas(img, 15))

# numpy reference on a probe interior patch (zero-pad == interior here)
ok = 0
tot = 0
for y0, x0 in ((200, 300), (1200, 800), (2200, 1400)):
    patch = img_np[y0 - 7: y0 + 57 + 8, x0 - 7: x0 + 57 + 8]
    for dy in range(0, 56, 7):
        for dx in range(0, 56, 7):
            win = patch[dy: dy + 15, dx: dx + 15]
            m, s = win.mean(), win.std()
            t = m * (1 + 0.2 * ((s / 128.0) - 1))
            want = img_np[y0 + dy, x0 + dx] > t
            got = out[y0 + dy, x0 + dx] > 0
            ok += int(want == got)
            tot += 1
print("agreement: %d/%d" % (ok, tot))

ts = []
for i in range(5):
    x = img + i
    t0 = time.perf_counter()
    r = sauvola_pallas(x, 15)
    _ = int(np.asarray(r[0, 0])) + int(np.asarray(r[-1, -1]))
    ts.append(time.perf_counter() - t0)
print("pallas sauvola 2432x1664: %.4f s  (%.1f GB/s effective)"
      % (min(ts), (2432 * 1664 * 5) / min(ts) / 1e9))

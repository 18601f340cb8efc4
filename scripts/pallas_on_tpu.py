"""Verify the Pallas Sauvola kernel compiles + runs on the real chip."""
import time
import numpy as np
import jax.numpy as jnp
from origami_tpu.ops.pallas.sauvola import sauvola_pallas
from origami_tpu.ops.binarize import sauvola

img = jnp.asarray(np.random.default_rng(0).integers(
    0, 255, (2432, 1664)).astype(np.float32))
ref = np.asarray(sauvola(img, 15))
out = np.asarray(sauvola_pallas(img, 15))
inner = (ref[8:-8, 8:-8] == (out[8:-8, 8:-8] > 0)).mean()
print("agreement:", inner)

def timed(f):
    f()  # settle
    ts = []
    for i in range(5):
        t0 = time.perf_counter()
        r = f()
        _ = int(np.asarray(r[0, 0])) + int(np.asarray(r[-1, -1]))
        ts.append(time.perf_counter() - t0)
    return min(ts)

t_xla = timed(lambda: sauvola(img + np.random.rand(), 15))
t_pal = timed(lambda: sauvola_pallas(img + np.random.rand(), 15))
print("xla: %.4fs  pallas: %.4fs  speedup: %.2fx"
      % (t_xla, t_pal, t_xla / t_pal))

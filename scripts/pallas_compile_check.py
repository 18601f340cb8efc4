import sys, pathlib, time
sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))
import numpy as np
import jax.numpy as jnp
from origami_tpu.ops.pallas.sauvola import sauvola_pallas

img = jnp.asarray(np.random.default_rng(0).integers(
    0, 255, (2432, 1664)).astype(np.float32))
for db in (False, True):
    out = np.asarray(sauvola_pallas(img, 15, double_buffer=db))
    ts = []
    for i in range(4):
        x = img + i
        t0 = time.perf_counter()
        r = sauvola_pallas(x, 15, double_buffer=db)
        _ = int(np.asarray(r[0, 0])) + int(np.asarray(r[-1, -1]))
        ts.append(time.perf_counter() - t0)
    print("double_buffer=%s: ok sum=%d  %.4f s" % (db, out.sum(),
                                                   min(ts)), flush=True)

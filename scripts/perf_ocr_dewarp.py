"""OCR lines/s and dewarp grid-build timings on the real chip."""
import sys, pathlib, time
sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))
import numpy as np
import jax
import jax.numpy as jnp

# --- recognizer throughput ------------------------------------------------
from origami_tpu.models.recognizer import create_recognizer, init_recognizer
from origami_tpu.models import ctc

model = create_recognizer(96)
params = init_recognizer(model, jax.random.PRNGKey(0), height=48,
                         width=512)

@jax.jit
def infer(p, x, w):
    logits, pad = model.apply({"params": p}, x, widths=w)
    return ctc.greedy_decode(logits, pad)

for batch in (32, 128):
    x0 = jnp.asarray(np.random.default_rng(0).random(
        (batch, 48, 512, 1), np.float32))
    w = jnp.full((batch,), 512.0)
    ids, lengths, conf = infer(params, x0, w)
    _ = int(np.asarray(ids[0, 0]))
    ts = []
    for i in range(3):
        t0 = time.perf_counter()
        ids, lengths, conf = infer(params, x0 + i * 1e-3, w)
        _ = int(np.asarray(ids[0, 0])) + int(np.asarray(lengths[-1]))
        ts.append(time.perf_counter() - t0)
    dt = min(ts)
    print("recognizer batch %d x 48x512: %.4f s (%.0f lines/s)"
          % (batch, dt, batch / dt), flush=True)

# --- dewarp grid build + full-page remap ----------------------------------
from origami_tpu.core.dewarp import Grid
from origami_tpu.core.flow import Samples
from origami_tpu.core.math import Geometry

g = Geometry(1600, 2400)
rng = np.random.default_rng(0)
sh = Samples(g)
sv = Samples(g)
for _ in range(200):
    x, y = rng.random(2) * [1600, 2400]
    sh.append((x, y), rng.normal(0, 0.02))
    sv.append((x, y), np.pi / 2 + rng.normal(0, 0.02))

t0 = time.perf_counter()
grid = Grid.create((1600, 2400), sh, sv, grid_res=25)
t_build = time.perf_counter() - t0
print("grid build (cold, incl compile): %.2f s" % t_build, flush=True)
t0 = time.perf_counter()
grid2 = Grid.create((1600, 2400), sh, sv, grid_res=25)
print("grid build (warm): %.4f s" % (time.perf_counter() - t0),
      flush=True)

from origami_tpu.core.dewarp import Dewarper
img = np.random.default_rng(0).integers(0, 255, (2400, 1600)) \
    .astype(np.uint8)
t0 = time.perf_counter()
out = Dewarper(img, grid).dewarped
print("full-page remap (cold): %.2f s, out %s"
      % (time.perf_counter() - t0, out.shape), flush=True)

"""Lane-width experiments: does N=128-channel alignment lift utilization?"""
import sys, pathlib, time
sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))
import numpy as np
import jax
import jax.numpy as jnp
from origami_tpu.models.unet import UNet


def bench(name, model, shape, n_iter=3):
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros(shape, jnp.float32))["params"]
    fwd = jax.jit(lambda p, x: model.apply({"params": p}, x))
    x0 = jnp.asarray(np.random.default_rng(0).random(shape, np.float32))
    _ = float(fwd(params, x0)[0, 0, 0, 0])
    ts = []
    for i in range(n_iter):
        t0 = time.perf_counter()
        out = fwd(params, x0 + (i + 1) * 1e-3)
        _ = float(out[0, 0, 0, 0])
        ts.append(time.perf_counter() - t0)
    print("%-30s %.4f s/page" % (name, min(ts)), flush=True)


if __name__ == "__main__":
    shape = (1, 2432, 1280, 1)
    bench("s2d2 64-128-256/512 (prod)",
          UNet(4, features=(64, 128, 256), bottleneck=512, s2d=2), shape)
    bench("s2d2 128-256-512/512",
          UNet(4, features=(128, 256, 512), bottleneck=512, s2d=2),
          shape)
    bench("s2d4 128-256-512/512",
          UNet(4, features=(128, 256, 512), bottleneck=512, s2d=4),
          shape)

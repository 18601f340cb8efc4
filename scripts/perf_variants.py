"""Compare U-Net performance variants on the TPU chip.

NB: under the axon tunnel block_until_ready is not a reliable fence;
every timed call materializes a scalar from the result (device->host
read forces completion) and perturbs the input to defeat caching.
"""
import time
import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))
from origami_tpu.models.unet import UNet, ConvBlock


def bench_model(name, model, tiles_shape, n_iter=3):
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros(tiles_shape, jnp.float32))["params"]

    @jax.jit
    def fwd(p, x):
        return model.apply({"params": p}, x)

    x0 = jnp.asarray(np.random.default_rng(0).random(
        tiles_shape, np.float32))
    _ = float(fwd(params, x0)[0, 0, 0, 0])   # compile + settle
    ts = []
    for i in range(n_iter):
        x = x0 + (i + 1) * 1e-3
        t0 = time.perf_counter()
        out = fwd(params, x)
        _ = float(out[0, 0, 0, 0])           # force completion
        ts.append(time.perf_counter() - t0)
    dt = min(ts)
    print("%-28s %s  %.4f s/call  (%.1f tiles/s)"
          % (name, tiles_shape, dt, tiles_shape[0] / dt), flush=True)
    return dt


class S2DUNet(nn.Module):
    """U-Net with a space-to-depth stem: 2x2 patches -> 4 channels at
    half resolution, cutting full-res conv bandwidth 4x; logits are
    emitted at half res and upsampled."""
    num_classes: int = 4
    features: tuple = (64, 128, 256)
    bottleneck: int = 512
    dtype: type = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        x = x.reshape(b, h // 2, 2, w // 2, 2, c) \
            .transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)
        x = x.astype(self.dtype)
        skips = []
        for f in self.features:
            x = ConvBlock(f, self.dtype)(x)
            skips.append(x)
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = ConvBlock(self.bottleneck, self.dtype)(x)
        for f, skip in zip(reversed(self.features), reversed(skips)):
            x = jax.image.resize(
                x, (x.shape[0], skip.shape[1], skip.shape[2],
                    x.shape[-1]), method="nearest")
            x = nn.Conv(f, (3, 3), padding="SAME", dtype=self.dtype,
                        use_bias=False)(x)
            x = jnp.concatenate([x, skip], axis=-1)
            x = ConvBlock(f, self.dtype)(x)
        logits = nn.Conv(self.num_classes, (1, 1),
                         dtype=jnp.float32)(x)
        logits = jax.image.resize(
            logits, (b, h, w, self.num_classes), method="linear")
        return logits


if __name__ == "__main__":
    shape = (3, 896, 1280, 1)
    bench_model("baseline width=1.0", UNet(4), shape)
    bench_model("baseline width=0.5",
                UNet(4, features=(16, 32, 64, 128), bottleneck=256),
                shape)
    bench_model("s2d stem", S2DUNet(4), shape)
    bench_model("s2d stem wide",
                S2DUNet(4, features=(96, 192, 384), bottleneck=768),
                shape)

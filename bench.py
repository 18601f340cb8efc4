"""Benchmark: device pipeline throughput on real hardware.

Measures the dominant compute of the reference pipeline — full-quality
ensemble page segmentation (2 predictors x 5-model softmax-sum voting,
reference origami/core/segment.py:97-135) — with the TPU-native model
design: space-to-depth U-Net, single-shot full-page inference at the
1280x2432 canvas, models evaluated via lax.scan accumulation.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: the north-star target of 10 pages/sec/chip (BASELINE.md).

NB: under the axon tunnel block_until_ready is not a reliable fence;
timing materializes scalars from results and perturbs inputs.
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from origami_tpu.models import unet as unet_lib
    from origami_tpu.models.unet import ensemble_apply
    from origami_tpu.ops.resize import resize as _resize

    full_w, full_h = 1280, 2432
    n_classes = 4
    n_models_per_net = 5
    batch = 4

    # the production pair (docs/performance.md): region nets s2d=4 with
    # 128-multiple channels, separator nets s2d=2
    region_model = unet_lib.create_unet(n_classes, width=2.0, s2d=4)
    sep_model = unet_lib.create_unet(n_classes, width=1.0, s2d=2)
    rng = jax.random.PRNGKey(0)
    region_params = unet_lib.init_unet(region_model, rng,
                                       (full_h, full_w))
    sep_params = unet_lib.init_unet(sep_model, rng, (full_h, full_w))
    stack_a = jax.tree.map(
        lambda x: jnp.stack([x] * n_models_per_net), region_params)
    stack_b = jax.tree.map(
        lambda x: jnp.stack([x] * n_models_per_net), sep_params)

    @jax.jit
    def segment(stack_a, stack_b, images):
        # pages sequential (lax.map), ensemble members sequential
        # (lax.scan): one page already saturates the chip; vmapping
        # either axis multiplies peak activation memory
        def per_page(img):
            net_in = _resize(img, (full_h, full_w), "area") / 255.0
            x = net_in[None, ..., None]

            def vote(model, stack):
                probs = ensemble_apply(model, stack, x)
                return jnp.argmax(probs[0], axis=-1).astype(jnp.uint8)

            return (vote(region_model, stack_a),
                    vote(sep_model, stack_b))

        return jax.lax.map(per_page, images)

    pages0 = jnp.asarray(
        np.random.default_rng(0).integers(
            0, 255, (batch, 2400, 1600)).astype(np.float32))

    def fence(out):
        return float(out[0][0, 0, 0]) + float(out[1][-1, -1, -1])

    fence(segment(stack_a, stack_b, pages0))   # compile + settle

    times = []
    for i in range(3):
        pages = pages0 + (i + 1)
        t0 = time.perf_counter()
        fence(segment(stack_a, stack_b, pages))
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

"""Benchmark: device pipeline throughput on real hardware.

Measures the dominant compute of the reference pipeline — full-quality
ensemble page segmentation (2 predictors x 5-model softmax-sum voting,
reference origami/core/segment.py:97-135) — with the TPU-native model
design defined once in origami_tpu.models.flagship (the same graph the
driver compile-checks via __graft_entry__.entry).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: the north-star target of 10 pages/sec/chip (BASELINE.md).

NB: under the axon tunnel block_until_ready is not a reliable fence;
timing materializes scalars from results and perturbs inputs.
"""

import json
import time


def main():
    import jax
    from origami_tpu.models.flagship import build_flagship

    batch = 4
    segment, (stack_a, stack_b, pages0) = build_flagship(batch=batch)
    segment = jax.jit(segment)

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

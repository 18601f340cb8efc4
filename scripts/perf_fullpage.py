"""Full-page single-shot s2d U-Net vs tiled inference."""
import time
import numpy as np
import jax
import jax.numpy as jnp
from scripts.perf_variants import S2DUNet, bench_model

if __name__ == "__main__":
    # one full page as a single input (no tiling, no overlap waste)
    bench_model("s2d full page", S2DUNet(4), (1, 2432, 1280, 1))
    bench_model("s2d full page batch2", S2DUNet(4), (2, 2432, 1280, 1))
    bench_model("s2d4 full page",
                S2DUNet(4, features=(96, 192, 384), bottleneck=768),
                (1, 2432, 1280, 1))

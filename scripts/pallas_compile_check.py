import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))
import numpy as np
import jax.numpy as jnp
from origami_tpu.ops.pallas.sauvola import sauvola_pallas
img = jnp.asarray(np.random.default_rng(0).integers(
    0, 255, (256, 640)).astype(np.float32))
out = np.asarray(sauvola_pallas(img, 15, block_h=128, block_w=512))
print("compiled+ran:", out.shape, out.dtype, int(out.sum()))

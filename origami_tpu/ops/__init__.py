"""origami_tpu.ops — jit-compiled device image kernels.

resize      anti-aliased / bilinear / nearest page resizing
binarize    Sauvola (integral-image windows) and Otsu thresholding
remap       bilinear grid sampling, affine warps, batched line-strip gather
morphology  dilate/erode/open/close, Zhang-Suen thinning, chamfer EDT
tiling      static overlapping-tile layouts + device stitch
pallas      hand-written Pallas TPU kernels for the hottest paths
"""

from . import resize, binarize, remap, morphology, tiling

__all__ = ["resize", "binarize", "remap", "morphology", "tiling"]

"""origami_tpu.core — the algorithm library.

page        image loading + device pixel access
segment     Prediction/Segmentation containers (segment.zip contract)
predict     batched tiled ensemble inference + heuristic segmenter
binarize    host-facing Sauvola/Otsu built on the device kernels
contours    mask -> polygon/polyline vectorization pipelines
skeleton    device thinning + skeleton graph tracing
polyline    polyline value type + estimation
baselines   Tesseract-free projection-profile line detection
flow        warp-angle sampling (patch skew, separators, borders)
dewarp      device dewarp-grid construction + Grid/Dewarper
lingrid     scattered interpolation (host)
block       Block/Line containers + extraction frames
separate    separator store + XY-cut obstacle scoring
xycut       recursive XY-cut reading order
neighbors   region adjacency graphs
mask        polygon masks and cutouts
geometry_ops  offsets, inscribed rectangles, squeeze splitting
hull        concave hulls (C++ fast path)
math        page geometry + affine helpers
utils       mini-DSL spec parsing, timers
"""

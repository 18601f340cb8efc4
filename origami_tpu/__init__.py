"""origami_tpu — a TPU-native (JAX/XLA/Pallas/pjit) OCR and layout-analysis
framework for historical documents.

A ground-up rebuild of the capabilities of poke1024/origami (reference layout:
/root/reference/origami) designed TPU-first:

  * the compute path (page segmentation U-Nets, binarization, flow-field
    dewarping, line-strip extraction, CTC text recognition) is batched,
    jit-compiled JAX running on a `jax.sharding.Mesh`;
  * host-side vector geometry (contours, layout rules, reading order) runs on
    a self-contained numpy/cv2 geometry library (`origami_tpu.geometry`),
    with hot algorithms (concave hull, skeleton tracing) in C++;
  * the file-artifact batch contract of the reference (segment.zip,
    contours.*.zip, flow.zip, dewarp.zip, lines.*.zip, order.json, ocr.zip,
    compose.zip — see /root/reference/docs/formats.md) is preserved so
    corpora can move between the two systems.

Subpackages
-----------
geometry   host geometry library (shapely-free): Polygon/LineString/WKT/STRtree
ops        device image kernels: resize, binarize, remap, morphology, tiling
models     Flax models: U-Net page segmentation, CNN+BiLSTM+CTC line recognizer
parallel   mesh construction, sharding rules, multi-host work assignment
core       the algorithm library (pages, predictions, contours, dewarp, lines…)
batch      the batch runtime (Processor/Reader/Writer/mutex) and CLI stages
pagexml    PAGE 2019 XML writer and transcription reader
train      training-data generation and on-TPU training loops
tool       ground-truth tooling (annotation DB, export, harmonization)
"""

__version__ = "0.1.0"
